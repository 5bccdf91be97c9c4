"""CLI entry: ``python -m sdrmodem_tpu <config>`` — the reference's
``sdr_modem <config>`` analog (src/main.c:15-44)."""
from sdrmodem_tpu.server.tcp_server import main

main()
