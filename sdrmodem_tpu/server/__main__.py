from sdrmodem_tpu.server.tcp_server import main

main()
