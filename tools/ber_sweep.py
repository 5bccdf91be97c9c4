#!/usr/bin/env python3
"""TX → channel (AWGN + frequency offset) → RX loopback BER sweep.

BASELINE.json config #3: modulate random payloads with gfsk_mod, impair
with white Gaussian noise and a carrier offset, demodulate with fsk_demod,
and report BER per SNR point.

Usage: python3 tools/ber_sweep.py [--snrs 0,2,4,...] [--offset-hz 200]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def run_point(snr_db: float, offset_hz: float, n_bytes: int, seed: int):
    import jax
    import jax.numpy as jnp

    from sdrmodem_tpu import FskDemodConfig, FskDemodulator, GfskModConfig, GfskModulator
    from sdrmodem_tpu.dsp.nco_host import HostNco

    fs, baud, dev = 48000, 9600, 5000
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, n_bytes).astype(np.uint8)

    mod = GfskModulator(GfskModConfig.from_radio(fs, baud, dev))
    # pair path: complex dtypes do not lower on the axon TPU backend
    i, q, _ = mod.process_pair(jnp.asarray(payload))
    iq = (np.asarray(i) + 1j * np.asarray(q)).astype(np.complex64)

    # AWGN at the requested Es/N0 (signal power is 1.0 by construction)
    noise_power = 10 ** (-snr_db / 10.0)
    noise = (
        rng.standard_normal(len(iq)) + 1j * rng.standard_normal(len(iq))
    ).astype(np.complex64) * np.sqrt(noise_power / 2.0)
    rx = (iq + noise).astype(np.complex64)
    if offset_hz:
        rx = HostNco(fs).mix(int(offset_hz), rx)

    demod = FskDemodulator(FskDemodConfig(fs, baud, dev, 1, 2000, True), exact=False)
    out, count, _ = demod.process(jnp.asarray(rx))
    soft = np.asarray(out)[: int(count)]

    bits_tx = np.unpackbits(payload).astype(np.int8) * 2 - 1
    hard = np.sign(soft).astype(np.int8)
    # skip the filter warm-up (the DC blocker alone delays by 2*(L-1)
    # samples ~ 64 symbols) and search the alignment over a generous range
    skip = 128
    best_err, best_n = 1.0, 1
    for off in range(0, 220):
        n = min(len(hard) - off - skip, len(bits_tx) - skip)
        if n <= 100:
            break
        errs = float(
            (hard[skip + off : skip + off + n] != bits_tx[skip : skip + n]).mean()
        )
        if errs < best_err:
            best_err, best_n = errs, n
    return best_err, best_n


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--snrs", default="0,2,4,6,8,10,12")
    parser.add_argument("--offset-hz", type=float, default=0.0)
    parser.add_argument("--bytes", type=int, default=2048)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    import jax

    # the demod side of the sweep consumes complex64 IQ, which the TPU
    # backend does not lower — this validation tool always runs on CPU
    # (must be set before the first jax.devices() initializes a backend)
    jax.config.update("jax_platforms", "cpu")

    points = []
    for snr in [float(s) for s in args.snrs.split(",")]:
        ber, n = run_point(snr, args.offset_hz, args.bytes, args.seed)
        points.append({"snr_db": snr, "ber": ber, "bits": n})
        print(json.dumps(points[-1]))
    return points


if __name__ == "__main__":
    main()
