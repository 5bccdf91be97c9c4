#!/usr/bin/env python3
"""Benchmark: batched GMSK demod throughput per chip vs the C reference.

Headline metric (BASELINE.md): fsk_demod Msamples/s. The reference's
single-core numbers on the same chain/parameters (Fs=48k, baud=4800,
dev=5k, decim=2, DC on): 11.0 Msamples/s (MacBook Air M1, volk generic).

TPU-native measurement: the demod chain is jit-compiled once and run over a
batch of channels (the reference's thread-per-client model maps to the
channel batch axis), fast float32 path. Prints ONE JSON line.
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sdrmodem_tpu import FskDemodConfig, FskDemodulator

    baseline_msps = 11.0  # reference/test/perf_fsk_modem.c:100-104 (M1 single core)

    channels = int(__import__("os").environ.get("SDRM_BENCH_CHANNELS", "64"))
    block = 4096 * 24  # samples per channel per step
    cfg = FskDemodConfig(48000, 4800, 5000, 2, 2000, True)
    dem = FskDemodulator(cfg, exact=False)

    rng = np.random.default_rng(0)
    try:
        iq_src = np.fromfile(
            "/root/reference/test/resources/lucky7.expected.cf32", dtype=np.complex64
        )
        reps = int(np.ceil(channels * block / len(iq_src)))
        iq = np.tile(iq_src, reps)[: channels * block].reshape(channels, block)
    except FileNotFoundError:
        iq = (
            rng.standard_normal((channels, block)) + 1j * rng.standard_normal((channels, block))
        ).astype(np.complex64)

    x = jnp.asarray(iq)
    step = jax.jit(lambda v: dem.process(v)[:2])
    out, count = step(x)  # compile + warm up
    jax.block_until_ready(out)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out, count = step(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    samples = channels * block
    msps = samples / dt / 1e6
    print(
        json.dumps(
            {
                "metric": "gmsk_demod_throughput",
                "value": round(msps, 2),
                "unit": "Msamples/s/chip",
                "vs_baseline": round(msps / baseline_msps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
