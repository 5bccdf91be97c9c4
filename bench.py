#!/usr/bin/env python3
"""Benchmark: batched GMSK demod throughput per chip vs the C reference.

Headline metric (BASELINE.md): fsk_demod Msamples/s on the reference's own
parameters (Fs=48k, baud=4800, dev=5k, decim=2, DC on).  Reference
single-core numbers: 11.0 Msamples/s (MacBook Air M1, volk generic).

Methodology: the ragged-block streaming pipeline (the same program the
server runs, float32 fast path, no complex dtype) is jit-compiled once and
vmapped over a channel batch — the reference's thread-per-client model
mapped to the TPU batch axis.  K dependent steps are dispatched (state
threads through, so they execute back-to-back on device) and the final
symbol count is fetched to force completion; wall time covers the full
chain.  Prints ONE JSON line.
"""

import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")

    from sdrmodem_tpu.dsp.fsk_demod import FskDemodConfig
    from sdrmodem_tpu.dsp.pipeline import DemodPipeline

    baseline_msps = 11.0  # reference/test/perf_fsk_modem.c:100-104 (M1 single core)

    channels = int(os.environ.get("SDRM_BENCH_CHANNELS", "128"))
    # throughput mode: 1M samples/channel/step amortizes the per-dispatch
    # tunnel latency to <2% (device step is ~2.2 Gsamples/s); the clock
    # kernel chunks internally so VMEM stays bounded at any block size
    block = int(os.environ.get("SDRM_BENCH_BLOCK", str(1 << 20)))
    iters = int(os.environ.get("SDRM_BENCH_ITERS", "6"))
    clock_backend = os.environ.get("SDRM_BENCH_CLOCK", "pallas")
    if jax.devices()[0].platform == "cpu":
        clock_backend = "scan"  # Mosaic kernels need a TPU

    cfg = FskDemodConfig(48000, 4800, 5000, 2, 2000, True)
    use_lut = os.environ.get("SDRM_BENCH_ATAN", "poly") == "lut"
    mode = os.environ.get("SDRM_BENCH_MODE", "full")  # full | ragged
    pipe = DemodPipeline(cfg, block, exact=False, use_atan_lut=use_lut)

    # input: the recorded capture tiled across channels/time (falls back to
    # noise when the fixture tree is absent)
    try:
        iq = np.fromfile(
            "/root/reference/test/resources/lucky7.expected.cf32", dtype=np.complex64
        )
    except FileNotFoundError:
        rng = np.random.default_rng(0)
        iq = (rng.standard_normal(1 << 17) + 1j * rng.standard_normal(1 << 17)).astype(
            np.complex64
        )
    reps = int(np.ceil(channels * block / len(iq)))
    tiled = np.tile(iq, reps)[: channels * block].reshape(channels, block)
    x = np.stack([tiled.real, tiled.imag], axis=1).astype(np.float32)  # (C, 2, B)
    x = jnp.asarray(x)
    n_valid = jnp.full((channels,), block, jnp.int32)

    if mode == "full":
        # full-block fast path: static history lengths, suffix-carried
        # clock state — no ragged bookkeeping on the hot path
        step_full = pipe.make_batched_step_full(clock_backend)
        step = lambda s, xx, nv: step_full(s, xx)
        state = pipe.init_full_state(channels)
    else:
        step = pipe.make_batched_step(clock_backend)
        state = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (channels,) + a.shape), pipe.init_state()
        )

    # warm-up / compile
    state, symbols, count = step(state, x, n_valid)
    _ = int(np.asarray(count).sum())

    t0 = time.perf_counter()
    s = state
    total = 0
    for _ in range(iters):
        s, symbols, count = step(s, x, n_valid)
    total = int(np.asarray(count).sum())  # forces the whole chain
    dt = time.perf_counter() - t0

    samples = channels * block * iters
    msps = samples / dt / 1e6
    assert total > 0
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
