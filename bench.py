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
import pathlib
import time

import numpy as np


def _fixture(name: str) -> str:
    """A golden fixture: the reference checkout if present, else the
    vendored byte-identical copy in tests/fixtures."""
    ref = pathlib.Path("/root/reference/test/resources") / name
    if ref.exists():
        return str(ref)
    return str(pathlib.Path(__file__).resolve().parent / "tests" / "fixtures" / name)


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
    atan_env = os.environ.get("SDRM_BENCH_ATAN", "free")  # free | lut | atan2
    use_lut = {"lut": True, "atan2": False}.get(atan_env, "free")
    mode = os.environ.get("SDRM_BENCH_MODE", "full")  # full | ragged
    pipe = DemodPipeline(cfg, block, exact=False, use_atan_lut=use_lut)

    # input: the recorded capture tiled across channels/time (falls back to
    # noise when the fixture tree is absent)
    try:
        iq = np.fromfile(_fixture("lucky7.expected.cf32"), dtype=np.complex64)
    except FileNotFoundError:
        rng = np.random.default_rng(0)
        iq = (rng.standard_normal(1 << 17) + 1j * rng.standard_normal(1 << 17)).astype(
            np.complex64
        )
    reps = int(np.ceil(channels * block / len(iq)))
    tiled = np.tile(iq, reps)[: channels * block].reshape(channels, block)
    x = np.stack([tiled.real, tiled.imag], axis=1).astype(np.float32)  # (C, 2, B)
    # layout: "tm" (default) stages the time-major (B, 2C) layout
    # host-side, outside the timed loop — the kernels' native layout, and
    # what every production path feeds anyway (the server's fanout step
    # broadcasts one (2,B) stream on device with no transpose; a
    # multi-stream deployment stages lanes as they arrive).  "cm" feeds
    # (C,2,B) and pays a measured ~9 ms/step device transpose.
    layout = os.environ.get("SDRM_BENCH_LAYOUT", "tm")
    if layout == "tm" and mode == "full":
        x = np.concatenate([tiled.real.T, tiled.imag.T], axis=1).astype(np.float32)
    x = jnp.asarray(x)
    n_valid = jnp.full((channels,), block, jnp.int32)

    if mode == "full":
        # full-block fast path: static history lengths, suffix-carried
        # clock state — no ragged bookkeeping on the hot path
        step_full = pipe.make_batched_step_full(clock_backend, layout=layout)
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

    # 3 timed batches -> a min/median/max band in the same JSON line (the
    # tunnel's load varies 10-20% between runs; the band carries that
    # variance instead of a prose claim).  State threads through every
    # step, so the chain is still forced end to end.
    batches = 3
    per = max(1, iters // batches)
    s = state
    batch_msps = []
    total = 0
    t_all = time.perf_counter()
    for _ in range(batches):
        t0 = time.perf_counter()
        for _ in range(per):
            s, symbols, count = step(s, x, n_valid)
        total = int(np.asarray(count).sum())  # forces this batch's chain
        bt = time.perf_counter() - t0
        batch_msps.append(channels * block * per / bt / 1e6)
    dt = time.perf_counter() - t_all

    samples = channels * block * batches * per
    msps = samples / dt / 1e6
    assert total > 0
    band = sorted(batch_msps)
    result = {
        "metric": "gmsk_demod_throughput",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        "vs_baseline": round(msps / baseline_msps, 2),
        "band": [round(band[0], 1), round(band[len(band) // 2], 1), round(band[-1], 1)],
    }

    # golden parity on-device: replay the lucky7 fixture through the SAME
    # compiled production program (its config IS the bench config) and
    # record the reference's own acceptance numbers (+-2 LSB,
    # /root/reference/test/test_fsk_demod.c:43-48).  tools/parity.py runs
    # the full four-fixture suite.
    if mode == "full" and os.environ.get("SDRM_BENCH_PARITY", "1") != "0":
        try:
            golden = np.fromfile(_fixture("lucky7.expected.s8"), dtype=np.int8)
            padded = np.zeros(-(-len(iq) // block) * block, np.complex64)
            padded[: len(iq)] = iq
            pstate = pipe.init_full_state(channels)
            out = []
            for start in range(0, len(padded), block):
                chunk = padded[start : start + block]
                if layout == "tm":
                    xp = np.concatenate(
                        [
                            np.broadcast_to(chunk.real[:, None], (block, channels)),
                            np.broadcast_to(chunk.imag[:, None], (block, channels)),
                        ],
                        axis=1,
                    ).astype(np.float32)
                else:
                    xp = np.broadcast_to(
                        np.stack([chunk.real, chunk.imag]).astype(np.float32),
                        (channels, 2, block),
                    )
                pstate, sym, cnt = step_full(pstate, jnp.asarray(xp))
                sym0 = np.asarray(sym)[0]
                for k, c in enumerate(np.asarray(cnt)[0]):
                    if c:
                        out.append(sym0[k, : int(c)])
            got = np.concatenate(out) if out else np.zeros(0, np.int8)
            m = min(len(got), len(golden))
            diff = np.abs(got[:m].astype(np.int32) - golden[:m].astype(np.int32))
            result.update(
                parity_fixture="lucky7.expected.s8",
                parity_symbols=int(len(golden)),
                parity_max_lsb=int(diff.max()) if m else -1,
                parity_mismatch_rate=round(float((diff != 0).mean()), 6) if m else 1.0,
                parity_beyond_tol_rate=round(float((diff > 2).mean()), 6) if m else 1.0,
            )
        except Exception as exc:  # parity must never sink the bench number
            result["parity_error"] = repr(exc)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
