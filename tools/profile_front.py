#!/usr/bin/env python3
"""Per-stage timing of the production full-block step on the real chip.

profile_step.py apportions the step between front-end and clock; this
tool breaks the front-end down further — input transpose, LPF1, quad
demod (each atan mode), LPF2, DC blocker — and times the clock kernel on
LOCKSTEP data (the bench / fan-out shape) instead of independent noise.

Methodology (hard-won backend rules, see CLAUDE.md): every stage output
goes through ``lax.optimization_barrier`` and a FULL ``jnp.sum`` before
the scalar fetch.  Strided-slice reductions (x[::k]) let XLA fuse away
the stage under test and replace it with pathological strided HBM reads
— measurements made that way are garbage on this backend.

Usage: PYTHONPATH=. python3 tools/profile_front.py
Env: SDRM_BENCH_BLOCK, SDRM_BENCH_CHANNELS, SDRM_FIR_PRECISION,
SDRM_CLOCK_SHIFT_MAX as elsewhere.
"""

import os
import time

import numpy as np


def timeit(fn, iters=3):
    fn()  # warm-up / compile
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn()
    _ = float(np.asarray(r))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sdrmodem_tpu.dsp.fsk_demod import FskDemodConfig
    from sdrmodem_tpu.dsp.pipeline import DemodPipeline
    from sdrmodem_tpu.dsp.elementwise import atan2_dispatch
    from sdrmodem_tpu.dsp.clock_recovery import clock_mm_batched_full, initial_full_state
    from sdrmodem_tpu.ops.pallas_fir import conv1d_banded_tm

    channels = int(os.environ.get("SDRM_BENCH_CHANNELS", "128"))
    block = int(os.environ.get("SDRM_BENCH_BLOCK", str(1 << 20)))
    cfg = FskDemodConfig(48000, 4800, 5000, 2, 2000, True)
    pipe = DemodPipeline(cfg, block, exact=False, use_atan_lut="free")
    p = pipe._clockp
    d = cfg.decimation
    cp = -(-channels // 128) * 128
    t1, t2, tdc = pipe._t1, pipe._t2, pipe._tdc
    barrier = jax.lax.optimization_barrier

    # fixture input tiled across channels at different phases (bench shape)
    try:
        iq = np.fromfile(
            str(__import__("pathlib").Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "lucky7.expected.cf32"), dtype=np.complex64
        )
        tiled = np.tile(iq, -(-channels * block // len(iq)))[: channels * block]
        tiled = tiled.reshape(channels, block)
    except FileNotFoundError:
        rng = np.random.default_rng(0)
        tiled = (
            rng.standard_normal((channels, block))
            + 1j * rng.standard_normal((channels, block))
        ).astype(np.complex64) * 0.3
    x = jnp.asarray(
        np.stack([tiled.real, tiled.imag], axis=1).astype(np.float32)
    )  # (C, 2, B)

    @jax.jit
    def tr(xx):
        x_tm = jnp.transpose(xx, (2, 1, 0)).reshape(block, 2 * cp)
        return jnp.sum(barrier(x_tm))

    work1 = jnp.asarray(np.random.default_rng(1).standard_normal(
        (len(t1) - 1 + block, 2 * cp)).astype(np.float32) * 0.1)

    @jax.jit
    def lpf1(w):
        return jnp.sum(barrier(conv1d_banded_tm(w, t1[::-1], 1, block)))

    y1 = jnp.asarray(np.random.default_rng(2).standard_normal(
        (block, 2 * cp)).astype(np.float32) * 0.1)

    def make_quad(mode):
        @jax.jit
        def quad(y):
            i, q = y[:, :cp], y[:, cp:]
            si = jnp.concatenate([jnp.zeros((1, cp), jnp.float32), i[:-1]], axis=0)
            sq = jnp.concatenate([jnp.zeros((1, cp), jnp.float32), q[:-1]], axis=0)
            re = i * si + q * sq
            im = q * si - i * sq
            yq = jnp.float32(cfg.quad_gain) * atan2_dispatch(im, re, mode)
            return jnp.sum(barrier(yq))
        return quad

    work2 = jnp.asarray(np.random.default_rng(3).standard_normal(
        (len(t2) - 1 + block, cp)).astype(np.float32) * 0.1)

    @jax.jit
    def lpf2(w):
        return jnp.sum(barrier(conv1d_banded_tm(w, t2[::-1], d, block // d)))

    work3 = jnp.asarray(np.random.default_rng(4).standard_normal(
        (4 * cfg.dc_length - 4 + block // d, cp)).astype(np.float32) * 0.1)

    @jax.jit
    def dc(w):
        return jnp.sum(barrier(conv1d_banded_tm(w, tdc[::-1], 1, block // d)))

    # lockstep clock input: run the REAL front-end once on lane-identical
    # fixture data, use its decimated soft output
    x_lock = jnp.asarray(
        np.broadcast_to(
            np.stack([tiled[0].real, tiled[0].imag]).astype(np.float32),
            (channels, 2, block),
        )
    )

    @jax.jit
    def front_y3(st, xx):
        x_tm = jnp.transpose(xx, (2, 1, 0)).reshape(block, 2 * cp)
        _, y3 = pipe._front_batched_full(st, x_tm)
        return y3

    y3_lock = front_y3(pipe.init_full_state(channels), x_lock)
    y3_mix = front_y3(pipe.init_full_state(channels), x)

    def make_clock(y3):
        @jax.jit
        def clock(y):
            outs, counts, st = clock_mm_batched_full(
                y, initial_full_state(p["omega"], cp, p["mu"]),
                omega=p["omega"], gain_omega=p["gain_omega"], mu=p["mu"],
                gain_mu=p["gain_mu"],
                omega_relative_limit=p["omega_relative_limit"], backend="pallas",
            )
            return jnp.sum(counts) + jnp.sum(st.overflow)
        return lambda: clock(y3)

    rows = [
        ("transpose", lambda: tr(x), channels * block),
        ("lpf1", lambda: lpf1(work1), channels * block),
        ("quad(free)", lambda: make_quad("free")(y1), channels * block),
        ("quad(atan2)", lambda: make_quad(False)(y1), channels * block),
        ("lpf2", lambda: lpf2(work2), channels * block),
        ("dc", lambda: dc(work3), channels * block // d),
        ("clock(lockstep)", make_clock(y3_lock), channels * block),
        ("clock(mixed)", make_clock(y3_mix), channels * block),
    ]
    print(
        f"block={block} channels={channels} "
        f"precision={os.environ.get('SDRM_FIR_PRECISION', 'bf16x3')} "
        f"shift_max={os.environ.get('SDRM_CLOCK_SHIFT_MAX', '512')}"
    )
    for name, fn, samples in rows:
        t = timeit(fn)
        print(f"{name:16s}: {t*1e3:8.2f} ms  ({samples/t/1e6:7.0f} Msamples/s)",
              flush=True)


if __name__ == "__main__":
    main()
