#!/usr/bin/env python3
"""Apportion the production full-block step's time between its stages.

Times, on the real chip, (a) the complete batched step, (b) the filter
front-end alone (LPF1 -> quad demod -> LPF2 -> DC), and (c) the M&M clock
kernel alone on the front-end's output — the three candidates for the next
kernel optimization.  Each timing fetches a device-side reduction to force
completion (block_until_ready is unreliable over the axon tunnel).

Usage: python3 tools/profile_step.py   (env: SDRM_BENCH_BLOCK, SDRM_BENCH_CHANNELS,
SDRM_FIR_PRECISION as in bench.py)
"""

import os
import time

import numpy as np


def timeit(fn, iters=4):
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
    from sdrmodem_tpu.dsp.clock_recovery import clock_mm_batched_full
    from sdrmodem_tpu.dsp.clock_recovery import initial_full_state

    channels = int(os.environ.get("SDRM_BENCH_CHANNELS", "128"))
    block = int(os.environ.get("SDRM_BENCH_BLOCK", str(1 << 20)))
    cfg = FskDemodConfig(48000, 4800, 5000, 2, 2000, True)
    pipe = DemodPipeline(cfg, block, exact=False, use_atan_lut="free")

    if os.environ.get("SDRM_PROFILE_INPUT", "noise") == "fixture":
        iq = np.fromfile(
            str(__import__("pathlib").Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "lucky7.expected.cf32"), dtype=np.complex64
        )
        tiled = np.tile(iq, -(-channels * block // len(iq)))[: channels * block]
        tiled = tiled.reshape(channels, block)
        x = np.stack([tiled.real, tiled.imag], axis=1).astype(np.float32)
    else:
        rng = np.random.default_rng(0)
        x = rng.standard_normal((channels, 2, block)).astype(np.float32) * 0.1
    x = jnp.asarray(x)

    state = pipe.init_full_state(channels)
    step = pipe.make_batched_step_full("pallas")

    def full():
        s2, sym, cnt = step(state, x)
        full.overflow = s2.clock.overflow  # healed-chunk counter (lazy fetch)
        return jnp.sum(cnt)

    p = pipe._clockp
    cp = state.quad_prev.shape[1] // 2

    @jax.jit
    def front(st, xx):
        x_tm = jnp.transpose(xx, (2, 1, 0)).reshape(block, 2 * cp)
        _, y3 = pipe._front_batched_full(st, x_tm)
        return jnp.sum(y3)

    @jax.jit
    def front_y3(st, xx):
        x_tm = jnp.transpose(xx, (2, 1, 0)).reshape(block, 2 * cp)
        _, y3 = pipe._front_batched_full(st, x_tm)
        return y3

    y3 = front_y3(state, x)

    @jax.jit
    def clock_only(y):
        outs, counts, _ = clock_mm_batched_full(
            y, initial_full_state(p["omega"], cp, p["mu"]),
            omega=p["omega"], gain_omega=p["gain_omega"], mu=p["mu"],
            gain_mu=p["gain_mu"],
            omega_relative_limit=p["omega_relative_limit"],
            backend="pallas",
        )
        return jnp.sum(counts)

    t_full = timeit(lambda: full())
    t_front = timeit(lambda: front(state, x))
    t_clock = timeit(lambda: clock_only(y3))

    msps = channels * block / t_full / 1e6
    print(
        f"block={block} channels={channels} "
        f"precision={os.environ.get('SDRM_FIR_PRECISION', 'bf16x3')}"
    )
    print(f"full step : {t_full*1e3:8.2f} ms   ({msps:.0f} Msamples/s/chip)")
    ovf = float(np.asarray(full.overflow).sum())
    print(f"clock window-overflow healed chunks (one step): {ovf:.0f}")
    print(f"front-end : {t_front*1e3:8.2f} ms   ({100*t_front/t_full:.0f}%)")
    print(f"clock only: {t_clock*1e3:8.2f} ms   ({100*t_clock/t_full:.0f}%)")
    print(f"other     : {(t_full-t_front-t_clock)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
