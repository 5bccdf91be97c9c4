#!/usr/bin/env python3
"""Differential full-step profiling: the only timing methodology that has
proven reliable on the axon TPU backend.

Standalone per-stage microbenchmarks (tools/profile_front.py) produce
numbers that contradict the end-to-end step time — XLA lowers isolated
stages differently than the fused production program.  This tool instead
times the COMPLETE production step several times, swapping exactly one
ingredient per variant; deltas between variants attribute the step's time
to stages trustworthily because everything else stays identical.

Variants: input layout (cm = device transpose, tm = pre-staged), atan
mode (free LUT / plain arctan2 / null placeholder), FIR MXU precision
(bf16x3 / bf16x2), clock inner-loop form (shifted-FMA / one-hot).

Usage: PYTHONPATH=. python3 -u tools/profile_variants.py
"""

import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sdrmodem_tpu.dsp.fsk_demod import FskDemodConfig
    from sdrmodem_tpu.dsp.pipeline import DemodPipeline

    channels = int(os.environ.get("SDRM_BENCH_CHANNELS", "128"))
    block = int(os.environ.get("SDRM_BENCH_BLOCK", str(1 << 20)))
    iters = int(os.environ.get("SDRM_BENCH_ITERS", "4"))
    cfg = FskDemodConfig(48000, 4800, 5000, 2, 2000, True)

    iq = np.fromfile(
        str(__import__("pathlib").Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "lucky7.expected.cf32"), dtype=np.complex64
    )
    tiled = np.tile(iq, -(-channels * block // len(iq)))[: channels * block]
    tiled = tiled.reshape(channels, block)
    x_cm = jnp.asarray(
        np.stack([tiled.real, tiled.imag], axis=1).astype(np.float32)
    )
    x_tm = jnp.asarray(
        np.concatenate([tiled.real.T, tiled.imag.T], axis=1).astype(np.float32)
    )

    def run(name, layout, atan, precision, shift_max, front_only=False,
            front="fused"):
        os.environ["SDRM_FIR_PRECISION"] = precision
        os.environ["SDRM_CLOCK_SHIFT_MAX"] = str(shift_max)
        pipe = DemodPipeline(cfg, block, exact=False, use_atan_lut=atan)
        if front_only:
            # front-end only (LPF1 -> quad -> LPF2 -> DC), no clock
            # kernel: the full-step delta attributes the sequential M&M
            # walk's share of the production step
            import jax as _jax

            fe = (
                pipe._front_fused_full
                if front == "fused" and pipe.fused_front_available()
                else pipe._front_batched_full
            )

            @_jax.jit
            def step(state, x):
                fstate, y3 = fe(state, x)
                from sdrmodem_tpu.dsp.pipeline import DemodStateFull

                # cnt here is a CHAIN-FORCING checksum (a float signal
                # sum), not a symbol count — printed as such below
                return DemodStateFull(*fstate, state.clock), y3, jnp.sum(y3)
        else:
            step = pipe.make_batched_step_full("pallas", layout=layout, front=front)
        state = pipe.init_full_state(channels)
        x = x_cm if layout == "cm" else x_tm
        state, sym, cnt = step(state, x)  # compile + warm
        _ = float(np.asarray(cnt).sum())
        t0 = time.perf_counter()
        s = state
        for _ in range(iters):
            s, sym, cnt = step(s, x)
        total = float(np.asarray(cnt).sum())  # device fetch forces the chain
        dt = (time.perf_counter() - t0) / iters
        msps = channels * block / dt / 1e6
        checksum = "n/a (no clock)" if front_only else f"{int(total)}"
        print(f"{name:34s}: {dt*1e3:8.2f} ms/step  ({msps:7.0f} Msamples/s)  "
              f"[checksum {checksum}]", flush=True)
        return dt

    tm = run("tm fused-front bf16x3 (production)", "tm", "free", "bf16x3", 512)
    banded = run("tm BANDED front bf16x3", "tm", "free", "bf16x3", 512,
                 front="banded")
    fr = run("tm fused FRONT-ONLY (no clk)", "tm", "free", "bf16x3", 512,
             front_only=True)
    frb = run("tm banded FRONT-ONLY (no clk)", "tm", "free", "bf16x3", 512,
              front_only=True, front="banded")
    oh = run("tm fused shift0 (one-hot clk)", "tm", "free", "bf16x3", 0)

    print("\n--- attribution (deltas) ---")
    print(f"front fusion win (banded - fused) : {(banded-tm)*1e3:8.2f} ms")
    print(f"fused front-end alone             : {fr*1e3:8.2f} ms")
    print(f"banded front-end alone            : {frb*1e3:8.2f} ms")
    print(f"M&M clock kernel share (tm - fr)  : {(tm-fr)*1e3:8.2f} ms")
    print(f"clock shifted-FMA vs one-hot      : {(oh-tm)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
