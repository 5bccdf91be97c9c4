#!/usr/bin/env python3
"""Capture a jax.profiler trace of the production demod step.

SURVEY.md §5: the reference's only profiling is a micro-benchmark with
commented timings (test/perf_fsk_modem.c); the TPU build gets real traces.
Writes a TensorBoard-compatible trace directory; view with
``tensorboard --logdir <out>`` or xprof.

Usage: python3 tools/trace.py [--out /tmp/sdrm-trace] [--block 65536]
                              [--channels 128] [--steps 4]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="/tmp/sdrm-trace")
    parser.add_argument("--block", type=int, default=65536)
    parser.add_argument("--channels", type=int, default=128)
    parser.add_argument("--steps", type=int, default=4)
    args = parser.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")

    from sdrmodem_tpu.dsp.fsk_demod import FskDemodConfig
    from sdrmodem_tpu.dsp.pipeline import DemodPipeline

    cfg = FskDemodConfig(48000, 4800, 5000, 2, 2000, True)
    pipe = DemodPipeline(cfg, args.block, exact=False, use_atan_lut="free")
    step = pipe.make_batched_step_full(
        "pallas" if jax.devices()[0].platform != "cpu" else "scan"
    )
    state = pipe.init_full_state(args.channels)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((args.channels, 2, args.block)).astype(np.float32)
    )

    # warm-up compile outside the trace
    state, sym, cnt = step(state, x)
    int(np.asarray(cnt).sum())

    with jax.profiler.trace(args.out):
        s = state
        for _ in range(args.steps):
            s, sym, cnt = step(s, x)
        total = int(np.asarray(cnt).sum())
    print(f"traced {args.steps} steps ({total} symbols in the last) -> {args.out}")


if __name__ == "__main__":
    main()
