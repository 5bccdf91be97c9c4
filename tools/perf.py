#!/usr/bin/env python3
"""Micro-benchmark analog of reference test/perf_fsk_modem.c:

- gfsk_mod:  100 x 2048 bytes at Fs=19200, baud=9600, dev=5000, BT=0.5
- fsk_demod: 100 x 4096 samples at Fs=48000, baud=4800, dev=5000, decim=2, DC on

Run with default platform (TPU if available) or JAX_PLATFORMS=cpu.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "cpu")

    from sdrmodem_tpu import GfskModConfig, GfskModulator
    from sdrmodem_tpu.dsp.fsk_demod import FskDemodConfig
    from sdrmodem_tpu.dsp.pipeline import DemodPipeline

    rng = np.random.default_rng(0)

    # --- gfsk_mod (reference: 0.054 s generic / 0.044 s tuned on M1)
    mod = GfskModulator(GfskModConfig.from_radio(19200, 9600, 5000))
    data = jnp.asarray(rng.integers(0, 255, 2048).astype(np.uint8))
    step = jax.jit(lambda d: mod.process(d)[0])
    np.asarray(step(data))  # compile
    t0 = time.perf_counter()
    for _ in range(100):
        out = step(data)
    np.asarray(out)
    mod_dt = time.perf_counter() - t0
    out_samples = 100 * 2048 * 8 * 2
    print(f"gfsk_mod : 100 x 2048 bytes in {mod_dt:.6f} s "
          f"({out_samples/mod_dt/1e6:.1f} Msamples/s produced)")

    # --- fsk_demod
    pipe = DemodPipeline(FskDemodConfig(48000, 4800, 5000, 2, 2000, True), 4096, exact=False)
    iq = rng.standard_normal((2, 4096)).astype(np.float32)
    x = jnp.asarray(iq)
    n = jnp.int32(4096)
    state = pipe.init_state()
    state, sym, cnt = pipe._step(state, x, n)
    int(cnt)  # compile+force
    t0 = time.perf_counter()
    s = state
    for _ in range(100):
        s, sym, cnt = pipe._step(s, x, n)
    int(cnt)
    demod_dt = time.perf_counter() - t0
    print(f"fsk_demod: 100 x 4096 samples in {demod_dt:.6f} s "
          f"({100*4096/demod_dt/1e6:.1f} Msamples/s) "
          f"[reference M1: 0.037 s = 11.0 Msamples/s]")


if __name__ == "__main__":
    main()
