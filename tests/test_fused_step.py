"""Fused front+clock step kernel (ops/pallas_step.py) vs the unfused
production pair (fused front kernel + chunked clock kernel): symbols,
counts totals, and every piece of carried state must be BIT-IDENTICAL —
the fused step is a scheduling change (one program, software-pipelined
grid, MXU/VPU interleave), not a numeric one.

Runs in interpret mode on CPU (the same kernel code Mosaic compiles on
the TPU; tools/parity.py + bench.py validate the real-hardware behavior).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from sdrmodem_tpu.dsp.fsk_demod import FskDemodConfig
from sdrmodem_tpu.dsp.pipeline import DemodPipeline


@pytest.fixture(autouse=True)
def _small_chunk(monkeypatch):
    # small chunks exercise several grid steps per block on CPU-sized data
    monkeypatch.setenv("SDRM_STEP_CHUNK", "256")


def _flat(sym, cnt, lane):
    if not cnt[lane].sum():
        return np.zeros(0, np.int8)
    return np.concatenate([sym[lane, k, :c] for k, c in enumerate(cnt[lane])])


def compare_paths(cfg, block, x, iters=2, dop_fn=None):
    pipe = DemodPipeline(cfg, block, exact=False, use_atan_lut="free")
    assert pipe.fused_step_available(128)
    kw = dict(layout="tm", jit=False, doppler=dop_fn is not None)
    step_a = pipe.make_batched_step_full("pallas", front="step", **kw)
    step_b = pipe.make_batched_step_full("pallas", front="fused", **kw)
    sa, sb = pipe.init_full_state(128), pipe.init_full_state(128)
    total = 0
    for it in range(iters):
        args = (dop_fn(it),) if dop_fn is not None else ()
        sa, syma, cnta = step_a(sa, jnp.asarray(x), *args)
        sb, symb, cntb = step_b(sb, jnp.asarray(x), *args)
        syma, symb = np.asarray(syma), np.asarray(symb)
        ca, cb = np.asarray(cnta), np.asarray(cntb)
        assert ca.sum() == cb.sum()
        for lane in (0, 63, 127):
            va, vb = _flat(syma, ca, lane), _flat(symb, cb, lane)
            np.testing.assert_array_equal(va, vb)
        for name in ("lpf1_hist", "quad_prev", "lpf2_hist", "dc_hist"):
            a, b = getattr(sa, name), getattr(sb, name)
            if a is None:
                assert b is None
                continue
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for f in ("omega", "mu", "last_sample", "resid", "suffix"):
            np.testing.assert_array_equal(
                np.asarray(getattr(sa.clock, f)), np.asarray(getattr(sb.clock, f))
            )
        total += int(ca.sum())
    assert total > 0
    return total


def test_fused_step_dc_d2():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((1024, 256)) * 0.3).astype(np.float32)
    compare_paths(FskDemodConfig(48000, 4800, 5000, 2, 2000, True), 1024, x)


def test_fused_step_no_dc():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((512, 256)) * 0.3).astype(np.float32)
    compare_paths(
        FskDemodConfig(48000, 4800, 5000, 2, 2000, False), 512, x, iters=1
    )


def test_fused_step_d1():
    rng = np.random.default_rng(2)
    x = (rng.standard_normal((512, 256)) * 0.3).astype(np.float32)
    compare_paths(
        FskDemodConfig(192000, 40000, 5000, 1, 2000, True), 512, x, iters=1
    )


def test_fused_step_nan_policy():
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((512, 256)) * 0.3).astype(np.float32)
    x[100:140, :] = np.nan
    compare_paths(
        FskDemodConfig(240000, 9600, 5000, 1, 2000, True), 512, x, iters=1
    )


def test_fused_step_no_interleave(monkeypatch):
    monkeypatch.setenv("SDRM_STEP_INTERLEAVE", "0")
    rng = np.random.default_rng(4)
    x = (rng.standard_normal((512, 256)) * 0.3).astype(np.float32)
    compare_paths(
        FskDemodConfig(48000, 4800, 5000, 2, 2000, True), 512, x, iters=1
    )


def test_fused_step_doppler():
    """The in-kernel device-Doppler mix rides the fused step identically."""
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((1024, 256)) * 0.3).astype(np.float32)

    def dop_fn(it):
        # two piecewise segments per block, distinct per-lane ramps
        c = 128
        starts = np.zeros((2, c), np.float32)
        starts[1] = 512
        ends = np.full((2, c), 512, np.float32)
        ends[1] = 1024
        adjs = np.tile(
            np.linspace(1e-4, 3e-3, c, dtype=np.float32), (2, 1)
        ) * (1.0 + it)
        ph0s = np.zeros((2, c), np.float32)
        ph0s[1] = 0.7
        return tuple(jnp.asarray(a) for a in (starts, ends, adjs, ph0s))

    compare_paths(
        FskDemodConfig(48000, 4800, 5000, 2, 2000, True),
        1024,
        x,
        iters=1,
        dop_fn=dop_fn,
    )


def test_fused_step_block_size_invariance():
    """One long stream split as 2 blocks of B vs 1 block of 2B: identical
    symbols (the carried state hand-off is exact)."""
    cfg = FskDemodConfig(48000, 4800, 5000, 2, 2000, True)
    rng = np.random.default_rng(6)
    x = (rng.standard_normal((2048, 256)) * 0.3).astype(np.float32)

    def run(block, chunks):
        pipe = DemodPipeline(cfg, block, exact=False, use_atan_lut="free")
        step = pipe.make_batched_step_full(
            "pallas", layout="tm", front="step", jit=False
        )
        s = pipe.init_full_state(128)
        outs = []
        for c in chunks:
            s, sym, cnt = step(s, jnp.asarray(c))
            sym, cnt = np.asarray(sym), np.asarray(cnt)
            outs.append(_flat(sym, cnt, 0))
        return np.concatenate(outs)

    a = run(1024, [x[:1024], x[1024:]])
    b = run(2048, [x])
    np.testing.assert_array_equal(a, b)
