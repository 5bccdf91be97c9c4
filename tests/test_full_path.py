"""Full-block fast path vs the ragged pipeline: identical streams.

The full-block path (pipeline.DemodPipeline.make_batched_step_full) keeps
every stream-history length a compile-time constant and carries the
clock's unconsumed input as a fixed-size suffix + residual count
(ClockFullState) instead of an extracted tail.  Numerically it must
produce EXACTLY the ragged path's symbols — same conv formulation, same
scan core, same window values at shifted positions.
"""

import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sdrmodem_tpu.dsp.fsk_demod import FskDemodConfig
from sdrmodem_tpu.dsp.pipeline import DemodPipeline

RNG = np.random.default_rng(11)


def _collect(step_full, pipe, x_blocks):
    state = pipe.init_full_state(x_blocks[0].shape[0])
    outs = []
    for xb in x_blocks:
        state, symbols, counts = step_full(state, jnp.asarray(xb))
        symbols, counts = np.asarray(symbols), np.asarray(counts)
        outs.append([
            np.concatenate(
                [symbols[i, t, : counts[i, t]] for t in range(counts.shape[1])]
            )
            for i in range(symbols.shape[0])
        ])
    return [np.concatenate([o[i] for o in outs]) for i in range(x_blocks[0].shape[0])]


def _collect_ragged(pipe, x_blocks, channels):
    step = pipe.make_batched_step("scan")
    state = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (channels,) + a.shape), pipe.init_state()
    )
    n_valid = jnp.full((channels,), pipe.block, jnp.int32)
    outs = []
    for xb in x_blocks:
        state, symbols, counts = step(state, jnp.asarray(xb), n_valid)
        symbols, counts = np.asarray(symbols), np.asarray(counts)
        outs.append([symbols[i, : counts[i]] for i in range(channels)])
    return [np.concatenate([o[i] for o in outs]) for i in range(channels)]


@pytest.mark.parametrize("use_dc", [True, False])
def test_full_path_matches_ragged(use_dc):
    cfg = FskDemodConfig(48000, 4800, 5000, 2, 2000, use_dc)
    channels, block, nblocks = 3, 4096, 4
    pipe = DemodPipeline(cfg, block, exact=False, use_atan_lut=False)

    iq = (
        RNG.standard_normal((channels, nblocks * block))
        + 1j * RNG.standard_normal((channels, nblocks * block))
    ).astype(np.complex64)
    x = np.stack([iq.real, iq.imag], axis=1).astype(np.float32)  # (C, 2, N)
    blocks = [x[:, :, i * block : (i + 1) * block] for i in range(nblocks)]

    full = _collect(pipe.make_batched_step_full("scan"), pipe, blocks)
    ragged = _collect_ragged(pipe, blocks, channels)
    for f, r in zip(full, ragged):
        assert f.shape == r.shape
        _assert_close_int8(f, r)


def _assert_close_int8(f, r):
    """The two paths run the SAME ops but through different gemm shapes
    (ragged pads max_out), so XLA's accumulation order differs by ~1 ulp —
    the same reason the reference pins VOLK_GENERIC for its goldens and
    compares int8 within +-2 LSB (reference test/test_fsk_demod.c:43-48).
    A clock-timing slip would misalign everything and fail loudly."""
    d = np.abs(f.astype(np.int32) - r.astype(np.int32))
    assert np.mean(d <= 2) > 0.995 and d.max() <= 4


def test_full_path_nan_robust():
    cfg = FskDemodConfig(48000, 4800, 5000, 2, 2000, True)
    channels, block = 2, 4096
    pipe = DemodPipeline(cfg, block, exact=False, use_atan_lut=False)
    iq = (
        RNG.standard_normal((channels, 2 * block))
        + 1j * RNG.standard_normal((channels, 2 * block))
    ).astype(np.complex64)
    iq[0, 1000:1100] = np.nan
    x = np.stack([iq.real, iq.imag], axis=1).astype(np.float32)
    blocks = [x[:, :, :block], x[:, :, block:]]
    full = _collect(pipe.make_batched_step_full("scan"), pipe, blocks)
    ragged = _collect_ragged(pipe, blocks, channels)
    # Channel 1 is NaN-free: the paths must agree everywhere.  Channel 0's
    # NaN window poisons a (grouping-dependent) neighbourhood in each
    # path's banded matmuls, so their in-window garbage differs and the
    # chaotic M&M clock needs some symbols to re-lock — the contract is
    # full re-alignment (same counts, tail identical), like the
    # reference's NaN policy cares about recovery, not in-window values
    # (src/dsp/clock_recovery_mm.c:107-113; the nan.s8 golden is asserted
    # exactly in test_golden_demod.py / test_fused_front.py).
    f, r = full[1], ragged[1]
    assert f.shape == r.shape
    _assert_close_int8(f, r)
    f, r = full[0], ragged[0]
    assert f.shape == r.shape
    tail = len(f) // 2
    d = np.abs(f[-tail:].astype(np.int32) - r[-tail:].astype(np.int32))
    assert np.mean(d <= 2) > 0.995 and d.max() <= 4


def test_full_path_pallas_interpret_matches_scan():
    cfg = FskDemodConfig(48000, 4800, 5000, 2, 2000, True)
    channels, block = 2, 2048
    pipe = DemodPipeline(cfg, block, exact=False, use_atan_lut=False)
    iq = (
        RNG.standard_normal((channels, 2 * block))
        + 1j * RNG.standard_normal((channels, 2 * block))
    ).astype(np.complex64)
    x = np.stack([iq.real, iq.imag], axis=1).astype(np.float32)
    blocks = [x[:, :, :block], x[:, :, block:]]
    scan = _collect(pipe.make_batched_step_full("scan"), pipe, blocks)
    pall = _collect(
        pipe.make_batched_step_full("pallas", interpret=True), pipe, blocks
    )
    # the pallas interpolator evaluates the MMSE bank as Farrow polynomials
    # (tap error <6e-7): identical up to the chain's chaotic divergence, so
    # compare the flip-aligned prefix like tests/test_pallas.py does
    for s, p in zip(scan, pall):
        n = min(len(s), len(p), 200)
        assert n > 50
        agree = np.mean(np.abs(s[:n].astype(np.int32) - p[:n].astype(np.int32)) <= 2)
        assert agree > 0.9


def test_full_state_checkpoint_resume(tmp_path):
    """Snapshot the full-block state mid-stream, restore, continue: the
    resumed run emits exactly what the uninterrupted run emits."""
    from sdrmodem_tpu.utils.checkpoint import load_state, save_state

    cfg = FskDemodConfig(48000, 4800, 5000, 2, 2000, True)
    channels, block = 2, 4096
    pipe = DemodPipeline(cfg, block, exact=False, use_atan_lut=False)
    step = pipe.make_batched_step_full("scan")
    iq = (
        RNG.standard_normal((channels, 3 * block))
        + 1j * RNG.standard_normal((channels, 3 * block))
    ).astype(np.complex64)
    x = np.stack([iq.real, iq.imag], axis=1).astype(np.float32)
    blocks = [jnp.asarray(x[:, :, i * block : (i + 1) * block]) for i in range(3)]

    state = pipe.init_full_state(channels)
    state, s0, c0 = step(state, blocks[0])
    save_state(state, tmp_path / "snap.npz", meta={"block_index": 1})

    state, s1, c1 = step(state, blocks[1])
    state, s2, c2 = step(state, blocks[2])

    restored, meta = load_state(pipe.init_full_state(channels), tmp_path / "snap.npz")
    assert meta["block_index"] == 1
    restored, r1, rc1 = step(restored, blocks[1])
    restored, r2, rc2 = step(restored, blocks[2])
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(rc1))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(rc2))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(r2))


def _gmsk_like(baud_sps, n, seed):
    """Crude GMSK-ish soft stream source: random bits at ~baud_sps samples
    per symbol, pulse-shaped — enough structure for the M&M loop to track."""
    rng = np.random.default_rng(seed)
    nbits = int(n / baud_sps) + 16
    bits = rng.integers(0, 2, nbits) * 2.0 - 1.0
    t = np.arange(n)
    idx = np.floor(t / baud_sps).astype(int)
    nrz = bits[idx]
    k = np.hanning(9) / 4.5
    return np.convolve(nrz, k, mode="same").astype(np.float32)


def test_full_path_chunked_blocks_match_ragged():
    """Blocks large enough that the clock runs multiple internal sub-chunks
    (n2 > CHUNK): the chunk hand-off must reproduce the ragged stream."""
    from sdrmodem_tpu.dsp.clock_recovery import clock_chunk

    CHUNK = clock_chunk()

    cfg = FskDemodConfig(48000, 4800, 5000, 2, 2000, True)
    channels, block, nblocks = 2, 4 * CHUNK * 2, 2  # n2 = 4*CHUNK per block
    pipe = DemodPipeline(cfg, block, exact=False, use_atan_lut=False)
    iq = (
        RNG.standard_normal((channels, nblocks * block))
        + 1j * RNG.standard_normal((channels, nblocks * block))
    ).astype(np.complex64)
    x = np.stack([iq.real, iq.imag], axis=1).astype(np.float32)
    blocks = [x[:, :, i * block : (i + 1) * block] for i in range(nblocks)]
    full = _collect(pipe.make_batched_step_full("scan"), pipe, blocks)
    ragged = _collect_ragged(pipe, blocks, channels)
    for f, r in zip(full, ragged):
        assert f.shape == r.shape
        _assert_close_int8(f, r)


def test_full_path_divergent_symbol_clocks():
    """Channels whose true symbol rates differ by the full +-1% omega
    range: lane read pointers drift apart, exercising the clock kernel's
    window ladder and the per-chunk re-sync.  Pallas (interpret) must
    track the scan backend per lane."""
    from sdrmodem_tpu.dsp.clock_recovery import clock_chunk

    CHUNK = clock_chunk()

    cfg = FskDemodConfig(48000, 4800, 5000, 2, 2000, False)
    channels, block = 2, 2 * CHUNK * 2  # n2 = 2*CHUNK -> 2 sub-chunks
    pipe = DemodPipeline(cfg, block, exact=False, use_atan_lut=False)

    # feed the DECIMATED-rate soft streams through IQ that produces them:
    # instead, drive the whole chain with per-channel resampled captures.
    # simpler: different true baud -> different effective sps at the clock
    iq0 = np.fromfile(
        pathlib.Path(__file__).resolve().parent / "fixtures" / "lucky7.expected.cf32",
        np.complex64
    )
    n = 2 * block
    a = iq0[:n]
    # channel 1: resample by ~1.02 (different symbol rate within clip range)
    src = np.arange(n) * 1.02
    i0 = np.floor(src).astype(int)
    frac = (src - i0).astype(np.float32)
    b = (iq0[i0] * (1 - frac) + iq0[i0 + 1] * frac).astype(np.complex64)
    iq = np.stack([a, b])
    x = np.stack([iq.real, iq.imag], axis=1).astype(np.float32)
    blocks = [x[:, :, :block], x[:, :, block:]]

    scan = _collect(pipe.make_batched_step_full("scan"), pipe, blocks)
    pall = _collect(
        pipe.make_batched_step_full("pallas", interpret=True), pipe, blocks
    )
    for s, p in zip(scan, pall):
        n_cmp = min(len(s), len(p), 400)
        assert n_cmp > 100
        agree = np.mean(
            np.abs(s[:n_cmp].astype(np.int32) - p[:n_cmp].astype(np.int32)) <= 2
        )
        assert agree > 0.9


def test_full_path_layouts_match_cm():
    """layout="tm" (pre-staged time-major) and layout="fanout" (one shared
    stream broadcast on device) produce bit-identical output to the
    channel-major transpose path."""
    cfg = FskDemodConfig(48000, 4800, 5000, 2, 2000, True)
    block, nblocks = 4096, 2
    pipe = DemodPipeline(cfg, block, exact=False, use_atan_lut=False)
    cp = 128  # lane-padded channel count of a 1-channel state

    iq = (
        RNG.standard_normal(nblocks * block) + 1j * RNG.standard_normal(nblocks * block)
    ).astype(np.complex64)
    pair = np.stack([iq.real, iq.imag]).astype(np.float32)  # (2, N)

    step_cm = pipe.make_batched_step_full("scan", layout="cm")
    step_tm = pipe.make_batched_step_full("scan", layout="tm")
    step_fan = pipe.make_batched_step_full("scan", layout="fanout")

    s_cm = pipe.init_full_state(cp)
    s_tm = pipe.init_full_state(cp)
    s_fan = pipe.init_full_state(cp)
    for t in range(nblocks):
        chunk = pair[:, t * block : (t + 1) * block]  # (2, B)
        x_cm = np.broadcast_to(chunk, (cp, 2, block))
        x_tm = np.concatenate(
            [
                np.broadcast_to(chunk[0][:, None], (block, cp)),
                np.broadcast_to(chunk[1][:, None], (block, cp)),
            ],
            axis=1,
        )
        s_cm, sym_cm, cnt_cm = step_cm(s_cm, jnp.asarray(x_cm))
        s_tm, sym_tm, cnt_tm = step_tm(s_tm, jnp.asarray(np.ascontiguousarray(x_tm)))
        s_fan, sym_fan, cnt_fan = step_fan(s_fan, jnp.asarray(chunk))
        np.testing.assert_array_equal(np.asarray(cnt_cm), np.asarray(cnt_tm))
        np.testing.assert_array_equal(np.asarray(cnt_cm), np.asarray(cnt_fan))
        np.testing.assert_array_equal(np.asarray(sym_cm), np.asarray(sym_tm))
        np.testing.assert_array_equal(np.asarray(sym_cm), np.asarray(sym_fan))
