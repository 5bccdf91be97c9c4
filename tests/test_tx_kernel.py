"""Fused TX kernel (ops/pallas_tx.py) vs the XLA chain and the goldens."""

import numpy as np
import pytest

import jax.numpy as jnp

from sdrmodem_tpu.dsp.gfsk_mod import GfskModConfig, GfskModulator
from sdrmodem_tpu.dsp.streaming import StreamingGfskMod

CFG = GfskModConfig.from_radio(19200, 9600, 5000)

# phase rounding class: the kernel's per-tile triangular-matmul cumsum
# and the XLA path's two-level cumsum group f32 sums differently; both
# stay ~1e-4 rad of the f64 phase — the goldens' tolerance is 0.01
TOL = 1e-3


def test_kernel_matches_xla_pair():
    mod = GfskModulator(CFG)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 255, 2048).astype(np.uint8))
    i0, q0, p0 = mod.process_pair(data, exact=False)
    i1, q1, p1 = mod.process_pair_kernel(data, interpret=True)
    assert i0.shape == i1.shape
    np.testing.assert_allclose(np.asarray(i0), np.asarray(i1), atol=TOL)
    np.testing.assert_allclose(np.asarray(q0), np.asarray(q1), atol=TOL)


def test_kernel_golden_320(fixtures_dir):
    """The reference's 320-float golden within the complex tolerance 0.01
    (reference test/utils.c:134-140)."""
    vals = np.load(fixtures_dir / "gfsk_mod_expected320.npy")
    mod = GfskModulator(CFG)
    i, q, _ = mod.process_pair_kernel(
        jnp.asarray(np.arange(10, dtype=np.uint8)), interpret=True
    )
    assert np.abs(np.asarray(i) - vals[0::2]).max() < 0.01
    assert np.abs(np.asarray(q) - vals[1::2]).max() < 0.01


def test_kernel_batched_streams():
    mod = GfskModulator(CFG)
    rng = np.random.default_rng(1)
    data = jnp.asarray(rng.integers(0, 255, (5, 96)).astype(np.uint8))
    ib, qb, _ = mod.process_pair_kernel(data, interpret=True)
    ir, qr, _ = mod.process_pair(data, exact=False)
    assert ib.shape == ir.shape == (5, 96 * 8 * 2)
    np.testing.assert_allclose(np.asarray(ib), np.asarray(ir), atol=TOL)


def test_streaming_fused_chunk_invariant():
    """Ragged TxData chunks through the fused streaming modulator equal
    the one-shot run (carried phase + host history mirror; the n_valid
    mask keeps the zero padding out of the phase)."""
    rng = np.random.default_rng(5)
    payload = rng.integers(0, 255, 700).astype(np.uint8)

    def run(backend, chunks):
        m = StreamingGfskMod(CFG, backend=backend)
        out, i = [], 0
        for c in chunks:
            out.append(m.process(payload[i : i + c]))
            i += c
        return np.concatenate(out)

    whole = run("fused", [700])
    chunked = run("fused", [100, 250, 350])
    xla = run("xla", [700])
    assert np.abs(whole - chunked).max() < TOL
    assert np.abs(whole - xla).max() < TOL


def test_streaming_fused_mod_demod_loopback():
    """TX through the fused kernel → RX recovers the bits."""
    from sdrmodem_tpu.dsp.fsk_demod import FskDemodConfig, FskDemodulator

    fs, baud, dev = 48000, 9600, 5000
    payload = np.frombuffer(b"fused tx kernel loopback \x00\xff!!" * 8, dtype=np.uint8)
    m = StreamingGfskMod(GfskModConfig.from_radio(fs, baud, dev), backend="fused")
    iq = np.concatenate([m.process(payload[:100]), m.process(payload[100:])])

    demod = FskDemodulator(FskDemodConfig(fs, baud, dev, 1, 2000, False))
    out, count, _ = demod.process(jnp.asarray(iq))
    soft = np.asarray(out)[: int(count)]
    bits_tx = np.unpackbits(payload).astype(np.int8) * 2 - 1
    hard = np.sign(soft).astype(np.int8)
    best = 0.0
    for off in range(0, 80):
        n = min(len(hard) - off, len(bits_tx))
        best = max(best, float((hard[off : off + n] == bits_tx[:n]).mean()))
    assert best > 0.999, f"loopback BER too high: {1 - best:.4f}"
