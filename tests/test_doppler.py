"""Doppler correction against the reference's recorded-pass goldens
(reference test/test_doppler.c — which always streams 2000-sample chunks;
the 47000/95000 variants only change the allocated max buffer)."""

import numpy as np
import pytest

from sdrmodem_tpu.dsp.doppler import Doppler

TLE = [
    "LUCKY-7",
    "1 44406U 19038W   20069.88080907  .00000505  00000-0  32890-4 0  9992",
    "2 44406  97.5270  32.5584 0026284 107.4758 252.9348 15.12089395 37524",
]

ARGS = dict(
    latitude=53.72,
    longitude=47.57,
    altitude_km=0.0,
    sampling_freq=48000,
    center_freq=437525000,
    tle_lines=TLE,
    constant_offset=0,
    start_time_seconds=1583840449,
)


def _stream(d, iq, chunk, direction):
    out = []
    fn = d.process_rx if direction > 0 else d.process_tx
    for i in range(0, len(iq), chunk):
        out.append(fn(iq[i : i + chunk]))
    return np.concatenate(out)


@pytest.mark.parametrize(
    "golden", ["lucky7.expected.cf32", "lucky7.expected.47000.cf32", "lucky7.expected.95000.cf32"]
)
def test_doppler_rx_golden(resources_dir, golden):
    iq = np.fromfile(resources_dir / "lucky7.cf32", dtype=np.complex64)
    exp = np.fromfile(resources_dir / golden, dtype=np.complex64)
    got = _stream(Doppler(**ARGS), iq, 2000, +1)
    assert np.abs(got.real - exp.real).max() < 0.01
    assert np.abs(got.imag - exp.imag).max() < 0.01


def test_doppler_tx_inverts_rx(resources_dir):
    iq = np.fromfile(resources_dir / "lucky7.expected.cf32", dtype=np.complex64)
    exp = np.fromfile(resources_dir / "lucky7.cf32", dtype=np.complex64)
    got = _stream(Doppler(**ARGS), iq, 2000, -1)
    assert np.abs(got.real - exp.real).max() < 0.01
    assert np.abs(got.imag - exp.imag).max() < 0.01


def test_doppler_chunk_trajectory_is_buffer_dependent(resources_dir):
    """The reference interpolates the shift per process() call, so chunk size
    shapes the frequency staircase — document that behaviour."""
    iq = np.fromfile(resources_dir / "lucky7.cf32", dtype=np.complex64)[:96000]
    a = _stream(Doppler(**ARGS), iq, 2000, +1)
    b = _stream(Doppler(**ARGS), iq, 48000, +1)
    # same to first order but not identical
    assert np.abs(a - b).max() > 1e-4


def test_doppler_end_to_end_demod(resources_dir):
    """Doppler correction + GMSK demod = the full reference RX pipeline
    (dsp_worker.c:65-76): raw pass recording to soft symbols."""
    import jax.numpy as jnp

    from sdrmodem_tpu import FskDemodConfig, FskDemodulator

    iq = np.fromfile(resources_dir / "lucky7.cf32", dtype=np.complex64)
    corrected = _stream(Doppler(**ARGS), iq, 2000, +1)
    golden = np.fromfile(resources_dir / "lucky7.expected.s8", dtype=np.int8)
    out, count, _ = FskDemodulator(FskDemodConfig(48000, 4800, 5000, 2, 2000, True)).process(
        jnp.asarray(corrected)
    )
    got = np.asarray(out)[: int(count)]
    assert len(got) == len(golden)
    diff = np.abs(got.astype(np.int32) - golden.astype(np.int32))
    # the doppler trajectory differs from the golden's by float-level noise,
    # which the chaotic M&M loop can amplify at a handful of symbols
    assert (diff <= 2).mean() > 0.995
