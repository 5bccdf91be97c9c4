"""GFSK/GMSK modulator: bytes → NRZ → Gaussian polyphase FIR → VCO.

Chain assembly matches reference src/dsp/gfsk_mod.c:43-132:

- pulse taps = gaussian(4*sps taps, BT) convolved with ones(int(sps))
- bytes expand MSB-first to ±1.0 NRZ at 1 sample/bit
- polyphase interpolating FIR by factor int(sps)
- frequency modulator with sensitivity 2*pi*deviation/Fs
  (set at reference src/tcp_server.c:529)

Expressed as one jit program: the bit expansion is a reshape, the
interpolator is a single convolution producing ``sps`` output phases per
bit (MXU-friendly), and the VCO is a cumulative sum + complex exp.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from sdrmodem_tpu.dsp import taps as taps_mod
from sdrmodem_tpu.dsp.elementwise import freq_mod_stream
from sdrmodem_tpu.dsp.fir import interp_fir_stream


@dataclass(frozen=True)
class GfskModConfig:
    samples_per_symbol: float
    sensitivity: float
    bt: float = 0.5

    @classmethod
    def from_radio(cls, sampling_freq: int, baud_rate: int, deviation: int, bt: float = 0.5):
        """Derive from radio parameters as the reference server does."""
        return cls(
            samples_per_symbol=float(np.float32(sampling_freq / baud_rate)),
            sensitivity=float(np.float32(2.0 * np.pi * deviation / sampling_freq)),
            bt=bt,
        )


def bytes_to_nrz(data: jnp.ndarray) -> jnp.ndarray:
    """uint8 bytes (..., N) → float32 (..., N*8) of ±1.0, MSB first."""
    data = data.astype(jnp.uint8)
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (data[..., :, None] >> shifts) & 1
    nrz = jnp.where(bits == 0, jnp.float32(-1.0), jnp.float32(1.0))
    return nrz.reshape(*data.shape[:-1], data.shape[-1] * 8)


class GfskModulator:
    """Whole-stream GFSK modulator; channels batch on a leading axis."""

    def __init__(self, config: GfskModConfig):
        self.config = config
        self.interpolation = int(config.samples_per_symbol)
        self.taps = taps_mod.gfsk_pulse_taps(config.samples_per_symbol, config.bt)

    def process(self, data: jnp.ndarray, phase0=0.0):
        """data: uint8 (..., N) → (complex64 (..., N*8*int(sps)), next_phase)."""
        nrz = bytes_to_nrz(data)
        filtered = interp_fir_stream(nrz, self.taps, self.interpolation)
        return freq_mod_stream(filtered, self.config.sensitivity, phase0)

    def process_pair(self, data: jnp.ndarray, phase0=0.0, *, exact: bool = False):
        """Complex-free variant for the TPU backend: uint8 (..., N) →
        (I, Q float32 (..., N*8*int(sps)), next_phase).

        ``exact=False`` (production) runs the VCO as a two-level float32
        prefix sum (elementwise.freq_mod_pair_fast, ~O(tile) parallel);
        ``exact=True`` keeps the float64-accumulated parity VCO."""
        from sdrmodem_tpu.dsp.elementwise import freq_mod_stream_pair

        nrz = bytes_to_nrz(data)
        filtered = interp_fir_stream(nrz, self.taps, self.interpolation)
        return freq_mod_stream_pair(filtered, self.config.sensitivity, phase0, exact=exact)

    def process_pair_kernel(self, data: jnp.ndarray, phase0=None, *, interpret: bool = False):
        """Fused-kernel TX (ops/pallas_tx.py): the whole NRZ → polyphase →
        VCO chain as ONE Pallas program — the production TPU path (the
        XLA chain is ~18 dispatch-bound ops on a latency-dominated block).

        data: uint8 (N,) or (C<=128, N).  Returns (I, Q, next_phase) with
        I/Q shaped like ``data`` expanded to N*8*int(sps) samples.
        Numerics match ``process_pair(exact=False)`` within f32 phase
        rounding (~1e-5 rad; golden tolerance is 0.01)."""
        from sdrmodem_tpu.ops.pallas_tx import (
            LANES,
            choose_tile,
            gfsk_tx_call,
            gfsk_tx_call_folded,
        )

        single = data.ndim == 1
        if single:
            # single stream: the FOLDED kernel (stream split across the
            # 128 lanes, one grid step) — the lane-per-stream variant
            # wastes 127 lanes and burns sequential grid-step overhead
            nrz = bytes_to_nrz(data)
            nbits = nrz.shape[0]
            pad = (-nbits) % (8 * LANES)
            nrz_p = jnp.pad(nrz, (0, pad))
            t2d_k = (
                len(self.taps) + (-len(self.taps)) % self.interpolation
            ) // self.interpolation
            i, q, phase = gfsk_tx_call_folded(
                nrz_p, self.taps, self.interpolation, self.config.sensitivity,
                0.0 if phase0 is None else phase0,
                jnp.zeros((t2d_k - 1,), jnp.float32),
                n_valid=nbits, interpret=interpret,
            )
            n_out = nbits * self.interpolation
            return i[:n_out], q[:n_out], phase
        batch = data
        c = batch.shape[0]
        if c > LANES:
            raise ValueError("process_pair_kernel handles up to 128 streams")
        nrz = bytes_to_nrz(batch)  # (C, Nbits)
        nbits = nrz.shape[-1]
        # zero-pad rows to the tile granule: zero NRZ adds zero phase, so
        # the carried phase is exact and the extra samples are trimmed
        pad_rows = (-nbits) % 8
        assert choose_tile(nbits + pad_rows) is not None
        nrz_tm = jnp.transpose(nrz)  # (Nbits, C)
        nrz_tm = jnp.pad(nrz_tm, ((0, pad_rows), (0, LANES - c)))
        if phase0 is None:
            ph = jnp.zeros((LANES,), jnp.float32)
        else:
            ph = jnp.zeros((LANES,), jnp.float32).at[:c].set(
                jnp.broadcast_to(jnp.asarray(phase0, jnp.float32), (c,))
            )
        t2d_k = (len(self.taps) + (-len(self.taps)) % self.interpolation) // self.interpolation
        hist = jnp.zeros((t2d_k - 1, LANES), jnp.float32)
        i_tm, q_tm, phase, _ = gfsk_tx_call(
            nrz_tm, self.taps, self.interpolation, self.config.sensitivity,
            ph, hist, interpret=interpret,
        )
        n_out = nbits * self.interpolation
        i = jnp.transpose(i_tm[:n_out, :c])
        q = jnp.transpose(q_tm[:n_out, :c])
        if single:
            return i[0], q[0], phase[0]
        return i, q, phase[:c]

    @cached_property
    def jit_process(self):
        return jax.jit(lambda data: self.process(data)[0])
