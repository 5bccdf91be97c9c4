"""Stateful chunked streaming on top of the whole-stream kernels.

The server processes IQ in ``buffer_size`` blocks exactly like the
reference's dsp_worker/tcp_worker threads; each DSP stage carries its
history between chunks (the reference's working-buffer memmove pattern,
src/dsp/fir_filter.c:95-113).  Because the stream kernels are
chunk-invariant, a chunked run equals the whole-stream run bit for bit.

State lives on host (numpy) between calls; each chunk runs through a
jit-compiled device program per (chunk-shape, history-shape) — the set of
shapes is tiny and cyclic for a fixed block size.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from sdrmodem_tpu.dsp.clock_recovery import ClockState, clock_mm_stream, initial_state
from sdrmodem_tpu.dsp.elementwise import dc_blocker_taps, quad_demod_stream
from sdrmodem_tpu.dsp.fir import fir_stream, interp_fir_stream
from sdrmodem_tpu.dsp.fsk_demod import FskDemodConfig, float_to_int8
from sdrmodem_tpu.dsp.gfsk_mod import GfskModConfig, GfskModulator, bytes_to_nrz


class _FirChunk:
    """Chunked decimating FIR with carried history (host-held)."""

    def __init__(self, taps: np.ndarray, decimation: int, complex_input: bool, exact: bool):
        self.taps = np.asarray(taps, np.float32)
        self.d = int(decimation)
        dtype = np.complex64 if complex_input else np.float32
        self.hist = np.zeros(len(self.taps) - 1, dtype)
        self.exact = exact

    def process(self, x: np.ndarray) -> np.ndarray:
        work = np.concatenate([self.hist, x])
        t = len(self.taps)
        nout = max(0, (len(work) - (t - 1) + self.d - 1) // self.d)
        if nout == 0:
            self.hist = work
            return work[:0]
        y = np.asarray(
            fir_stream(jnp.asarray(work), self.taps, self.d, history=False, exact=self.exact)
        )[:nout]
        self.hist = work[nout * self.d :]
        return y


class StreamingFskDemod:
    """Chunked GMSK demod: the per-client dsp_worker pipeline."""

    def __init__(self, config: FskDemodConfig, *, use_atan_lut: bool = True, exact: bool = True):
        self.config = config
        self.exact = exact
        self.use_atan_lut = use_atan_lut
        self.lpf1 = _FirChunk(config.lpf1_taps(), 1, True, exact)
        self.lpf2 = _FirChunk(config.lpf2_taps(), config.decimation, False, exact)
        self.dc = (
            _FirChunk(dc_blocker_taps(config.dc_length), 1, False, exact)
            if config.use_dc_block
            else None
        )
        self.prev = np.complex64(0)
        p = config.clock_params()
        self.clock_params = p
        self.clock_state: ClockState = initial_state(p["omega"], p["mu"])

    def process(self, iq: np.ndarray) -> np.ndarray:
        """complex64 chunk -> int8 soft symbols produced by this chunk."""
        iq = np.asarray(iq, np.complex64)
        if len(iq) == 0:
            return np.zeros(0, np.int8)
        x = self.lpf1.process(iq)
        if len(x) == 0:
            return np.zeros(0, np.int8)
        y = np.asarray(
            quad_demod_stream(
                jnp.asarray(np.concatenate([[self.prev], x])),
                self.config.quad_gain,
                use_lut=self.use_atan_lut,
            )
        )[1:]
        self.prev = x[-1]
        y = self.lpf2.process(y)
        if self.dc is not None and len(y):
            y = self.dc.process(y)
        if len(y) == 0:
            return np.zeros(0, np.int8)
        p = self.clock_params
        outs, count, self.clock_state = clock_mm_stream(
            jnp.asarray(y),
            omega=p["omega"],
            gain_omega=p["gain_omega"],
            mu=p["mu"],
            gain_mu=p["gain_mu"],
            omega_relative_limit=p["omega_relative_limit"],
            state=self.clock_state,
        )
        soft = np.asarray(outs)[: int(count)]
        return np.asarray(float_to_int8(jnp.asarray(soft)))


class StreamingGfskMod:
    """Chunked GFSK modulator: carried polyphase history + VCO phase."""

    def __init__(self, config: GfskModConfig):
        self.mod = GfskModulator(config)
        taps = self.mod.taps
        interp = self.mod.interpolation
        pad = (-len(taps)) % interp
        self.k = (len(taps) + pad) // interp
        self.hist = np.zeros(self.k - 1, np.float32)
        self.phase = 0.0

    def process(self, data: bytes | np.ndarray) -> np.ndarray:
        data = np.frombuffer(bytes(data), np.uint8) if isinstance(data, (bytes, bytearray)) else np.asarray(data, np.uint8)
        if len(data) == 0:
            return np.zeros(0, np.complex64)
        nrz = np.asarray(bytes_to_nrz(jnp.asarray(data)))
        work = np.concatenate([self.hist, nrz])
        full = np.asarray(
            interp_fir_stream(jnp.asarray(work), self.mod.taps, self.mod.interpolation)
        )
        # drop the outputs that belong to the carried history positions
        out = full[len(self.hist) * self.mod.interpolation :]
        self.hist = work[-(self.k - 1) :] if self.k > 1 else work[:0]
        from sdrmodem_tpu.dsp.elementwise import freq_mod_stream

        iq, self.phase = freq_mod_stream(
            jnp.asarray(out), self.mod.config.sensitivity, self.phase
        )
        return np.asarray(iq)
