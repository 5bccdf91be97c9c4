"""Chunked streaming TX modulator with carried state.

(The RX side lives in ``sdrmodem_tpu.dsp.pipeline`` as the ragged-block
jit pipeline; this module holds the TX analog: polyphase history + VCO
phase carried across TxData batches, the reference's gfsk_mod state,
src/dsp/gfsk_mod.c + frequency_modulator.c.)

The production path runs the whole NRZ → polyphase → VCO chain as ONE
fused Pallas call per TxData (ops/pallas_tx.py) — one device round trip
instead of the old interp-fetch-VCO-fetch ping-pong.  The k-1-bit FIR
history is mirrored host-side so ragged payloads can be zero-padded to
the jit shape without corrupting carried state (zero NRZ adds zero
phase; the padded history is recomputed from the real tail).
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from sdrmodem_tpu.dsp.gfsk_mod import GfskModConfig, GfskModulator, bytes_to_nrz


class StreamingGfskMod:
    """Chunked GFSK modulator: carried polyphase history + VCO phase."""

    # jit-shape granule for ragged TxData payloads (bits)
    PAD_BITS = 2048
    # max bytes per fused-kernel dispatch: the folded kernel runs the
    # whole payload as ONE grid step entirely in VMEM (r = bits/128 rows
    # x 2*interp output planes), so a coalesced multi-message payload
    # must be split to stay inside the 16 MB budget.  32 KiB = the wire
    # protocol's own max message (reference src/api_utils.c:8); state
    # carries across sub-dispatches, so any chunking of the stream is
    # equivalent up to f32 phase-prefix rounding (~1e-5 rad, far inside
    # the reference's 0.01 complex golden tolerance).
    MAX_DISPATCH_BYTES = 32768

    def __init__(self, config: GfskModConfig, backend: str | None = None):
        self.mod = GfskModulator(config)
        taps = self.mod.taps
        interp = self.mod.interpolation
        pad = (-len(taps)) % interp
        self.k = (len(taps) + pad) // interp
        self.hist = np.zeros(self.k - 1, np.float32)
        self.phase = 0.0
        if backend is None:
            backend = os.environ.get("SDRM_TX", "fused")
        self.backend = backend
        self._interpret = jax.default_backend() == "cpu"
        self._steps = {}

    # ------------------------------------------------------------------
    def _fused_step(self, nbits: int):
        """Jitted fused-kernel step for one padded bit count."""
        if nbits in self._steps:
            return self._steps[nbits]
        from sdrmodem_tpu.ops.pallas_tx import gfsk_tx_call_folded

        mod = self.mod
        interpret = self._interpret

        @jax.jit
        def step(nrz, phase, hist, nv):
            # nrz (nbits,) f32 zero-padded; the stream is folded across
            # the lanes and the whole payload runs as ONE kernel step
            return gfsk_tx_call_folded(
                nrz, mod.taps, mod.interpolation, mod.config.sensitivity,
                phase, hist, n_valid=nv, interpret=interpret,
            )

        self._steps[nbits] = step
        return step

    def process(self, data: bytes | np.ndarray) -> np.ndarray:
        data = (
            np.frombuffer(bytes(data), np.uint8)
            if isinstance(data, (bytes, bytearray))
            else np.asarray(data, np.uint8)
        )
        if len(data) == 0:
            return np.zeros(0, np.complex64)
        if self.backend != "fused":
            return self._process_xla(data)
        if len(data) > self.MAX_DISPATCH_BYTES:
            # coalesced / file-path payload: sub-dispatch loop with carried
            # state (same samples as any other chunking of the stream)
            return np.concatenate(
                [
                    self.process(data[s : s + self.MAX_DISPATCH_BYTES])
                    for s in range(0, len(data), self.MAX_DISPATCH_BYTES)
                ]
            )
        nrz = np.unpackbits(data).astype(np.float32) * 2.0 - 1.0
        nbits = len(nrz)
        padded_bits = -(-nbits // self.PAD_BITS) * self.PAD_BITS
        buf = np.zeros(padded_bits, np.float32)
        buf[:nbits] = nrz
        step = self._fused_step(padded_bits)
        i, q, phase = step(
            jnp.asarray(buf), jnp.float32(self.phase), jnp.asarray(self.hist),
            jnp.int32(nbits),
        )
        n_out = nbits * self.mod.interpolation
        # one device fetch for the combined pair
        iq = np.asarray(i[:n_out]) + 1j * np.asarray(q[:n_out])
        self.phase = float(phase)  # zero padding adds zero phase
        if self.k > 1:
            # history mirror from the REAL tail (the kernel's carried
            # history saw the zero padding)
            work = np.concatenate([self.hist, nrz])
            self.hist = work[-(self.k - 1) :].astype(np.float32)
        return iq.astype(np.complex64)

    def _process_xla(self, data: np.ndarray) -> np.ndarray:
        from sdrmodem_tpu.dsp.elementwise import freq_mod_stream_pair
        from sdrmodem_tpu.dsp.fir import interp_fir_stream

        nrz = np.asarray(bytes_to_nrz(jnp.asarray(data)))
        work = np.concatenate([self.hist, nrz])
        full = np.asarray(
            interp_fir_stream(jnp.asarray(work), self.mod.taps, self.mod.interpolation)
        )
        # drop the outputs that belong to the carried history positions
        out = full[len(self.hist) * self.mod.interpolation :]
        self.hist = work[-(self.k - 1) :] if self.k > 1 else work[:0]
        i, q, self.phase = freq_mod_stream_pair(
            jnp.asarray(out), self.mod.config.sensitivity, self.phase
        )
        self.phase = float(self.phase)
        return (np.asarray(i) + 1j * np.asarray(q)).astype(np.complex64)
