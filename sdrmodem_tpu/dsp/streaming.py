"""Chunked streaming TX modulator with carried state.

(The RX side lives in ``sdrmodem_tpu.dsp.pipeline`` as the ragged-block
jit pipeline; this module holds the TX analog: polyphase history + VCO
phase carried across TxData batches, the reference's gfsk_mod state,
src/dsp/gfsk_mod.c + frequency_modulator.c.)
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from sdrmodem_tpu.dsp.fir import interp_fir_stream
from sdrmodem_tpu.dsp.gfsk_mod import GfskModConfig, GfskModulator, bytes_to_nrz


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
        from sdrmodem_tpu.dsp.elementwise import freq_mod_stream_pair

        # pair path: the production TPU backend has no complex dtype, so
        # the VCO emits (I, Q) float32 and the host combines
        i, q, self.phase = freq_mod_stream_pair(
            jnp.asarray(out), self.mod.config.sensitivity, self.phase
        )
        self.phase = float(self.phase)
        return (np.asarray(i) + 1j * np.asarray(q)).astype(np.complex64)
