"""Channel-parallel batched demodulation over a device mesh.

The reference runs one dsp_worker thread per RX client
(src/dsp_worker.c:44-106); here channels are a leading batch axis of the
ragged-block pipeline, vmapped on-chip and sharded across a
``jax.sharding.Mesh`` axis with ``shard_map`` — config #4/#5 of
BASELINE.json (64 channels one host, 1024 channels across hosts).

Every per-channel state leaf is sharded along the same axis, so the step
needs NO collectives at all: channel parallelism is embarrassingly
parallel, exactly like the reference's independent threads.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sdrmodem_tpu.dsp.fsk_demod import FskDemodConfig
from sdrmodem_tpu.dsp.pipeline import DemodPipeline


class ShardedChannelDemod:
    """N-channel demodulator sharded over a mesh axis."""

    def __init__(
        self,
        config: FskDemodConfig,
        block_size: int,
        channels: int,
        mesh: Mesh,
        axis: str = "channel",
        *,
        exact: bool = False,
    ):
        if channels % mesh.shape[axis] != 0:
            raise ValueError("channels must divide evenly over the mesh axis")
        self.pipe = DemodPipeline(config, block_size, exact=exact)
        self.channels = channels
        self.mesh = mesh
        self.axis = axis
        self.block = block_size

        batched = jax.vmap(self.pipe._step_impl)
        state_spec = jax.tree.map(lambda _: P(axis), self._state_structure())
        self._step = jax.jit(
            jax.shard_map(
                batched,
                mesh=mesh,
                in_specs=(state_spec, P(axis, None, None), P(axis)),
                out_specs=(state_spec, P(axis, None), P(axis)),
                check_vma=False,
            )
        )

    def _state_structure(self):
        return self.pipe.init_state()

    def init_state(self):
        state = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (self.channels,) + a.shape),
            self.pipe.init_state(),
        )
        sharding = jax.tree.map(
            lambda _: NamedSharding(self.mesh, P(self.axis)), state
        )
        return jax.tree.map(jax.device_put, state, sharding)

    def place_input(self, iq: np.ndarray) -> jnp.ndarray:
        """(C, N) complex64 -> sharded (C, 2, N) float32 pairs."""
        x = np.stack([iq.real, iq.imag], axis=1).astype(np.float32)
        return jax.device_put(
            jnp.asarray(x), NamedSharding(self.mesh, P(self.axis, None, None))
        )

    def step(self, state, x_pairs, n_valid=None):
        """One block step for all channels.  x_pairs: (C, 2, B)."""
        if n_valid is None:
            n_valid = jnp.full((self.channels,), self.block, jnp.int32)
        return self._step(state, x_pairs, n_valid)
