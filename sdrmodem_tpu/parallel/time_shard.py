"""Time-sharded demodulation of one long stream across devices.

The reference streams unbounded signals in O(buffer) memory by carrying
per-block state (FIR tails, quad-demod sample, clock phase —
src/dsp/fir_filter.c:107-110, clock_recovery_mm.c:119-135).  Sharded over
a TPU mesh this becomes (BASELINE.json config #5):

- the filter front-end (LPF1 → quad demod → LPF2 → DC) is data-parallel
  over time blocks with **overlap-save halo exchange**: each device
  receives its left neighbour's taps-1 tail via ``jax.lax.ppermute`` over
  ICI, so every FIR window is complete and the sharded result equals the
  unsharded stream bit for bit;
- M&M clock recovery is inherently sequential, so its tiny carried state
  {omega, mu, last, input tail} is **handed block-to-block**: block d's
  scan consumes block d-1's final state.  Here the hand-off is a
  sequential pass over the sharded blocks (device-to-device state
  transfer); multiple independent streams can be pipelined to fill all
  devices every step.

Block length must be a multiple of the decimation factor so decimated
output indices align with block boundaries.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sdrmodem_tpu.dsp.clock_recovery import clock_mm_stream, initial_state
from sdrmodem_tpu.dsp.elementwise import dc_blocker_taps, fast_atan2
from sdrmodem_tpu.dsp.fir import fir_stream
from sdrmodem_tpu.dsp.fsk_demod import FskDemodConfig, float_to_int8


def _halo_left(x: jnp.ndarray, h: int, axis_name: str) -> jnp.ndarray:
    """Prepend the left neighbour's last ``h`` samples (zeros on device 0)."""
    n_dev = jax.lax.axis_size(axis_name)
    tail = x[..., -h:]
    perm = [(i, i + 1) for i in range(n_dev - 1)]
    halo = jax.lax.ppermute(tail, axis_name, perm)
    return jnp.concatenate([halo, x], axis=-1)


def _front_end_block(x_pair: jnp.ndarray, cfg: FskDemodConfig, taps1, taps2, tapsdc, axis_name: str):
    """One device's share of the filter front-end with halo exchange.

    x_pair: (2, Nb) float32 — this device's time block.
    Returns (Mb,) float32 decimated soft stream aligned to the global
    stream (Mb = Nb / decimation).
    """
    t1, t2 = len(taps1), len(taps2)
    d = cfg.decimation

    # LPF1 (complex as 2 lanes), halo t1-1
    work = _halo_left(x_pair, t1 - 1, axis_name)
    y1 = fir_stream(work, taps1, 1, history=False)  # (2, Nb)

    # quadrature demod, halo 1 sample of y1
    y1h = _halo_left(y1, 1, axis_name)
    re = y1h[0, 1:] * y1h[0, :-1] + y1h[1, 1:] * y1h[1, :-1]
    im = y1h[1, 1:] * y1h[0, :-1] - y1h[0, 1:] * y1h[1, :-1]
    q = jnp.float32(cfg.quad_gain) * fast_atan2(im, re)  # (Nb,)

    # LPF2 decimating, halo t2-1 input samples
    qh = _halo_left(q[None, :], t2 - 1, axis_name)
    y2 = fir_stream(qh, taps2, d, history=False)[0]  # (Nb/d,)

    if tapsdc is not None:
        y2h = _halo_left(y2[None, :], len(tapsdc) - 1, axis_name)
        y2 = fir_stream(y2h, tapsdc, 1, history=False)[0]
    return y2


def demod_time_sharded(
    iq: np.ndarray,
    config: FskDemodConfig,
    mesh: Mesh,
    axis: str = "time",
):
    """Demodulate one stream with its time axis sharded over ``mesh``.

    Returns (int8 symbols, count) equal to the unsharded whole-stream
    demod (modulo the first-block zero-history warmup, which is identical
    by construction).
    """
    n_dev = mesh.shape[axis]
    n = len(iq)
    d = config.decimation
    block = -(-n // n_dev)
    block = -(-block // d) * d  # multiple of decimation
    padded = np.zeros(block * n_dev, np.complex64)
    padded[:n] = np.asarray(iq, np.complex64)
    x = np.stack([padded.real, padded.imag]).reshape(2, n_dev, block).transpose(1, 0, 2)
    x = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P(axis, None, None))
    )  # (D, 2, Nb)

    taps1 = config.lpf1_taps()
    taps2 = config.lpf2_taps()
    tapsdc = dc_blocker_taps(config.dc_length) if config.use_dc_block else None

    front = jax.jit(
        jax.shard_map(
            lambda blk: _front_end_block(blk[0], config, taps1, taps2, tapsdc, axis)[None, :],
            mesh=mesh,
            in_specs=P(axis, None, None),
            out_specs=P(axis, None),
            check_vma=False,
        )
    )
    soft_blocks = front(x)  # (D, Nb/d) sharded over devices

    # clock recovery: sequential state hand-off over blocks
    p = config.clock_params()
    clock = jax.jit(
        partial(
            clock_mm_stream,
            omega=p["omega"],
            gain_omega=p["gain_omega"],
            mu=p["mu"],
            gain_mu=p["gain_mu"],
            omega_relative_limit=p["omega_relative_limit"],
        )
    )
    state = initial_state(p["omega"], p["mu"])
    symbols = []
    valid_in = n // d
    for b in range(n_dev):
        remaining = valid_in - b * (block // d)
        n_valid = int(np.clip(remaining, 0, block // d))
        outs, count, state = clock(soft_blocks[b], state=state, n_valid=n_valid)
        symbols.append(np.asarray(outs)[: int(count)])
    soft = np.concatenate(symbols)
    return np.asarray(float_to_int8(jnp.asarray(soft))), len(soft)


def demod_grid_sharded(
    iq: np.ndarray,  # (C, N) complex64
    config: FskDemodConfig,
    mesh: Mesh,
    channel_axis: str = "channel",
    time_axis: str = "time",
):
    """2-D sharding: channels over one mesh axis, each stream's TIME over
    the other — BASELINE.json's largest configuration (1024 channels x
    long blocks across hosts).  The filter front-end runs fully parallel
    on the (channel, time) grid with ppermute halo exchange along the
    time axis only; the sequential M&M hand-off walks the time blocks
    with all channels advancing together.

    Returns (list of per-channel int8 symbol arrays).
    """
    c, n = iq.shape
    n_t = mesh.shape[time_axis]
    d = config.decimation
    block = -(-n // n_t)
    block = -(-block // d) * d
    padded = np.zeros((c, block * n_t), np.complex64)
    padded[:, :n] = np.asarray(iq, np.complex64)
    x = np.stack([padded.real, padded.imag], axis=1)  # (C, 2, N')
    x = x.reshape(c, 2, n_t, block)
    x = jax.device_put(
        jnp.asarray(x), NamedSharding(mesh, P(channel_axis, None, time_axis, None))
    )

    taps1 = config.lpf1_taps()
    taps2 = config.lpf2_taps()
    tapsdc = dc_blocker_taps(config.dc_length) if config.use_dc_block else None

    def local_front(blk):  # (Cl, 2, 1, Nb)
        per_ch = jax.vmap(
            lambda p: _front_end_block(p, config, taps1, taps2, tapsdc, time_axis)
        )
        return per_ch(blk[:, :, 0, :])[:, None, :]  # (Cl, 1, Nb/d)

    front = jax.jit(
        jax.shard_map(
            local_front,
            mesh=mesh,
            in_specs=P(channel_axis, None, time_axis, None),
            out_specs=P(channel_axis, time_axis, None),
            check_vma=False,
        )
    )
    soft = front(x)  # (C, n_t, block/d)

    # sequential clock hand-off over time blocks, all channels batched
    p = config.clock_params()
    clock = jax.jit(
        jax.vmap(
            lambda dta, st, nv: clock_mm_stream(
                dta, state=st, n_valid=nv,
                omega=p["omega"], gain_omega=p["gain_omega"], mu=p["mu"],
                gain_mu=p["gain_mu"],
                omega_relative_limit=p["omega_relative_limit"],
            )
        )
    )
    state = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (c,) + a.shape),
        initial_state(p["omega"], p["mu"]),
    )
    valid_in = n // d
    outs_per_channel = [[] for _ in range(c)]
    for b in range(n_t):
        remaining = valid_in - b * (block // d)
        n_valid = jnp.full((c,), int(np.clip(remaining, 0, block // d)), jnp.int32)
        outs, counts, state = clock(soft[:, b], state, n_valid)
        outs, counts = np.asarray(outs), np.asarray(counts)
        for ch in range(c):
            outs_per_channel[ch].append(outs[ch, : counts[ch]])
    return [
        np.asarray(float_to_int8(jnp.asarray(np.concatenate(o))))
        for o in outs_per_channel
    ]
