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
from sdrmodem_tpu.dsp.elementwise import atan2_dispatch, dc_blocker_taps, fast_atan2
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


def demod_pipelined(
    iq: np.ndarray,  # (S, N) complex64 — S independent streams, S == D
    config: FskDemodConfig,
    mesh: Mesh,
    axis: str = "time",
    *,
    clock_backend: str = "pallas",
    interpret: bool = False,
    use_atan_lut="free",
):
    """PRODUCTION multi-device path: S = D streams demodulated with each
    stream's time axis sharded over the mesh, ZERO idle device-rounds.

    The reference overlaps its sequential demod with concurrent reader
    threads (src/dsp_worker.c:44-106, src/queue.c:168-200); re-expressed
    for a TPU mesh as a systolic skew:

    - layout: stream s's time-block d lives on device (s + d) mod D, so
      for EVERY stream the predecessor block is on the ring-left
      neighbour and block 0 of stream p is local to device p;
    - front-end (LPF1 → quad → LPF2 → DC) runs on the full-block
      production kernels (ops/pallas_fir.conv1d_banded_tm — the same
      banded-MXU matmuls the single-chip server path uses), all S
      blocks per device batched in the 128 vector lanes; each stage's
      carried history is its ring-left neighbour's output tail (one
      ppermute per stage, zeros for block 0) — numerically IDENTICAL
      to the unsharded full-block state hand-off;
    - M&M clock recovery is sequential per stream, so the D block-walks
      rotate: in round r device p advances stream (p - r) mod D through
      its local block (index r), then the tiny suffix-carry state
      (ClockFullState: 64-sample suffix + 4 scalars) ppermutes one step
      right.  Every round keeps ALL devices busy on a different
      stream's clock — the pipeline analog of the reference's
      reader/demod thread overlap, with D rounds total and zero fill
      or drain bubbles (see ``pipeline_schedule_report``).

    Returns list of S int8 symbol arrays, bit-identical to feeding each
    stream through DemodPipeline.make_batched_step_full with block = N/D.
    """
    if jax.default_backend() == "cpu":
        interpret = True  # Mosaic kernels need a TPU; CPU = interpret mode
    n_dev = mesh.shape[axis]
    s_streams, n = iq.shape
    if s_streams != n_dev:
        raise ValueError("demod_pipelined needs exactly one stream per device")
    d = config.decimation
    block = -(-n // n_dev)
    block = -(-block // d) * d
    padded = np.zeros((s_streams, block * n_dev), np.complex64)
    padded[:, :n] = np.asarray(iq, np.complex64)

    lanes = 128  # conv1d_banded_tm lane granule; streams occupy lanes [0, S)
    # skewed placement: device p holds, for every stream s, block (p - s)
    # mod D, time-major with I in lanes [0, lanes) and Q in [lanes, 2*lanes)
    x_skew = np.zeros((n_dev, block, 2 * lanes), np.float32)
    for s in range(s_streams):
        for dd in range(n_dev):
            p = (s + dd) % n_dev
            blk = padded[s, dd * block : (dd + 1) * block]
            x_skew[p, :, s] = blk.real
            x_skew[p, :, lanes + s] = blk.imag
    x = jax.device_put(
        jnp.asarray(x_skew), NamedSharding(mesh, P(axis, None, None))
    )

    pipe_like = _PipeTaps(config, use_atan_lut)
    from sdrmodem_tpu.dsp.clock_recovery import initial_full_state

    p_clock = config.clock_params()
    cstate0 = initial_full_state(p_clock["omega"], 1, p_clock["mu"])

    def shard_fn(x_loc, cstate):
        x_tm = x_loc[0]  # (B, 2*lanes)
        cstate = jax.tree.map(lambda a: a[0], cstate)  # strip local shard dim
        soft = _front_full_halo(x_tm, pipe_like, axis, lanes, interpret)
        outs, counts = _clock_rotation(
            soft, cstate, pipe_like, axis, n_dev, lanes,
            clock_backend=clock_backend, interpret=interpret,
        )
        return outs[None], counts[None]

    run = jax.jit(
        jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis, None, None), P(axis)),
            out_specs=(P(axis, None, None, None), P(axis, None, None)),
            check_vma=False,
        )
    )
    cstate = jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (n_dev,) + a.shape), cstate0
    )
    outs, counts = run(x, cstate)
    outs, counts = np.asarray(outs), np.asarray(counts)

    # reassemble: stream s's block r was produced on device (s + r) mod D.
    # When n is not a multiple of D*decimation the zero padding clocks out
    # trailing zero symbols, exactly as the unsharded step would on the
    # same padded stream.
    results = []
    for s in range(s_streams):
        parts = []
        for r in range(n_dev):
            dev = (s + r) % n_dev
            for t in range(counts.shape[2]):
                parts.append(outs[dev, r, t, : counts[dev, r, t]])
        results.append(np.concatenate(parts))
    return results


class _PipeTaps:
    """Tap set + derived params shared by the sharded front-end (the same
    values DemodPipeline computes; kept standalone so the shard function
    closes over plain arrays)."""

    def __init__(self, config: FskDemodConfig, use_atan_lut="free"):
        self.config = config
        self.use_atan_lut = use_atan_lut  # production server default (session.py)
        self.t1 = np.asarray(config.lpf1_taps(), np.float32)
        self.t2 = np.asarray(config.lpf2_taps(), np.float32)
        self.tdc = (
            np.asarray(dc_blocker_taps(config.dc_length), np.float32)
            if config.use_dc_block
            else None
        )


def _ring_halo(arr, h, axis_name, lanes, p):
    """Ring-shift the last ``h`` rows one device right; zero the halo for
    lanes whose LOCAL block is the stream's first (stream index == device
    index under the skewed layout)."""
    tail = arr[-h:, :]
    n_dev = jax.lax.axis_size(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    halo = jax.lax.ppermute(tail, axis_name, perm)
    first = (jnp.arange(arr.shape[1]) % lanes) == p
    return jnp.where(first[None, :], 0.0, halo)


def _front_full_halo(x_tm, taps: _PipeTaps, axis_name, lanes, interpret):
    """The full-block production front-end (mirrors
    DemodPipeline._front_batched_full line for line) with every carried
    history replaced by the ring-left neighbour's tail."""
    from sdrmodem_tpu.ops.pallas_fir import conv1d_banded_tm

    cfg = taps.config
    b = x_tm.shape[0]
    d = cfg.decimation
    p = jax.lax.axis_index(axis_name)

    # stream-aligned convention (zero pad rows + col_offset) — keeps every
    # 128-row accumulation sub-block on stream row 0 mod 128, matching
    # DemodPipeline._front_batched_full and the fused kernel bit for bit
    pad1 = (-(len(taps.t1) - 1)) % 128
    hist1 = _ring_halo(x_tm, len(taps.t1) - 1, axis_name, lanes, p)
    work1 = jnp.concatenate(
        [jnp.zeros((pad1, x_tm.shape[1]), jnp.float32), hist1, x_tm], axis=0
    )
    y1 = conv1d_banded_tm(
        work1, taps.t1[::-1], 1, b, interpret=interpret, col_offset=pad1
    )

    prev = _ring_halo(y1, 1, axis_name, lanes, p)
    shifted = jnp.concatenate([prev, y1[:-1, :]], axis=0)
    i, q = y1[:, :lanes], y1[:, lanes:]
    si, sq = shifted[:, :lanes], shifted[:, lanes:]
    re = i * si + q * sq
    im = q * si - i * sq
    yq = jnp.float32(cfg.quad_gain) * atan2_dispatch(im, re, taps.use_atan_lut)  # (B, lanes)

    n2 = b // d
    pad2 = (-(len(taps.t2) - 1)) % 128
    hist2 = _ring_halo(yq, len(taps.t2) - 1, axis_name, lanes, p)
    work2 = jnp.concatenate(
        [jnp.zeros((pad2, lanes), jnp.float32), hist2, yq], axis=0
    )
    y2 = conv1d_banded_tm(
        work2, taps.t2[::-1], d, n2, interpret=interpret, col_offset=pad2
    )

    if taps.tdc is not None:
        pad3 = (-(len(taps.tdc) - 1)) % 128
        hist3 = _ring_halo(y2, 4 * cfg.dc_length - 4, axis_name, lanes, p)
        work3 = jnp.concatenate(
            [jnp.zeros((pad3, lanes), jnp.float32), hist3, y2], axis=0
        )
        y2 = conv1d_banded_tm(
            work3, taps.tdc[::-1], 1, n2, interpret=interpret, col_offset=pad3
        )
    return y2  # (n2, lanes)


def _clock_rotation(
    soft, cstate, taps: _PipeTaps, axis_name, n_dev, lanes,
    *, clock_backend, interpret,
):
    """D systolic rounds: round r advances stream (p - r) mod D through
    the local block (index r), then the suffix-carry state ppermutes one
    device right.  All devices busy every round."""
    from sdrmodem_tpu.dsp.clock_recovery import clock_mm_batched_full

    p_clock = taps.config.clock_params()
    n2 = soft.shape[0]
    p = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    outs_rounds, counts_rounds = [], []
    for r in range(n_dev):
        lane = jax.lax.rem(p - jnp.int32(r) + jnp.int32(n_dev), jnp.int32(n_dev))
        my = jax.lax.dynamic_slice(soft, (jnp.int32(0), lane), (n2, 1))
        o, cnt, cstate = clock_mm_batched_full(
            my, cstate,
            omega=p_clock["omega"], gain_omega=p_clock["gain_omega"],
            mu=p_clock["mu"], gain_mu=p_clock["gain_mu"],
            omega_relative_limit=p_clock["omega_relative_limit"],
            backend=clock_backend, interpret=interpret,
        )
        outs_rounds.append(float_to_int8(o[0]))  # (n_chunks, K)
        counts_rounds.append(cnt[0])
        if r + 1 < n_dev:
            cstate = jax.tree.map(
                lambda a: jax.lax.ppermute(a, axis_name, perm), cstate
            )
    return jnp.stack(outs_rounds), jnp.stack(counts_rounds)


def pipeline_schedule_report(n_devices: int, n_samples: int, config: FskDemodConfig):
    """Steps-per-device accounting for ``demod_pipelined`` — the scaling
    evidence obtainable without real multi-chip hardware.

    The schedule is systolic: S = D streams, D time-blocks each, D clock
    rounds with every device advancing exactly one stream per round, so
    device-busy is 100% by construction (no fill/drain bubbles — block 0
    of stream p starts ON device p).  Communication per block-step is the
    per-stage halo tails + the 65-element clock state, which rides ICI
    concurrently with the next round's compute."""
    d = config.decimation
    block = -(-(-(-n_samples // n_devices)) // d) * d
    t1 = len(config.lpf1_taps())
    t2 = len(config.lpf2_taps())
    dc = 4 * config.dc_length - 4 if config.use_dc_block else 0
    lanes = 128
    halo_bytes = 4 * lanes * (2 * (t1 - 1) + 2 * 1 + t2 - 1 + dc)
    state_bytes = 4 * (64 + 4) * n_devices  # suffix + scalars, per round, all devs
    clock_tasks = n_devices * n_devices  # S streams x D blocks
    busy = n_devices * n_devices  # 1 task/device/round x D rounds x D devices
    return dict(
        devices=n_devices,
        rounds=n_devices,
        block_samples=block,
        clock_block_tasks=clock_tasks,
        busy_device_rounds=busy,
        idle_device_rounds=0,
        schedule_efficiency=1.0,
        halo_bytes_per_device=halo_bytes,
        clock_state_bytes_per_round=state_bytes,
    )


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
