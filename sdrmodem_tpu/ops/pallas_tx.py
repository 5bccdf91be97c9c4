"""Fused GFSK TX Pallas kernel: polyphase Gaussian interpolation + VCO.

The reference TX chain (src/dsp/gfsk_mod.c:102-132 → interp_fir_filter →
frequency_modulator.c:41-59) is NRZ bits → interpolate-by-I Gaussian
pulse FIR → phase-accumulating VCO.  The XLA formulation spends its time
not in FLOPs (the pulse has ~5 taps per phase) but in op-dispatch and
inter-stage traffic: a TX block is tiny, so the chain is latency-bound.

This kernel runs the whole thing as ONE Mosaic program:

- grid walks time tiles of R NRZ rows SEQUENTIALLY; the k-1-row FIR
  history and the VCO phase carry live in VMEM scratch between tiles
  (same pattern as the fused RX front-end, ops/pallas_front.py);
- per interpolation phase i, y_i[n] = sum_m x[n-m] * taps[m*I+i] is k
  shifted FMAs on the VPU (taps baked in as constants);
- the interleaved-sample phase accumulation (the strictly sequential
  reference VCO) becomes: per-row group totals, an inclusive cumsum via
  ONE lower-triangular MXU matmul (precision=HIGHEST, f32-exact
  products), plus the running intra-group partials — phase error is
  pure f32 summation rounding (~1e-5 rad per tile), far inside the
  reference golden tolerance (0.01, test/utils.c:134-140);
- sin/cos evaluate in-kernel (Mosaic lowers them; atan it does not),
  with the phase reduced mod 2pi per row tile first;
- outputs are per-phase (N, L) planes; the caller interleaves with one
  reshape (y[n*I + i] = plane_i[n]).

Layout is time-major with streams along lanes, like everything else.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_TWO_PI = float(2.0 * np.pi)


def _phase_taps(taps: np.ndarray, interpolation: int) -> np.ndarray:
    """(k, I): row m, col i = taps[m*I + i], zero-padded to k*I."""
    taps = np.asarray(taps, np.float32)
    ii = int(interpolation)
    pad = (-len(taps)) % ii
    if pad:
        taps = np.concatenate([taps, np.zeros(pad, np.float32)])
    return taps.reshape(-1, ii)


@functools.lru_cache(maxsize=None)
def _tri(r: int) -> np.ndarray:
    """Lower-triangular ones (inclusive prefix-sum operator)."""
    return np.tril(np.ones((r, r), np.float32))


def _tx_kernel(
    nv_ref,  # (1,) i32 SMEM — valid NRZ rows (ragged zero-padded blocks)
    x_ref,  # (R, L) f32 NRZ rows for this tile
    h_ref,  # (hpad, L) f32 initial history (last k-1 rows meaningful)
    p_ref,  # (8, L) f32 initial phase (row 0)
    tri_ref,  # (R, R) f32 lower-triangular ones
    *out_and_state,  # I out pairs (i, q) + hist_out + phase_out + scratch
    r: int,
    k: int,
    hpad: int,
    interp: int,
    taps2d: tuple,  # ((k) rows of (I) floats)
    sens: float,
    num_tiles: int,
):
    it = iter(out_and_state)
    outs_i = [next(it) for _ in range(interp)]
    outs_q = [next(it) for _ in range(interp)]
    ho_ref = next(it)
    po_ref = next(it)
    wbuf = next(it)  # scratch (hpad + R, L)
    pbuf = next(it)  # scratch (8, L): row 0 = phase carry

    g = pl.program_id(0)

    @pl.when(g == 0)
    def _init():
        wbuf[0:hpad, :] = h_ref[:, :]
        pbuf[:, :] = p_ref[:, :]

    @pl.when(g > 0)
    def _carry():
        wbuf[0:hpad, :] = wbuf[r : r + hpad, :]

    wbuf[hpad : hpad + r, :] = x_ref[:, :]
    w = wbuf[:, :]

    # polyphase FIR: k shifted FMAs per phase (value slices; offsets are
    # static so Mosaic relayouts them once per tile)
    ys = []
    for i in range(interp):
        acc = jnp.zeros((r, w.shape[1]), jnp.float32)
        for m in range(k):
            t = float(taps2d[m][i])
            if t != 0.0:
                lo = hpad - m
                acc = acc + jnp.float32(t) * w[lo : lo + r, :]
        ys.append(acc)

    # VCO: interleaved-order phase prefix.  group_total[n] = sum_i inc_i,
    # P = tril @ group_total is the inclusive row prefix (MXU, f32-exact
    # products), then intra-group partials per phase.  Rows at/after
    # n_valid contribute ZERO phase: the FIR tail of the last real bits
    # bleeds into a ragged block's zero padding, and without the mask it
    # would pollute the carried phase (chunked != whole).
    row = g * r + jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    valid = (row < nv_ref[0]).astype(jnp.float32)
    incs = [jnp.float32(sens) * y * valid for y in ys]
    group_total = incs[0]
    for inc in incs[1:]:
        group_total = group_total + inc
    p_incl = jnp.dot(
        tri_ref[:, :], group_total,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    carry = pbuf[0:1, :]
    base = carry + p_incl - group_total  # exclusive prefix + carried phase
    partial = jnp.zeros_like(group_total)
    two_pi = jnp.float32(_TWO_PI)
    for i in range(interp):
        partial = partial + incs[i]
        ph = base + partial
        ph = ph - two_pi * jnp.round(ph * jnp.float32(1.0 / _TWO_PI))
        outs_i[i][:, :] = jnp.cos(ph)
        outs_q[i][:, :] = jnp.sin(ph)

    # phase carry, reduced mod 2pi (matches freq_mod_pair_fast's bounded-
    # base property: the f32 add never sees a large offset)
    new_carry = carry + p_incl[r - 1 : r, :]
    new_carry = new_carry - two_pi * jnp.floor(new_carry * jnp.float32(1.0 / _TWO_PI))
    pbuf[0:1, :] = new_carry

    @pl.when(g == num_tiles - 1)
    def _export():
        ho_ref[:, :] = wbuf[r : r + hpad, :]
        po_ref[:, :] = pbuf[:, :]


def choose_tile(n: int, target: int = 512) -> int | None:
    import os

    target = int(os.environ.get("SDRM_TX_TILE", str(target)))
    best = None
    rr = 8
    while rr <= n:
        if n % rr == 0 and rr <= max(target, 8):
            best = rr
        rr += 8
    return best


def _tx_folded_kernel(
    nv_ref,  # (1,) i32 SMEM
    x_ref,  # (R, F) folded NRZ: sample c*R + r at [r, c]
    h_ref,  # (hpad, F) per-lane FIR history (previous chunk's tail)
    p_ref,  # (8, 8) f32 [0,0] = carried stream phase
    tri_ref,  # (128, 128) lower-triangular ones (row-prefix operator)
    ut_ref,  # (F, F) STRICTLY-upper-triangular ones (lane-prefix operator)
    *out_and_state,
    r: int,
    k: int,
    hpad: int,
    interp: int,
    taps2d: tuple,
    sens: float,
):
    it = iter(out_and_state)
    outs_i = [next(it) for _ in range(interp)]
    outs_q = [next(it) for _ in range(interp)]
    po_ref = next(it)

    f = x_ref.shape[1]
    w = jnp.concatenate([h_ref[:, :], x_ref[:, :]], axis=0)  # (hpad+R, F)

    ys = []
    for i in range(interp):
        acc = jnp.zeros((r, f), jnp.float32)
        for m in range(k):
            t = float(taps2d[m][i])
            if t != 0.0:
                lo = hpad - m
                acc = acc + jnp.float32(t) * w[lo : lo + r, :]
        ys.append(acc)

    # global sample index of [r, c] is c*R + r: mask padding out of phase
    ridx = jax.lax.broadcasted_iota(jnp.int32, (r, f), 0)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (r, f), 1)
    valid = ((cidx * r + ridx) < nv_ref[0]).astype(jnp.float32)
    incs = [jnp.float32(sens) * y * valid for y in ys]
    group_total = incs[0]
    for inc in incs[1:]:
        group_total = group_total + inc

    # two-level row prefix: 128-row tiles via the triangular MXU operator,
    # carried per lane (static unroll, R/128 tiny matmuls)
    dot_hi = functools.partial(
        jnp.dot, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    two_pi = jnp.float32(_TWO_PI)
    row_carry = jnp.zeros((1, f), jnp.float32)
    p_incl_parts = []
    for t0 in range(0, r, 128):
        s = min(128, r - t0)
        seg = group_total[t0 : t0 + s, :]
        p_seg = dot_hi(tri_ref[:s, :s], seg) + row_carry
        p_incl_parts.append(p_seg)
        row_carry = p_seg[s - 1 : s, :]
    p_incl = jnp.concatenate(p_incl_parts, axis=0) if len(p_incl_parts) > 1 else p_incl_parts[0]

    # lane bases: each lane continues where the previous lane's chunk
    # ended.  Totals are reduced mod 2pi before the strict-upper-triangular
    # lane prefix so the f32 sum never exceeds ~F*2pi (phase only matters
    # mod 2pi).
    tot = row_carry  # (1, F) per-lane totals
    tot_m = tot - two_pi * jnp.floor(tot * jnp.float32(1.0 / _TWO_PI))
    base_lane = dot_hi(tot_m, ut_ref[:, :])  # (1, F) exclusive lane prefix
    phase0 = p_ref[0:1, 0:1]  # (1, 1) — scalar loads/stores don't lower
    base = phase0 + base_lane + (p_incl - group_total)

    partial = jnp.zeros_like(group_total)
    for i in range(interp):
        partial = partial + incs[i]
        ph = base + partial
        ph = ph - two_pi * jnp.round(ph * jnp.float32(1.0 / _TWO_PI))
        outs_i[i][:, :] = jnp.cos(ph)
        outs_q[i][:, :] = jnp.sin(ph)

    end_phase = base_lane[0:1, f - 1 : f] + tot_m[0:1, f - 1 : f] + phase0
    end_phase = end_phase - two_pi * jnp.floor(end_phase * jnp.float32(1.0 / _TWO_PI))
    po_ref[0:1, 0:1] = end_phase


def gfsk_tx_call_folded(
    nrz: jnp.ndarray,  # (N,) f32 single-stream NRZ
    taps: np.ndarray,
    interpolation: int,
    sensitivity: float,
    phase0,  # scalar carried VCO phase
    hist: jnp.ndarray,  # (k-1,) carried NRZ history
    *,
    n_valid=None,
    interpret: bool = False,
):
    """Single-stream fused TX with the stream FOLDED across the 128
    lanes: lane c processes chunk c of the block, per-lane FIR history is
    the previous lane's tail (staged by XLA), and phase continuity across
    lanes is ONE strict-upper-triangular MXU matmul of the per-lane phase
    totals.  The whole TxData runs as a single grid step — the unfolded
    single-lane kernel spends its time in sequential grid-step overhead,
    and the plain XLA chain in op dispatch.

    Returns (i (N*I,), q (N*I,), phase') — outputs trimmed to n_valid*I
    by the caller."""
    f = LANES
    n = nrz.shape[0]
    if n % (8 * f) != 0:
        raise ValueError("folded TX needs N % 1024 == 0 (pad with zeros)")
    r = n // f
    t2d = _phase_taps(taps, interpolation)
    k, ii = t2d.shape
    hpad = -(-max(k - 1, 1) // 8) * 8
    if n_valid is None:
        n_valid = n
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1)

    fold = jnp.transpose(nrz.astype(jnp.float32).reshape(f, r))  # (R, F)
    # per-lane history: lane c gets the last k-1 rows of lane c-1; lane 0
    # gets the carried stream history
    hp = jnp.zeros((hpad, f), jnp.float32)
    if k > 1:
        tails = fold[r - (k - 1) :, :]  # (k-1, F)
        lane_hist = jnp.concatenate(
            [
                jnp.broadcast_to(
                    hist.astype(jnp.float32)[:, None], (k - 1, 1)
                ),
                tails[:, : f - 1],
            ],
            axis=1,
        )
        hp = hp.at[hpad - (k - 1) :, :].set(lane_hist)
    p0 = jnp.zeros((8, 8), jnp.float32).at[0, 0].set(
        jnp.asarray(phase0, jnp.float32)
    )
    tri = jnp.asarray(_tri(128))
    ut = jnp.asarray(np.triu(np.ones((f, f), np.float32), 1))

    const = lambda shape: pl.BlockSpec(shape, lambda: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        const((r, f)),
        const((hpad, f)),
        const((8, 8)),
        const((128, 128)),
        const((f, f)),
    ]
    out_shapes = [jax.ShapeDtypeStruct((r, f), jnp.float32) for _ in range(2 * ii)] + [
        jax.ShapeDtypeStruct((8, 8), jnp.float32)
    ]
    out_specs = [const((r, f)) for _ in range(2 * ii)] + [const((8, 8))]
    kernel = functools.partial(
        _tx_folded_kernel,
        r=r,
        k=k,
        hpad=hpad,
        interp=ii,
        taps2d=tuple(tuple(float(v) for v in row) for row in t2d),
        sens=float(np.float32(sensitivity)),
    )
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            in_specs=in_specs,
            out_specs=out_specs,
            interpret=interpret,
        )(nv, fold, hp, p0, tri, ut)
    planes_i, planes_q, po = outs[:ii], outs[ii : 2 * ii], outs[2 * ii]
    # unfold: output sample (c*R + r)*I + i = plane_i[r, c]
    i_out = jnp.stack(planes_i, axis=2)  # (R, F, I)
    q_out = jnp.stack(planes_q, axis=2)
    i_out = jnp.transpose(i_out, (1, 0, 2)).reshape(n * ii)
    q_out = jnp.transpose(q_out, (1, 0, 2)).reshape(n * ii)
    return i_out, q_out, po[0, 0]


def gfsk_tx_call(
    nrz_tm: jnp.ndarray,  # (N, L) f32 NRZ, time-major, streams on lanes
    taps: np.ndarray,  # (T,) natural order pulse taps
    interpolation: int,
    sensitivity: float,
    phase0: jnp.ndarray,  # (L,) f32 carried VCO phase
    hist: jnp.ndarray,  # (k-1, L) f32 carried NRZ history
    *,
    n_valid=None,  # scalar int32: valid NRZ rows (default N)
    interpret: bool = False,
):
    """Fused TX over one block.  Returns (i_tm, q_tm (N*I, L), phase', hist')."""
    n, l = nrz_tm.shape
    if l % LANES != 0:
        raise ValueError("lane count must be a multiple of 128")
    t2d = _phase_taps(taps, interpolation)
    k, ii = t2d.shape
    r = choose_tile(n)
    if r is None:
        raise ValueError(f"no legal TX tile for N={n}")
    num_tiles = n // r
    hpad = -(-max(k - 1, 1) // 8) * 8  # history rows, sublane-aligned

    hp = jnp.zeros((hpad, l), jnp.float32)
    if k > 1:
        hp = hp.at[hpad - (k - 1) :, :].set(hist.astype(jnp.float32))
    p0 = jnp.zeros((8, l), jnp.float32).at[0, :].set(phase0.astype(jnp.float32))
    tri = jnp.asarray(_tri(r))

    if n_valid is None:
        n_valid = n
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1)

    const = lambda shape: pl.BlockSpec(shape, lambda g: (0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((r, l), lambda g: (g, 0), memory_space=pltpu.VMEM),
        const((hpad, l)),
        const((8, l)),
        const((r, r)),
    ]
    out_shapes = (
        [jax.ShapeDtypeStruct((n, l), jnp.float32) for _ in range(2 * ii)]
        + [jax.ShapeDtypeStruct((hpad, l), jnp.float32),
           jax.ShapeDtypeStruct((8, l), jnp.float32)]
    )
    out_specs = (
        [pl.BlockSpec((r, l), lambda g: (g, 0), memory_space=pltpu.VMEM)
         for _ in range(2 * ii)]
        + [const((hpad, l)), const((8, l))]
    )
    scratch = [
        pltpu.VMEM((hpad + r, l), jnp.float32),
        pltpu.VMEM((8, l), jnp.float32),
    ]
    kernel = functools.partial(
        _tx_kernel,
        r=r,
        k=k,
        hpad=hpad,
        interp=ii,
        taps2d=tuple(tuple(float(v) for v in row) for row in t2d),
        sens=float(np.float32(sensitivity)),
        num_tiles=num_tiles,
    )
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            grid=(num_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
            interpret=interpret,
        )(nv, nrz_tm.astype(jnp.float32), hp, p0, tri)
    planes_i = outs[:ii]
    planes_q = outs[ii : 2 * ii]
    ho, po = outs[2 * ii], outs[2 * ii + 1]
    # interleave: y[n*I + i] = plane_i[n]
    i_tm = jnp.stack(planes_i, axis=1).reshape(n * ii, l)
    q_tm = jnp.stack(planes_q, axis=1).reshape(n * ii, l)
    hist_new = ho[hpad - (k - 1) :, :] if k > 1 else ho[:0, :]
    return i_tm, q_tm, po[0, :], hist_new
