"""Pallas TPU kernel: batched FIR over a channel-lane layout.

The hot loop of the whole framework (reference src/dsp/fir_filter.c:93-144,
volk dot products).  TPU-native formulation:

- data layout (N, C): time along sublanes, channels along the 128 lanes —
  the channel batch is what the reference expresses as one thread per
  client;
- non-decimating FIR: out[k, c] = sum_j rev_taps[j] * x[k + j, c].  Each
  tap contributes a shifted slice scaled by a scalar — T fused
  multiply-adds over a (TILE_K, C) output block on the VPU with all
  operands VMEM-resident;
- decimation by d is phase decomposition: split the padded stream into d
  interleaved phase streams and sum d short non-decimating FIRs — work
  is identical, every kernel stays stride-1 (TPU-friendly);
- overlap between output tiles is materialised by framing (halo
  duplication ~T/TILE_K, a few % for the tiles used here).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
TILE_R = 128  # default output rows per grid step of the banded-matmul kernel


def _tile_r() -> int:
    """Output-tile height (SDRM_FIR_TILE_R, default 128, multiple of 128).

    Bigger tiles cut both the grid-step count and the k_shift re-read
    factor (reads scale with ceil((tile*stride + taps-1)/tile)): for the
    637-tap DC blocker 256-row tiles read the stream 4x instead of 6x."""
    import os

    raw = os.environ.get("SDRM_FIR_TILE_R", str(TILE_R))
    val = int(raw)
    if val < 128 or val % 128 != 0:
        raise ValueError(
            f"SDRM_FIR_TILE_R={raw!r}: must be a positive multiple of 128"
        )
    return val


def _default_precision():
    """FIR matmul precision (SDRM_FIR_PRECISION=bf16x3|highest|default).

    bf16x3 (default): 3-pass hi/lo bfloat16 split-accumulate — ~16
    effective mantissa bits, half the MXU passes of HIGHEST (6), and
    still ≤1 LSB on the golden fixtures (the bf16x3 residual sits ~-95 dB
    below the signal vs the ±2 LSB bound's ~-42 dB).  highest:
    float32-exact multi-pass, the deterministic-parity reference point.
    default: single bf16 pass — fast but puts a ~-34 dB error floor on
    the signal (measured 1.9% RMS front-end error on v5e, enough to slip
    the downstream M&M symbol clock off the goldens); kept only as a
    measurement point.  (Mosaic does not lower Precision.HIGH, hence the
    hand-rolled split.)"""
    import os

    name = os.environ.get("SDRM_FIR_PRECISION", "bf16x3").lower()
    if name == "bf16x2":
        # 2-pass: Wh@Xh + Wh@Xl — the data keeps ~16 mantissa bits but the
        # taps are quantised to bfloat16 (~2^-9 relative tap error → ~-48 dB
        # on the filtered signal).  Inside the reference's ±2 LSB (-42 dB)
        # acceptance bound on the fixtures, but with less margin than
        # bf16x3; opt-in measurement/throughput mode, not the default.
        return "bf16x2"
    return {
        "default": jax.lax.Precision.DEFAULT,
        "highest": jax.lax.Precision.HIGHEST,
    }.get(name, "bf16x3")


def _split_bf16(v: jnp.ndarray):
    """v ≈ hi + lo with both parts bfloat16 (top 8 + next 8 mantissa bits)."""
    hi = v.astype(jnp.bfloat16)
    lo = (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def banded_tile_dot(w, get_block, k_shift: int, precision):
    """One 128-row output tile: sum_s W[:, s*128:(s+1)*128] @ get_block(s).

    ``get_block(s)`` must return the s-th CONSECUTIVE (128, lanes) input
    block.  The f32 accumulation order (per-128-input-block, bf16x3 term
    order) is exactly ``_banded_tm_kernel``'s, so callers assembling the
    same absolute input blocks get bit-identical outputs to
    ``conv1d_banded_tm`` — the property the fused front-end kernel
    (ops/pallas_front.py) relies on."""
    b0 = get_block(0)
    acc = jnp.zeros((TILE_R, b0.shape[-1]), jnp.float32)
    if precision in ("bf16x3", "bf16x2"):
        w_hi, w_lo = _split_bf16(w)
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        for s in range(k_shift):
            x_hi, x_lo = _split_bf16(b0 if s == 0 else get_block(s))
            wh = w_hi[:, s * TILE_R : (s + 1) * TILE_R]
            acc = acc + dot(wh, x_hi) + dot(wh, x_lo)
            if precision == "bf16x3":
                acc = acc + dot(w_lo[:, s * TILE_R : (s + 1) * TILE_R], x_hi)
        return acc
    for s in range(k_shift):
        acc = acc + jnp.dot(
            w[:, s * TILE_R : (s + 1) * TILE_R],
            b0 if s == 0 else get_block(s),
            preferred_element_type=jnp.float32,
            precision=precision,
        )
    return acc


def _banded_tm_kernel(*refs, k_shift: int, precision, tile_r: int = TILE_R):
    """out = sum_s W[:, s*128:(s+1)*128] @ x_blocks[s] — one output tile.

    ``precision`` matters: the MXU multiplies in bfloat16 passes, and the
    default single pass (~8 mantissa bits) puts a ~-34 dB error floor on
    the filtered signal — enough to slip the downstream M&M symbol clock
    off the golden fixtures.  Two f32-grade options: HIGHEST (XLA's
    6-pass exact product) and the hand-rolled "bf16x3" split-accumulate
    (Wh@Xh + Wh@Xl + Wl@Xh with f32 MXU accumulation; the dropped Wl@Xl
    term is ~2^-18 relative).  bf16x3 halves the MXU passes and is the
    production default."""
    w_ref = refs[k_shift]
    out_ref = refs[k_shift + 1]
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    # always accumulate in 128-row sub-blocks of the ABSOLUTE input row
    # index (sub = tile_r // 128 per block): the per-output-element f32
    # addition sequence is then invariant in tile_r, so any
    # SDRM_FIR_TILE_R produces bit-identical output — larger tiles change
    # only the grid/DMA granularity, not the numerics the chaotic M&M
    # clock downstream amplifies
    sub = tile_r // TILE_R
    if precision in ("bf16x3", "bf16x2"):
        w_hi, w_lo = _split_bf16(w_ref[:, :])
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        for s in range(k_shift):
            x_hi, x_lo = _split_bf16(refs[s][:, :])
            for i in range(sub):
                c0 = s * tile_r + i * TILE_R
                wh = w_hi[:, c0 : c0 + TILE_R]
                xh = x_hi[i * TILE_R : (i + 1) * TILE_R, :]
                xl = x_lo[i * TILE_R : (i + 1) * TILE_R, :]
                acc = acc + dot(wh, xh) + dot(wh, xl)
                if precision == "bf16x3":
                    wl = w_lo[:, c0 : c0 + TILE_R]
                    acc = acc + dot(wl, xh)
        out_ref[:, :] = acc
        return
    for s in range(k_shift):
        for i in range(sub):
            c0 = s * tile_r + i * TILE_R
            acc = acc + jnp.dot(
                w_ref[:, c0 : c0 + TILE_R],
                refs[s][i * TILE_R : (i + 1) * TILE_R, :],
                preferred_element_type=jnp.float32,
                precision=precision,
            )
    out_ref[:, :] = acc


@functools.lru_cache(maxsize=None)
def _band_matrix(
    rev_taps: tuple, stride: int, k_shift: int, tile_r: int = TILE_R, offset: int = 0
) -> np.ndarray:
    """(tile_r, k_shift*tile_r) with W[o, o*stride + offset + j] = rev[j]."""
    rev = np.asarray(rev_taps, np.float32)
    w = np.zeros((tile_r, k_shift * tile_r), np.float32)
    for o in range(tile_r):
        c0 = o * stride + offset
        w[o, c0 : c0 + len(rev)] = rev
    return w


def conv1d_banded_tm(
    x_tm: jnp.ndarray,  # (R, L) float32 time-major; caller prepends history
    rev_taps: np.ndarray,  # (T,) float32, already reversed
    stride: int,
    n_out: int,
    *,
    interpret: bool = False,
    precision=None,
    col_offset: int = 0,
) -> jnp.ndarray:
    """Strided banded-matmul FIR, time-major, MXU formulation without im2col.

    out[k, l] = sum_j x_tm[k*stride + col_offset + j, l] * rev_taps[j],
    k < n_out.  ``col_offset`` (in [0, 128)) shifts the band: callers
    prepend ``col_offset`` pad rows to x_tm so that the 128-row
    accumulation-grouping boundaries land on x_tm row 0 mod 128 — the
    stream-aligned convention shared with the fused front-end kernel,
    which makes the two paths bit-identical.

    Each 128-row output tile is k_shift chained (128,128) MXU matmuls
    against CONSECUTIVE 128-row input blocks — the same HBM array is
    passed k_shift times with block index maps offset by s, so the
    overlap between neighbouring output tiles costs no duplicated
    memory (the im2col framing of ``conv1d_banded`` writes + reads an
    extra (T+tile)/tile copy of the stream, which dominates its runtime).
    Decimation folds into the band's slope (W[o, o*stride + j]), so no
    phase splitting or re-layout either.
    """
    rev = np.asarray(rev_taps, np.float32)
    t = len(rev)
    r, l = x_tm.shape
    if l % LANES != 0:
        raise ValueError("lane count must be a multiple of 128 (pad the batch)")
    if not 0 <= col_offset < LANES:
        raise ValueError("col_offset must be in [0, 128)")
    tr = _tile_r()
    k_shift = -(-(tr * stride + col_offset + t - 1) // tr)
    g_tiles = -(-n_out // tr)
    lane_tiles = l // LANES

    rows_need = ((g_tiles - 1) * stride + k_shift) * tr
    if r < rows_need:
        x_tm = jnp.pad(x_tm, ((0, rows_need - r), (0, 0)))
    elif r > rows_need:
        x_tm = x_tm[:rows_need]

    w = jnp.asarray(_band_matrix(tuple(rev.tolist()), stride, k_shift, tr, col_offset))

    in_specs = [
        pl.BlockSpec(
            (tr, LANES),
            functools.partial(lambda g, lt, s: (g * stride + s, lt), s=s),
            memory_space=pltpu.VMEM,
        )
        for s in range(k_shift)
    ]
    in_specs.append(
        pl.BlockSpec(
            (tr, k_shift * tr), lambda g, lt: (0, 0), memory_space=pltpu.VMEM
        )
    )

    if precision is None:
        precision = _default_precision()
    with jax.enable_x64(False):
        out = pl.pallas_call(
            functools.partial(
                _banded_tm_kernel, k_shift=k_shift, precision=precision, tile_r=tr
            ),
            out_shape=jax.ShapeDtypeStruct((g_tiles * tr, l), jnp.float32),
            grid=(g_tiles, lane_tiles),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (tr, LANES), lambda g, lt: (g, lt), memory_space=pltpu.VMEM
            ),
            interpret=interpret,
        )(*([x_tm] * k_shift), w)
    return out[:n_out]


def _fir_kernel(x_ref, taps_ref, out_ref, *, tile_k: int, t: int):
    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for j in range(t):
        acc += taps_ref[0, j, 0] * x_ref[0, pl.ds(j, tile_k), :]
    out_ref[0, :, :] = acc


def _fir_nodecim(
    x_pad: jnp.ndarray,  # (rows, C) float32, already front-padded
    rev_taps: np.ndarray,  # (T,)
    n_out: int,
    tile_k: int,
    interpret: bool,
) -> jnp.ndarray:
    t = len(rev_taps)
    _, c = x_pad.shape
    k_tiles = -(-n_out // tile_k)
    block_rows = tile_k + t - 1

    # frame overlapping windows: frames[i] = x_pad[i*tile_k : i*tile_k + block_rows]
    need = (k_tiles - 1) * tile_k + block_rows
    if x_pad.shape[0] < need:
        x_pad = jnp.pad(x_pad, ((0, need - x_pad.shape[0]), (0, 0)))
    starts = (jnp.arange(k_tiles) * tile_k).astype(jnp.int32)
    frames = jax.vmap(
        lambda s: jax.lax.dynamic_slice(x_pad, (s, jnp.int32(0)), (block_rows, c))
    )(starts)  # (k_tiles, block_rows, C)

    taps_arr = jnp.asarray(np.asarray(rev_taps, np.float32)).reshape(1, t, 1)
    # strict 32-bit tracing (Mosaic requires <=32-bit; x64 is on globally)
    with jax.enable_x64(False):
        out = _call(frames, taps_arr, tile_k, t, k_tiles, block_rows, c, interpret)
    return out.reshape(k_tiles * tile_k, c)[:n_out]


def _call(frames, taps_arr, tile_k, t, k_tiles, block_rows, c, interpret):
    out = pl.pallas_call(
        functools.partial(_fir_kernel, tile_k=tile_k, t=t),
        out_shape=jax.ShapeDtypeStruct((k_tiles, tile_k, c), jnp.float32),
        grid=(k_tiles,),
        in_specs=[
            pl.BlockSpec((1, block_rows, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_k, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(frames, taps_arr)
    return out


def fir_tpu(
    x: jnp.ndarray,  # (N, C) float32, time-major
    taps: np.ndarray,  # (T,) natural order
    decimation: int = 1,
    *,
    tile_k: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched FIR with fresh-filter stream semantics: left-pads T-1 zeros,
    output rows = ceil(N / d).  Returns (ceil(N/d), C) float32.

    Matches ``fir_stream`` (and therefore the reference C) numerically to
    float32 rounding.
    """
    n, c = x.shape
    t = len(taps)
    d = int(decimation)
    rev = np.asarray(taps, np.float32)[::-1]
    n_out = -(-n // d)

    pad_front = t - 1
    rows = pad_front + n
    x_pad = jnp.zeros((rows, c), jnp.float32)
    x_pad = jax.lax.dynamic_update_slice(x_pad, x.astype(jnp.float32), (pad_front, 0))

    if d == 1:
        return _fir_nodecim(x_pad, rev, n_out, tile_k, interpret)

    # polyphase: X'_p[i] = x_pad[i*d + p];  out = sum_p conv(X'_p, rt[p::d])
    rows_r = -(-rows // d) * d
    if rows_r != rows:
        x_pad = jnp.pad(x_pad, ((0, rows_r - rows), (0, 0)))
    phases = x_pad.reshape(rows_r // d, d, c)
    out = None
    for p in range(d):
        rt_p = rev[p::d]
        if len(rt_p) == 0:
            continue
        xp = phases[:, p, :]
        y = _fir_nodecim(xp, rt_p, n_out, tile_k, interpret)
        out = y if out is None else out + y
    return out
