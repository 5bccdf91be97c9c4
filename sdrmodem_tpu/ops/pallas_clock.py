"""Pallas TPU kernel: Mueller & Müller clock recovery, channel-vectorised.

The XLA ``lax.scan`` formulation costs ~100 µs per symbol step on the TPU
(per-step loop/gather overhead dominates); this kernel runs the whole
sequential loop on-core with every operand VMEM-resident and all channels
advancing together in the 128 vector lanes.

Per-lane dynamic windowing (each channel reads x[ii_c .. ii_c+7]) has no
native TPU gather, so the kernel uses a masked one-hot extraction over a
sliding subtile:

- per group of UNROLL symbols, an 8-row-aligned subtile of the soft
  stream is read from the (VMEM-resident) input at the slowest active
  lane's position; per symbol, the 8 interpolator taps are placed at each
  lane's local offset with iota==offset masks and the windowed dot
  product becomes a multiply + column reduction on the VPU;
- the subtile is ADAPTIVE: when every active lane fits in a small
  (SUB-row) window — the common case, lanes start each block within
  SUFFIX samples of each other and drift apart at most ~0.1 samples per
  symbol (omega is hard-clipped to ±omega_relative_limit) — the group
  runs on the small window; otherwise a fallback branch runs the same
  code on the full ``tile``-row window, sized by the wrapper from the
  provable worst-case spread.  A lane pair whose positions diverge past
  even that sets the overflow flag (returned to the caller) instead of
  silently corrupting;
- the 129-row MMSE bank is evaluated as 8 degree-7 polynomials in the
  *quantised* mu (mu_q = rint(mu*128)/128), which reproduces the table
  to <6e-7 — the table's own literal precision — so numerics match the
  scan/reference path;
- NaNs are handled explicitly: the C dot product is NaN when ANY of the
  8 window samples is NaN (even under a zero tap), so the data is
  sanitised and the NaN predicate computed from an unweighted window
  mask (reference src/dsp/clock_recovery_mm.c:107-113);
- groups where every lane has exhausted its input are skipped entirely
  (outs is pre-zeroed), so over-provisioned ``num_symbols`` costs ~nothing.

State {omega, mu, last, ii} lives in (1, C) rows; validity masking
matches the scan formulation (a lane freezes once ii > n_valid - 8).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdrmodem_tpu.dsp import taps as taps_mod

LANES = 128
NTAPS = 8
POLY_DEG = 7
# symbols advanced per kernel group: window setup (subtile slide, shifted
# copies) amortizes over the group.  Env-tunable at IMPORT time for
# benchmarking (SDRM_CLOCK_UNROLL); must be a multiple of 8 so k_pad
# stays sublane-aligned.
import os as _os

UNROLL = int(_os.environ.get("SDRM_CLOCK_UNROLL", "8"))
if UNROLL not in (1, 2, 4) and (UNROLL <= 0 or UNROLL % 8 != 0):
    # k_pad must stay sublane-aligned: either UNROLL divides 8 (group
    # count is rounded so k_pad is a multiple of 8) or it is a multiple
    # of 8 — raise explicitly so `python -O` can't strip the check
    raise ValueError(
        f"SDRM_CLOCK_UNROLL={UNROLL}: must divide 8 or be a multiple of 8"
    )


def _groups_for(num_symbols: int) -> tuple[int, int]:
    """(num_groups, k_pad) with k_pad sublane-aligned (multiple of 8)."""
    k_pad = -(-int(num_symbols) // UNROLL) * UNROLL
    k_pad = -(-k_pad // 8) * 8
    return k_pad // UNROLL, k_pad


SUB = 128  # fast-branch subtile rows
SUFFIX = 64  # carried input tail rows (must equal clock_recovery.SUFFIX)


def _shift_max() -> int:
    """Largest window evaluated via hoisted shifted copies (bounded by the
    8x window VMEM cost).  SDRM_CLOCK_SHIFT_MAX=0 forces the one-hot tap
    placement everywhere (A/B hook)."""
    import os

    return int(os.environ.get("SDRM_CLOCK_SHIFT_MAX", "512"))


@functools.lru_cache(maxsize=None)
def bank_poly_coeffs() -> np.ndarray:
    """(POLY_DEG+1, 8) float32: column j = coeffs (highest first) of tap j."""
    banks = taps_mod.mmse_interp_taps()  # (129, 8)
    mu = np.arange(129) / 128.0
    coeffs = np.stack(
        [np.polyfit(mu, banks[:, j], POLY_DEG) for j in range(NTAPS)], axis=1
    )
    return coeffs.astype(np.float32)


def _mm_kernel(
    y_ref,  # (Lp, C) f32
    nvalid_ref,  # (1, C) f32
    state_ref,  # (8, C) f32 rows: omega, mu, last, ii (rest padding)
    poly_ref,  # (8, 8) f32  [POLY_DEG+1=8 coeffs x 8 taps]
    outs_ref,  # (K, C) f32
    counts_ref,  # (8, C) f32 row0 = count, row1 = overflow flag
    state_out_ref,  # (8, C) f32
    carry_ref,  # scratch (8, C) f32 rows: omega, mu, last, ii, count
    *,
    num_groups: int,
    tile: int,
    k_pad: int,
    omega_mid: float,
    omega_lim: float,
    gain_omega: float,
    gain_mu: float,
):
    c = y_ref.shape[1]
    lp = y_ref.shape[0]
    # conservative per-symbol position advance (stride <= omega*(1+lim)+2)
    max_stride = int(np.ceil(omega_mid * 1.02)) + 2
    span_budget = NTAPS + UNROLL * max_stride  # rows a group can consume

    outs_ref[:, :] = jnp.zeros((k_pad, c), jnp.float32)
    carry_ref[0:4, :] = state_ref[0:4, :]
    carry_ref[4:, :] = jnp.zeros((4, c), jnp.float32)
    counts_ref[1, :] = jnp.zeros((c,), jnp.float32)

    def run_group(k0, data, nan_win, off, s_rows, rows):
        """Process UNROLL symbols on a (s_rows, C) window at row offset off.

        On windows up to SHIFT_MAX rows the windowed dot product is
        evaluated as z[r, c] = sum_t taps[t, c] * data[r + t, c] followed
        by a one-hot row pick at r == local: one compare + one
        select-reduce per symbol instead of placing all 8 taps with 8
        compares (the shifted copies of ``data`` are hoisted out and
        shared by the group's 8 symbols).  The NaN predicate rides the
        same reduction as a sentinel folded into z (any NaN in the window
        adds 1e30; soft symbols are O(1)).  Beyond SHIFT_MAX (the rare
        full-buffer overflow fallback) the 8 shifted copies would blow the
        16 MB VMEM budget, so the original 8-compare one-hot placement is
        used instead — correctness over speed on the healing path."""
        omega = carry_ref[0, :]
        mu = carry_ref[1, :]
        last = carry_ref[2, :]
        ii = carry_ref[3, :]
        count = carry_ref[4, :]
        use_shift = s_rows <= _shift_max()
        if use_shift:
            shifted = [data]
            for t in range(1, NTAPS):
                shifted.append(
                    jnp.concatenate(
                        [data[t:, :], jnp.zeros((t, c), jnp.float32)], axis=0
                    )
                )
            sentinel = nan_win * jnp.float32(1e30)
        for j in range(UNROLL):
            local = (ii - off).astype(jnp.int32)

            mu_q = jnp.round(mu * 128.0) * jnp.float32(1.0 / 128.0)
            taps = jnp.broadcast_to(poly_ref[0, :][:, None], (NTAPS, c))
            for i in range(1, POLY_DEG + 1):
                taps = taps * mu_q[None, :] + poly_ref[i, :][:, None]

            if use_shift:
                z = sentinel
                for t in range(NTAPS):
                    z = z + taps[t][None, :] * shifted[t]
                hit0 = rows == local[None, :]
                y = jnp.sum(jnp.where(hit0, z, 0.0), axis=0)
                is_nan = y > jnp.float32(1e15)
            else:
                sel = jnp.zeros((s_rows, c), jnp.float32)
                for t in range(NTAPS):
                    hit = rows == (local + t)[None, :]
                    sel = sel + jnp.where(hit, taps[t][None, :], 0.0)
                hit0 = rows == local[None, :]
                y = jnp.sum(sel * data, axis=0)
                is_nan = jnp.sum(jnp.where(hit0, nan_win, 0.0), axis=0) > 0.0

            valid = ii <= nvalid_ref[0, :] - jnp.float32(NTAPS)
            out = jnp.where(is_nan, jnp.float32(0.0), y)

            sgn_last = jnp.where(last < 0, jnp.float32(-1.0), jnp.float32(1.0))
            sgn_out = jnp.where(out < 0, jnp.float32(-1.0), jnp.float32(1.0))
            mm = sgn_last * out - sgn_out * last
            omega_n = omega + jnp.float32(gain_omega) * mm
            dev = omega_n - jnp.float32(omega_mid)
            clip = jnp.float32(omega_lim)
            omega_n = jnp.float32(omega_mid) + jnp.float32(0.5) * (
                jnp.abs(dev + clip) - jnp.abs(dev - clip)
            )
            mu_n = mu + omega_n + jnp.float32(gain_mu) * mm
            stride_n = jnp.floor(mu_n)
            mu_n = mu_n - stride_n

            new_mu = jnp.where(is_nan, mu, mu_n)
            new_omega = jnp.where(is_nan, omega, omega_n)
            new_last = jnp.where(is_nan, last, out)
            stride = jnp.where(is_nan, jnp.floor(omega), stride_n)

            outs_ref[pl.ds(k0 + j, 1), :] = jnp.where(valid, out, 0.0)[None, :]

            omega = jnp.where(valid, new_omega, omega)
            mu = jnp.where(valid, new_mu, mu)
            last = jnp.where(valid, new_last, last)
            ii = jnp.where(valid, ii + stride, ii)
            count = count + valid.astype(jnp.float32)
        carry_ref[0, :] = omega
        carry_ref[1, :] = mu
        carry_ref[2, :] = last
        carry_ref[3, :] = ii
        carry_ref[4, :] = count

    def nan_precompute(data, s_rows):
        nan_f = jnp.isnan(data).astype(jnp.float32)
        clean = jnp.where(jnp.isnan(data), jnp.float32(0.0), data)
        # nan_win[t] = any NaN in rows [t, t+NTAPS-1]
        nan_win = nan_f
        for j in range(1, NTAPS):
            shifted = jnp.concatenate(
                [nan_f[j:, :], jnp.zeros((j, nan_f.shape[1]), jnp.float32)], axis=0
            )
            nan_win = jnp.maximum(nan_win, shifted)
        return clean, nan_win

    # window-size ladder: per-symbol cost is proportional to the window
    # rows, so pick the smallest static size covering the current lane
    # spread.  The first rung is the lockstep minimum (span_budget + the
    # 8-row offset alignment slack, rounded up to 8 rows): lanes replaying
    # the SAME stream — fan-out clients of one SDR connection, and the
    # throughput bench — keep identical positions and never need more.
    # SUB covers lanes within ~56 rows (clustered lanes), MID absorbs
    # moderate divergence (independent signals whose omegas random-walk
    # apart), tile is the provable bound.
    s_min = -(-(span_budget + 8) // 8) * 8
    sizes = [s for s in (s_min, SUB, 4 * SUB) if s < tile] + [tile]
    sizes = sorted(set(sizes))
    rows_by_size = {
        s: jax.lax.broadcasted_iota(jnp.int32, (s, c), 0) for s in sizes
    }

    def group(o, _):
        ii = carry_ref[3, :]
        active = ii <= nvalid_ref[0, :] - jnp.float32(NTAPS)
        any_active = jnp.max(active.astype(jnp.float32)) > 0.0
        neg = jnp.float32(-1e9)
        pos = jnp.float32(1e9)
        amin = jnp.min(jnp.where(active, ii, pos))
        amax = jnp.max(jnp.where(active, ii, neg))
        # integer 8-aligned window offset: the trailing *8 lets Mosaic
        # statically prove the sublane alignment of the dynamic load
        # (the float floor(amin/8)*8 form fails that proof at >1-vreg
        # lane counts)
        off_i = jnp.clip(amin.astype(jnp.int32) // 8, 0, (lp - tile) // 8) * 8
        off = off_i.astype(jnp.float32)
        span = amax - off + jnp.float32(span_budget)
        k0 = o * UNROLL

        for idx, s in enumerate(sizes):
            fits = span <= jnp.float32(s)
            too_small = (
                span > jnp.float32(sizes[idx - 1]) if idx > 0 else True
            )
            cond = any_active & too_small & (fits if s != tile else True)

            @pl.when(cond)
            def _(s=s):
                data = y_ref[pl.ds(off_i, s), :]
                clean, nan_win = nan_precompute(data, s)
                run_group(k0, clean, nan_win, off, s, rows_by_size[s])

        # a lane past the big window would read garbage — flag it
        overflow = (span > jnp.float32(tile)).astype(jnp.float32)
        counts_ref[1, :] = jnp.maximum(
            counts_ref[1, :], jnp.broadcast_to(overflow[None], (c,))
        )
        return 0

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(num_groups), group, 0)

    counts_ref[0, :] = carry_ref[4, :]
    counts_ref[2:, :] = jnp.zeros((6, c), jnp.float32)
    state_out_ref[0:4, :] = carry_ref[0:4, :]
    state_out_ref[4:, :] = jnp.zeros((4, c), jnp.float32)


def _span_budget(omega_mid: float) -> int:
    """Rows one UNROLL group can consume past the slowest lane's position."""
    max_stride = int(np.ceil(omega_mid * 1.02)) + 2
    return NTAPS + UNROLL * max_stride


def required_tile(
    num_symbols: int,
    omega_mid: float,
    omega_relative_limit: float,
    suffix_rows: int = SUFFIX,
) -> int:
    """Worst-case window: lanes start a block within ``suffix_rows``
    samples of each other (the full-block suffix hand-off; sized from
    omega by clock_recovery.suffix_cap_for) and their positions diverge
    at most 2*omega_mid*omega_relative_limit samples per symbol (each
    lane's omega is hard-clipped to the ±limit rails) plus bounded
    per-symbol jitter from the mu update and floor() quantisation
    (non-cumulative, covered by the +0.15/symbol margin and the +16
    constant headroom).  Add the group's own consumption budget."""
    drift = 2.0 * omega_mid * omega_relative_limit + 0.15
    spread = float(suffix_rows) + drift * num_symbols + 16.0
    need = int(np.ceil((spread + _span_budget(omega_mid)) / 128.0)) * 128
    return max(need, 2 * SUB)


def full_tile(work_len: int, omega_mid: float) -> int:
    """The provably sufficient window: covers the ENTIRE work buffer, so the
    sliding-window offset clips to 0 and every lane position is in view no
    matter how far lanes diverge.  Used as the overflow fallback."""
    return int(np.ceil((work_len + _span_budget(omega_mid) + 8) / 128.0)) * 128


def _mm_chunked_kernel(
    x_ref,  # (chunk, C) f32 — this grid step's decimated soft input
    suffix_ref,  # (SUFFIX, C) f32 — initial carried suffix (used at g==0)
    state_ref,  # (8, C) f32 rows: omega, mu, last, resid (from ClockFullState)
    poly_ref,  # (8, 8) f32 Farrow bank coefficients
    outs_ref,  # (k_pad, C) f32 — this chunk's output block
    counts_ref,  # (8, C) f32 — rows: 0=count, 1=overflow flag (this chunk)
    state_out_ref,  # (8, C) f32 rows: omega, mu, last, resid (final chunk wins)
    work_ref,  # scratch (LP, C) f32 — [suffix | chunk | zero pad]
    carry_ref,  # scratch (8, C) f32 rows: omega, mu, last, ii, count
    *,
    chunk: int,
    sfx: int,
    n_total: int,
    num_groups: int,
    tile: int,
    k_pad: int,
    omega_mid: float,
    omega_lim: float,
    gain_omega: float,
    gain_mu: float,
):
    """Whole-block M&M: ONE pallas call, chunks as sequential grid steps.

    The per-block state hand-off of the reference C loop
    (src/dsp/clock_recovery_mm.c:119-135) happens entirely on-core: the
    clock state {omega, mu, last, ii} and the SUFFIX-row input tail
    persist in VMEM scratch from one grid step to the next (the TPU
    grid is sequential), so an N-sample block costs one kernel launch
    and zero host/XLA-level chunk assembly — the predecessor formulation
    (one pallas_call per 4096-sample chunk plus concat/cond glue) spent
    more time entering/leaving kernels than inside them.

    The window ladder matches ``_mm_kernel`` with one addition: the last
    rung is the WHOLE work buffer, which is provably sufficient at any
    lane spread, so the out-of-band "re-run this chunk on full_tile"
    healing branch disappears — escalation is just another rung, and the
    overflow flag (span past the drift-bound tile) remains purely an
    observability counter."""
    c = x_ref.shape[1]
    lp = work_ref.shape[0]
    g = pl.program_id(0)
    max_stride = int(np.ceil(omega_mid * 1.02)) + 2
    span_budget = NTAPS + UNROLL * max_stride

    @pl.when(g == 0)
    def _():
        work_ref[0:sfx, :] = suffix_ref[:, :]
        carry_ref[0:3, :] = state_ref[0:3, :]
        carry_ref[3, :] = jnp.float32(sfx) - state_ref[3, :]  # ii = sfx-resid
        carry_ref[4:, :] = jnp.zeros((4, c), jnp.float32)
        # zero tail padding once; rows past sfx+chunk are never written
        work_ref[sfx + chunk :, :] = jnp.zeros((lp - sfx - chunk, c), jnp.float32)

    work_ref[sfx : sfx + chunk, :] = x_ref[:, :]
    # valid rows this chunk (the final chunk of a ragged block is shorter)
    wv = jnp.float32(sfx) + jnp.minimum(
        jnp.float32(chunk), jnp.float32(n_total) - g.astype(jnp.float32) * chunk
    )
    outs_ref[:, :] = jnp.zeros((k_pad, c), jnp.float32)
    counts_ref[1, :] = jnp.zeros((c,), jnp.float32)
    carry_ref[4, :] = jnp.zeros((c,), jnp.float32)  # per-chunk count

    def run_group(k0, data, nan_win, off, s_rows, rows):
        """Identical symbol math to ``_mm_kernel.run_group`` (shifted-FMA
        form under SHIFT_MAX, one-hot beyond)."""
        omega = carry_ref[0, :]
        mu = carry_ref[1, :]
        last = carry_ref[2, :]
        ii = carry_ref[3, :]
        count = carry_ref[4, :]
        use_shift = s_rows <= _shift_max()
        if use_shift:
            shifted = [data]
            for t in range(1, NTAPS):
                shifted.append(
                    jnp.concatenate(
                        [data[t:, :], jnp.zeros((t, c), jnp.float32)], axis=0
                    )
                )
            sentinel = nan_win * jnp.float32(1e30)
        for j in range(UNROLL):
            local = (ii - off).astype(jnp.int32)

            mu_q = jnp.round(mu * 128.0) * jnp.float32(1.0 / 128.0)
            taps = jnp.broadcast_to(poly_ref[0, :][:, None], (NTAPS, c))
            for i in range(1, POLY_DEG + 1):
                taps = taps * mu_q[None, :] + poly_ref[i, :][:, None]

            if use_shift:
                z = sentinel
                for t in range(NTAPS):
                    z = z + taps[t][None, :] * shifted[t]
                hit0 = rows == local[None, :]
                y = jnp.sum(jnp.where(hit0, z, 0.0), axis=0)
                is_nan = y > jnp.float32(1e15)
            else:
                sel = jnp.zeros((s_rows, c), jnp.float32)
                for t in range(NTAPS):
                    hit = rows == (local + t)[None, :]
                    sel = sel + jnp.where(hit, taps[t][None, :], 0.0)
                hit0 = rows == local[None, :]
                y = jnp.sum(sel * data, axis=0)
                is_nan = jnp.sum(jnp.where(hit0, nan_win, 0.0), axis=0) > 0.0

            valid = ii <= wv - jnp.float32(NTAPS)
            out = jnp.where(is_nan, jnp.float32(0.0), y)

            sgn_last = jnp.where(last < 0, jnp.float32(-1.0), jnp.float32(1.0))
            sgn_out = jnp.where(out < 0, jnp.float32(-1.0), jnp.float32(1.0))
            mm = sgn_last * out - sgn_out * last
            omega_n = omega + jnp.float32(gain_omega) * mm
            dev = omega_n - jnp.float32(omega_mid)
            clip = jnp.float32(omega_lim)
            omega_n = jnp.float32(omega_mid) + jnp.float32(0.5) * (
                jnp.abs(dev + clip) - jnp.abs(dev - clip)
            )
            mu_n = mu + omega_n + jnp.float32(gain_mu) * mm
            stride_n = jnp.floor(mu_n)
            mu_n = mu_n - stride_n

            new_mu = jnp.where(is_nan, mu, mu_n)
            new_omega = jnp.where(is_nan, omega, omega_n)
            new_last = jnp.where(is_nan, last, out)
            stride = jnp.where(is_nan, jnp.floor(omega), stride_n)

            outs_ref[pl.ds(k0 + j, 1), :] = jnp.where(valid, out, 0.0)[None, :]

            omega = jnp.where(valid, new_omega, omega)
            mu = jnp.where(valid, new_mu, mu)
            last = jnp.where(valid, new_last, last)
            ii = jnp.where(valid, ii + stride, ii)
            count = count + valid.astype(jnp.float32)
        carry_ref[0, :] = omega
        carry_ref[1, :] = mu
        carry_ref[2, :] = last
        carry_ref[3, :] = ii
        carry_ref[4, :] = count

    def nan_precompute(data, s_rows):
        nan_f = jnp.isnan(data).astype(jnp.float32)
        clean = jnp.where(jnp.isnan(data), jnp.float32(0.0), data)
        # window-or over NTAPS rows in log2 steps (shifts by 1, 2, 4)
        nan_win = nan_f
        for jshift in (1, 2, 4):
            shifted = jnp.concatenate(
                [nan_win[jshift:, :], jnp.zeros((jshift, nan_win.shape[1]), jnp.float32)],
                axis=0,
            )
            nan_win = jnp.maximum(nan_win, shifted)
        return clean, nan_win

    s_min = -(-(span_budget + 8) // 8) * 8
    s_full = lp  # whole buffer: provably sufficient at any spread
    sizes = sorted(set([s for s in (s_min, SUB, 4 * SUB, tile) if s < s_full] + [s_full]))
    rows_by_size = {s: jax.lax.broadcasted_iota(jnp.int32, (s, c), 0) for s in sizes}

    def group(o, _):
        ii = carry_ref[3, :]
        active = ii <= wv - jnp.float32(NTAPS)
        any_active = jnp.max(active.astype(jnp.float32)) > 0.0
        neg = jnp.float32(-1e9)
        pos = jnp.float32(1e9)
        amin = jnp.min(jnp.where(active, ii, pos))
        amax = jnp.max(jnp.where(active, ii, neg))
        k0 = o * UNROLL

        # integer 8-aligned window offsets (clip in units of 8 rows, then
        # *8: Mosaic statically proves the dynamic load's sublane
        # alignment from the trailing multiply — the float floor(amin/8)*8
        # form fails that proof at >1-vreg lane counts)
        amin_i = amin.astype(jnp.int32) // 8

        def aligned_off(s):
            oi = jnp.clip(amin_i, 0, (lp - s) // 8) * 8
            return oi, oi.astype(jnp.float32)

        for idx, s in enumerate(sizes):
            off_i, off = aligned_off(s)
            span = amax - off + jnp.float32(span_budget)
            fits = span <= jnp.float32(s)
            if idx > 0:
                s_prev = sizes[idx - 1]
                _, off_prev = aligned_off(s_prev)
                too_small = (amax - off_prev + jnp.float32(span_budget)) > jnp.float32(
                    s_prev
                )
            else:
                too_small = True
            cond = any_active & too_small & (fits if s != s_full else True)

            @pl.when(cond)
            def _(s=s, off=off, off_i=off_i):
                data = work_ref[pl.ds(off_i, s), :]
                clean, nan_win = nan_precompute(data, s)
                run_group(k0, clean, nan_win, off, s, rows_by_size[s])

        # observability: lane spread past the drift-bound tile (the ladder
        # still covers it via the full-buffer rung — output stays correct)
        off_t = aligned_off(tile)[1]
        overflow = ((amax - off_t + jnp.float32(span_budget)) > jnp.float32(tile)).astype(
            jnp.float32
        )
        counts_ref[1, :] = jnp.maximum(
            counts_ref[1, :], jnp.broadcast_to(overflow[None], (c,))
        )
        return 0

    jax.lax.fori_loop(jnp.int32(0), jnp.int32(num_groups), group, 0)

    counts_ref[0, :] = carry_ref[4, :]
    counts_ref[2:, :] = jnp.zeros((6, c), jnp.float32)

    # inter-chunk hand-off: rebase ii against the carried suffix and pull
    # the last SUFFIX valid rows to the front of the work buffer
    ii = carry_ref[3, :]
    # negative resid = overshoot skip into the next chunk (exact
    # continuation; see clock_mm_stream's block-size-invariance note)
    resid = jnp.minimum(wv - ii, jnp.float32(sfx - 1))
    carry_ref[3, :] = jnp.float32(sfx) - resid
    state_out_ref[0:3, :] = carry_ref[0:3, :]
    state_out_ref[3, :] = resid
    state_out_ref[4:, :] = jnp.zeros((4, c), jnp.float32)
    # 8-aligned for Mosaic's static alignment proof: wv = sfx + chunk on
    # every chunk that HAS a successor (both multiples of 8), so the
    # align-down only alters the final chunk's tail — which no grid step
    # reads (the host-side wrapper recomputes the next block's suffix)
    tail_start = ((wv.astype(jnp.int32) - sfx) // 8) * 8
    work_ref[0:sfx, :] = work_ref[pl.ds(tail_start, sfx), :]


def clock_mm_chunked_tpu(
    x_tm: jnp.ndarray,  # (N, C) float32 time-major; C pads to a 128 multiple
    suffix: jnp.ndarray,  # (SUFFIX, C) float32 carried input tail
    omega: jnp.ndarray,  # (C,)
    mu: jnp.ndarray,  # (C,)
    last: jnp.ndarray,  # (C,)
    resid: jnp.ndarray,  # (C,) unconsumed suffix rows
    *,
    chunk: int,
    omega_mid: float,
    omega_relative_limit: float,
    gain_omega: float,
    gain_mu: float,
    num_symbols: int,
    tile: int | None = None,
    interpret: bool = False,
):
    """Whole-block chunked M&M in one pallas call (see _mm_chunked_kernel).

    Returns (outs (n_chunks, k_pad, C), counts (n_chunks, C),
    overflow (n_chunks, C), final {omega, mu, last, resid}).
    ``tile`` overrides the drift-bound window rung (test hook: a small
    tile makes the overflow flag trip while the full-buffer rung keeps
    the output correct).
    """
    sfx_rows = int(suffix.shape[0])
    assert sfx_rows % 8 == 0, "suffix rows must be a multiple of 8"
    assert chunk % 8 == 0, "chunk must be sublane-aligned (multiple of 8)"
    # chunk < suffix would make the suffix hand-off an overlapping
    # in-place row copy (tail_start = chunk < suffix) and silently
    # corrupt the carried suffix
    assert chunk >= sfx_rows, f"chunk ({chunk}) must be >= suffix ({sfx_rows})"
    n, ch = x_tm.shape
    # lane-pad to a vreg-width multiple: the kernel body is parametric in
    # its lane count, and every per-op cost scales with ceil(C/128) vregs
    # while the sequential symbol chain stays ONE dependency chain — more
    # lanes amortize the latency-bound M&M walk across more channels
    cp = -(-ch // LANES) * LANES
    n_chunks = max(1, -(-n // chunk))
    n_pad = n_chunks * chunk
    num_groups, k_pad = _groups_for(num_symbols)
    if tile is None:
        tile = required_tile(num_symbols, omega_mid, omega_relative_limit, sfx_rows)
    max_stride = int(np.ceil(omega_mid * 1.02)) + 2
    span_budget = NTAPS + UNROLL * max_stride
    lp = -(-(sfx_rows + chunk + span_budget + 8) // 128) * 128

    yt = jnp.zeros((n_pad, cp), jnp.float32)
    yt = jax.lax.dynamic_update_slice(yt, x_tm.astype(jnp.float32), (0, 0))
    sfx = jnp.zeros((sfx_rows, cp), jnp.float32)
    sfx = jax.lax.dynamic_update_slice(sfx, suffix.astype(jnp.float32), (0, 0))

    state = jnp.zeros((8, cp), jnp.float32)
    for i, v in enumerate((omega, mu, last, resid.astype(jnp.float32))):
        state = jax.lax.dynamic_update_slice(
            state, v.astype(jnp.float32)[None, :], (i, 0)
        )
    poly = jnp.asarray(bank_poly_coeffs())

    lim = float(np.float32(omega_mid) * np.float32(omega_relative_limit))
    with jax.enable_x64(False):
        outs, counts, state_out = pl.pallas_call(
            functools.partial(
                _mm_chunked_kernel,
                chunk=int(chunk),
                sfx=sfx_rows,
                n_total=int(n),
                num_groups=num_groups,
                tile=tile,
                k_pad=k_pad,
                omega_mid=float(np.float32(omega_mid)),
                omega_lim=lim,
                gain_omega=float(np.float32(gain_omega)),
                gain_mu=float(np.float32(gain_mu)),
            ),
            grid=(n_chunks,),
            out_shape=(
                jax.ShapeDtypeStruct((n_chunks * k_pad, cp), jnp.float32),
                jax.ShapeDtypeStruct((n_chunks * 8, cp), jnp.float32),
                jax.ShapeDtypeStruct((8, cp), jnp.float32),
            ),
            in_specs=[
                pl.BlockSpec((chunk, cp), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (sfx_rows, cp), lambda g: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((8, cp), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 8), lambda g: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((k_pad, cp), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, cp), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((8, cp), lambda g: (0, 0), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((lp, cp), jnp.float32),
                pltpu.VMEM((8, cp), jnp.float32),
            ],
            interpret=interpret,
        )(yt, sfx, state, poly)

    outs3 = outs.reshape(n_chunks, k_pad, cp)[:, :, :ch]
    cc = counts.reshape(n_chunks, 8, cp)
    final = dict(
        omega=state_out[0, :ch],
        mu=state_out[1, :ch],
        last=state_out[2, :ch],
        resid=state_out[3, :ch].astype(jnp.int32),
    )
    return outs3, cc[:, 0, :ch], cc[:, 1, :ch], final


def clock_mm_tpu(
    y: jnp.ndarray,  # (C, L) float32 soft stream (history already prepended)
    n_valid: jnp.ndarray,  # (C,) int32
    omega: jnp.ndarray,  # (C,)
    mu: jnp.ndarray,  # (C,)
    last: jnp.ndarray,  # (C,)
    ii0: jnp.ndarray | None = None,  # (C,) i32 initial read pointer (default 0)
    *,
    omega_mid: float,
    omega_relative_limit: float,
    gain_omega: float,
    gain_mu: float,
    num_symbols: int,
    tile: int | None = None,
    time_major: bool = False,
    interpret: bool = False,
):
    """Returns (outs (C, K), counts (C,) i32, final {omega, mu, last, ii (C,)}).

    Semantics match ``clock_mm_stream``'s scan (same masking and NaN
    branch); the interpolator uses the Farrow-polynomial bank (max tap
    error 6e-7 vs the table).  K is ``num_symbols`` rounded up to the
    unroll factor (a frozen lane simply stops producing).  The second
    counts row (exposed via final state ``overflow``) is 1.0 when lane
    positions spread past the fallback window — inputs violating the
    drift bound of ``required_tile``.
    """
    if time_major:
        length, ch = y.shape
    else:
        ch, length = y.shape
    if ch > LANES:
        raise ValueError("clock_mm_tpu handles up to 128 channels per call")
    num_groups, k_pad = _groups_for(num_symbols)
    if tile is None:
        tile = required_tile(num_symbols, omega_mid, omega_relative_limit)

    # headroom: window reads reach up to ceil(max ii/8)*8 + tile
    lp = -(-length // 8) * 8 + tile + 8
    yt = jnp.zeros((lp, LANES), jnp.float32)
    yt = jax.lax.dynamic_update_slice(
        yt, (y if time_major else y.T).astype(jnp.float32), (0, 0)
    )

    nv = jnp.zeros((1, LANES), jnp.float32)
    nv = jax.lax.dynamic_update_slice(nv, n_valid.astype(jnp.float32)[None, :], (0, 0))

    state = jnp.zeros((8, LANES), jnp.float32)
    rows = (omega, mu, last) if ii0 is None else (omega, mu, last, ii0)
    for i, v in enumerate(rows):
        state = jax.lax.dynamic_update_slice(
            state, v.astype(jnp.float32)[None, :], (i, 0)
        )

    poly = jnp.asarray(bank_poly_coeffs())  # (8, 8)

    lim = float(np.float32(omega_mid) * np.float32(omega_relative_limit))
    # strict 32-bit tracing: the package enables x64 globally (orbital
    # layer), but Mosaic only vectorises <=32-bit lanes
    with jax.enable_x64(False):
        outs, counts, state_out = pl.pallas_call(
            functools.partial(
                _mm_kernel,
                num_groups=num_groups,
                tile=tile,
                k_pad=k_pad,
                omega_mid=float(np.float32(omega_mid)),
                omega_lim=lim,
                gain_omega=float(np.float32(gain_omega)),
                gain_mu=float(np.float32(gain_mu)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((k_pad, LANES), jnp.float32),
                jax.ShapeDtypeStruct((8, LANES), jnp.float32),
                jax.ShapeDtypeStruct((8, LANES), jnp.float32),
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((8, LANES), jnp.float32)],
            interpret=interpret,
        )(yt, nv, state, poly)

    final = dict(
        omega=state_out[0, :ch],
        mu=state_out[1, :ch],
        last=state_out[2, :ch],
        ii=state_out[3, :ch].astype(jnp.int32),
        overflow=counts[1, :ch],
    )
    return outs[:, :ch].T, counts[0, :ch].astype(jnp.int32), final
