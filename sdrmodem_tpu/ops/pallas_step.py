"""Fully-fused GMSK demod step: front-end + M&M clock in ONE Pallas program.

Round-4 attribution (BASELINE.md): the fused front-end kernel is ~8-17 ms
of the ~30 ms production step and the sequential M&M clock kernel ~18 ms —
two separate Pallas programs with the decimated soft stream (y3) making a
full HBM round trip between them.  The front is MXU-bound (banded-matmul
FIRs), the clock VPU-bound (the sequential symbol walk): run separately
they ADD; issued from one instruction stream they can OVERLAP, because a
TPU core keeps the MXU crunching a matmul while subsequent vector ops
issue.

This kernel runs the whole chain (reference src/dsp/fsk_demod.c:80-110)
as one program with a SOFTWARE-PIPELINED grid:

- grid step g computes the FRONT for time tile g (LPF1 -> quad/atan ->
  LPF2 -> DC, optionally with the device-Doppler mix) while the CLOCK
  advances through chunk g-1 — the front's y3 tiles land in one of two
  VMEM slots (parity double-buffer inside a single (2*lp, C) scratch)
  and are consumed by the clock one step later, never touching HBM;
- the front is decomposed into per-128-row UNITS (LPF1+quad fused per
  unit with a rolling 1-row quad carry, then LPF2 tiles, then DC tiles)
  and the units are dispatched INSIDE the clock's group loop, one unit
  per M&M group iteration: each loop body then contains an independent
  MXU region (the front unit) and a VPU region (the clock group), the
  shape the hardware can overlap (SDRM_STEP_INTERLEAVE=0 runs the same
  units as a straight-line prologue for A/B);
- every FIR evaluates through pallas_fir.banded_tile_dot with the
  stream-aligned 128-row accumulation convention, the quad carry
  matches the per-tile qbuf of ops/pallas_front.py, and the clock's
  symbol math is copied verbatim from ops/pallas_clock.py — so symbols
  are BIT-IDENTICAL to the unfused front+clock pair (chunk-size
  invariance of the clock hand-off is exact, see clock_mm_stream).

Layout: time-major, channels on the 128 lanes.  x is (B, 2*Cp) float32
pairs; outputs are int8-ready soft symbols per chunk plus counts, the
carried front histories, and the clock state (suffix exported from VMEM
— y3 never exists in HBM at all).
"""

from __future__ import annotations

import functools
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdrmodem_tpu.ops.pallas_clock import (
    NTAPS,
    POLY_DEG,
    SUB,
    UNROLL,
    _groups_for,
    _shift_max,
    bank_poly_coeffs,
    required_tile,
)
from sdrmodem_tpu.ops.pallas_fir import (
    LANES,
    _band_matrix,
    _default_precision,
    banded_tile_dot,
)
from sdrmodem_tpu.ops.pallas_front import QROWS, FrontSpec

DEFAULT_CHUNK = 1024  # decimated rows per clock chunk (r = d * chunk)


def step_chunk() -> int:
    """Clock-chunk rows of the fused step (SDRM_STEP_CHUNK).  Smaller than
    the standalone clock kernel's 2048 because the front's work buffers
    share the same 16 MB VMEM budget."""
    return int(os.environ.get("SDRM_STEP_CHUNK", str(DEFAULT_CHUNK)))


def _interleave() -> bool:
    return os.environ.get("SDRM_STEP_INTERLEAVE", "1") != "0"


def _span_budget(omega_mid: float) -> int:
    max_stride = int(np.ceil(omega_mid * 1.02)) + 2
    return NTAPS + UNROLL * max_stride


def _fused_step_kernel(
    *refs,
    r: int,
    d: int,
    cp: int,
    spec: FrontSpec,
    num_tiles: int,
    precision,
    chunk: int,
    sfx: int,
    lp: int,
    num_groups: int,
    tile: int,
    k_pad: int,
    omega_mid: float,
    omega_lim: float,
    gain_omega: float,
    gain_mu: float,
    interleave: bool,
):
    use_dc = spec.tdc is not None
    dop = spec.dop_rows > 0
    h1, h2, h3 = spec.head1, spec.head2, spec.head3
    k1, k2, k3 = spec.k1, spec.k2, spec.k3
    rd = r // d
    span_budget = _span_budget(omega_mid)
    wv = float(sfx + chunk)  # every chunk is full (B % r == 0 enforced)

    it = iter(refs)
    x_ref = next(it)
    h1_ref = next(it)
    qp_ref = next(it)
    h2_ref = next(it)
    h3_ref = next(it) if use_dc else None
    w1_ref = next(it)
    w2_ref = next(it)
    w3_ref = next(it) if use_dc else None
    dop_ref = next(it) if dop else None
    sfx_ref = next(it)
    state_ref = next(it)
    poly_ref = next(it)
    # outputs
    outs_ref = next(it)
    counts_ref = next(it)
    h1o_ref = next(it)
    qpo_ref = next(it)
    h2o_ref = next(it)
    h3o_ref = next(it) if use_dc else None
    state_out_ref = next(it)
    sfx_out_ref = next(it)
    # scratch
    buf1 = next(it)
    buf2 = next(it)
    buf3 = next(it) if use_dc else None
    qbuf = next(it)
    tmp = next(it)
    slots = next(it)  # (2*lp, cp): y3 work slots [suffix | chunk | zero pad]
    carry_ref = next(it)  # (8, cp) clock carry: omega, mu, last, ii, count

    g = pl.program_id(0)
    have_front = g < num_tiles
    have_clock = g > 0
    # parity offsets in lp//8-sublane units so Mosaic can prove the
    # 8-row alignment of every dynamic slot access ((x)*8 form)
    lp8 = lp // 8
    front8 = (g % 2) * lp8  # slot the front writes (tile g)
    clock8 = ((g + 1) % 2) * lp8  # slot the clock reads (chunk g-1)

    # ---- init / inter-tile head carry ------------------------------------
    @pl.when(g == 0)
    def _init():
        buf1[0:h1, :] = h1_ref[:, :]
        qbuf[:, :] = qp_ref[:, :]
        buf2[0:h2, :] = h2_ref[:, :]
        if use_dc:
            buf3[0:h3, :] = h3_ref[:, :]
        slots[0:sfx, :] = sfx_ref[:, :]
        # zero the window-overreach pads of both slots once
        slots[sfx + chunk : lp, :] = jnp.zeros((lp - sfx - chunk, cp), jnp.float32)
        slots[lp + sfx + chunk :, :] = jnp.zeros((lp - sfx - chunk, cp), jnp.float32)
        carry_ref[0:3, :] = state_ref[0:3, :]
        carry_ref[3, :] = jnp.float32(sfx) - state_ref[3, :]  # ii = sfx - resid
        carry_ref[4:, :] = jnp.zeros((4, cp), jnp.float32)

    @pl.when((g > 0) & have_front)
    def _carry():
        tmp[0:h1, :] = buf1[r : r + h1, :]
        buf1[0:h1, :] = tmp[0:h1, :]
        tmp[0:h2, :cp] = buf2[r : r + h2, :]
        buf2[0:h2, :] = tmp[0:h2, :cp]
        if use_dc:
            tmp[0:h3, :cp] = buf3[rd : rd + h3, :]
            buf3[0:h3, :] = tmp[0:h3, :cp]

    # ---- front prologue: (Doppler-mixed) input into buf1 -----------------
    @pl.when(have_front)
    def _fill():
        if dop:
            xt = x_ref[:, :]
            nrow = jnp.float32(0.0) + g.astype(jnp.float32) * r + jax.lax.broadcasted_iota(
                jnp.int32, (r, 1), 0
            ).astype(jnp.float32)
            ph = jnp.zeros((r, cp), jnp.float32)
            for srow in range(spec.dop_rows):
                st = dop_ref[0, srow : srow + 1, :]
                en = dop_ref[1, srow : srow + 1, :]
                adj = dop_ref[2, srow : srow + 1, :]
                ph0 = dop_ref[3, srow : srow + 1, :]
                stp = dop_ref[4, srow : srow + 1, :]
                active = (nrow >= st) & (nrow < en)
                dd = nrow - st
                kq = jnp.floor(dd * jnp.float32(1.0 / 4096.0))
                mq = dd - kq * jnp.float32(4096.0)
                ramp = ph0 + mq * adj + kq * stp
                ph = ph + jnp.where(active, ramp, 0.0)
            cph, sph = jnp.cos(ph), jnp.sin(ph)
            i_in, q_in = xt[:, :cp], xt[:, cp:]
            mixed = jnp.concatenate(
                [i_in * cph - q_in * sph, i_in * sph + q_in * cph], axis=1
            )
            buf1[h1 : h1 + r, :] = mixed
        else:
            buf1[h1 : h1 + r, :] = x_ref[:, :]

    # ---- front units -----------------------------------------------------
    # unit u in [0, rd//128 * d): LPF1 tile u + quad demod tile u
    # unit      [.., +rd//128):   LPF2 output tile m (stride d)
    # unit      [.., +rd//128):   DC output tile m  (if DC)
    n_u1 = r // LANES
    n_u2 = rd // LANES
    n_units = n_u1 + n_u2 + (n_u2 if use_dc else 0)

    from sdrmodem_tpu.dsp.elementwise import atan2_dispatch, kernel_atan_mode

    atan_mode = kernel_atan_mode(spec.atan_mode)

    def unit_lpf1_quad(u):
        w1 = w1_ref[:, :]
        y1 = banded_tile_dot(
            w1,
            lambda s: buf1[pl.ds(((u + s) * (LANES // 8)) * 8, LANES), :],
            k1,
            precision,
        )
        prev = qbuf[0:1, :]
        shifted = jnp.concatenate([prev, y1[: LANES - 1, :]], axis=0)
        i, q = y1[:, :cp], y1[:, cp:]
        si, sq = shifted[:, :cp], shifted[:, cp:]
        re = i * si + q * sq
        im = q * si - i * sq
        yq = jnp.float32(spec.quad_gain) * atan2_dispatch(im, re, atan_mode)
        qbuf[0:1, :] = y1[LANES - 1 : LANES, :]
        buf2[pl.ds((h2 // 8 + u * (LANES // 8)) * 8, LANES), :] = yq

    def unit_lpf2(m):
        w2 = w2_ref[:, :]
        acc = banded_tile_dot(
            w2,
            lambda s: buf2[pl.ds(((m * d + s) * (LANES // 8)) * 8, LANES), :],
            k2,
            precision,
        )
        if use_dc:
            buf3[pl.ds((h3 // 8 + m * (LANES // 8)) * 8, LANES), :] = acc
        else:
            slots[pl.ds((front8 + sfx // 8 + m * (LANES // 8)) * 8, LANES), :] = acc

    def unit_dc(m):
        w3 = w3_ref[:, :]
        acc = banded_tile_dot(
            w3,
            lambda s: buf3[pl.ds(((m + s) * (LANES // 8)) * 8, LANES), :],
            k3,
            precision,
        )
        slots[pl.ds((front8 + sfx // 8 + m * (LANES // 8)) * 8, LANES), :] = acc

    def run_front_unit(u):
        """Dispatch front unit ``u`` (python int or traced int32)."""
        if isinstance(u, int):
            if u < n_u1:
                unit_lpf1_quad(u)
            elif u < n_u1 + n_u2:
                unit_lpf2(u - n_u1)
            else:
                unit_dc(u - n_u1 - n_u2)
            return

        @pl.when(have_front & (u < n_u1))
        def _():
            unit_lpf1_quad(u)

        @pl.when(have_front & (u >= n_u1) & (u < n_u1 + n_u2))
        def _():
            unit_lpf2(u - n_u1)

        if use_dc:

            @pl.when(have_front & (u >= n_u1 + n_u2) & (u < n_units))
            def _():
                unit_dc(u - n_u1 - n_u2)

    # ---- clock (chunk g-1), symbol math verbatim from pallas_clock -------
    def clock_prologue():
        outs_ref[:, :] = jnp.zeros((k_pad, cp), jnp.float32)
        counts_ref[1, :] = jnp.zeros((cp,), jnp.float32)
        carry_ref[4, :] = jnp.zeros((cp,), jnp.float32)  # per-chunk count

    def run_group(k0, data, nan_win, off, s_rows, rows):
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
                        [data[t:, :], jnp.zeros((t, cp), jnp.float32)], axis=0
                    )
                )
            sentinel = nan_win * jnp.float32(1e30)
        for j in range(UNROLL):
            local = (ii - off).astype(jnp.int32)

            mu_q = jnp.round(mu * 128.0) * jnp.float32(1.0 / 128.0)
            taps = jnp.broadcast_to(poly_ref[0, :][:, None], (NTAPS, cp))
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
                sel = jnp.zeros((s_rows, cp), jnp.float32)
                for t in range(NTAPS):
                    hit = rows == (local + t)[None, :]
                    sel = sel + jnp.where(hit, taps[t][None, :], 0.0)
                hit0 = rows == local[None, :]
                y = jnp.sum(sel * data, axis=0)
                is_nan = jnp.sum(jnp.where(hit0, nan_win, 0.0), axis=0) > 0.0

            valid = ii <= jnp.float32(wv) - jnp.float32(NTAPS)
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

    def nan_precompute(data):
        nan_f = jnp.isnan(data).astype(jnp.float32)
        clean = jnp.where(jnp.isnan(data), jnp.float32(0.0), data)
        nan_win = nan_f
        for jshift in (1, 2, 4):
            shifted = jnp.concatenate(
                [nan_win[jshift:, :], jnp.zeros((jshift, nan_win.shape[1]), jnp.float32)],
                axis=0,
            )
            nan_win = jnp.maximum(nan_win, shifted)
        return clean, nan_win

    s_min = -(-(span_budget + 8) // 8) * 8
    s_full = lp
    sizes = sorted(
        set([s for s in (s_min, SUB, 4 * SUB, tile) if s < s_full] + [s_full])
    )
    rows_by_size = {s: jax.lax.broadcasted_iota(jnp.int32, (s, cp), 0) for s in sizes}

    def clock_group(o):
        ii = carry_ref[3, :]
        active = ii <= jnp.float32(wv) - jnp.float32(NTAPS)
        any_active = jnp.max(active.astype(jnp.float32)) > 0.0
        neg = jnp.float32(-1e9)
        pos = jnp.float32(1e9)
        amin = jnp.min(jnp.where(active, ii, pos))
        amax = jnp.max(jnp.where(active, ii, neg))
        k0 = o * UNROLL
        amin_i = amin.astype(jnp.int32) // 8

        def aligned_off(s):
            oi = jnp.clip(amin_i, 0, (lp - s) // 8)
            return (clock8 + oi) * 8, oi.astype(jnp.float32) * 8.0

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
                data = slots[pl.ds(off_i, s), :]
                clean, nan_win = nan_precompute(data)
                run_group(k0, clean, nan_win, off, s, rows_by_size[s])

        off_t = aligned_off(tile)[1]
        overflow = (
            (amax - off_t + jnp.float32(span_budget)) > jnp.float32(tile)
        ).astype(jnp.float32)
        counts_ref[1, :] = jnp.maximum(
            counts_ref[1, :], jnp.broadcast_to(overflow[None], (cp,))
        )

    def clock_epilogue():
        counts_ref[0, :] = carry_ref[4, :]
        counts_ref[2:, :] = jnp.zeros((6, cp), jnp.float32)
        ii = carry_ref[3, :]
        resid = jnp.minimum(jnp.float32(wv) - ii, jnp.float32(sfx - 1))
        carry_ref[3, :] = jnp.float32(sfx) - resid
        state_out_ref[0:3, :] = carry_ref[0:3, :]
        state_out_ref[3, :] = resid
        state_out_ref[4:, :] = jnp.zeros((4, cp), jnp.float32)
        # hand the consumed chunk's tail to the OTHER slot as the next
        # chunk's suffix (tail_start = chunk exactly: full chunks only)
        tmp[0:sfx, :cp] = slots[pl.ds((clock8 + chunk // 8) * 8, sfx), :]
        slots[pl.ds(front8 * 8, sfx), :] = tmp[0:sfx, :cp]
        sfx_out_ref[:, :] = tmp[0:sfx, :cp]

    # ---- dispatch --------------------------------------------------------
    @pl.when(have_clock)
    def _():
        clock_prologue()

    if interleave:
        loop_n = max(num_groups, n_units)

        def body(o, _):
            run_front_unit(o)

            @pl.when(have_clock & (o < num_groups))
            def _():
                clock_group(o)

            return 0

        jax.lax.fori_loop(jnp.int32(0), jnp.int32(loop_n), body, 0)
    else:

        @pl.when(have_front)
        def _():
            for u in range(n_units):
                run_front_unit(u)

        def body(o, _):
            clock_group(o)
            return 0

        @pl.when(have_clock)
        def _():
            jax.lax.fori_loop(jnp.int32(0), jnp.int32(num_groups), body, 0)

    @pl.when(have_clock)
    def _():
        clock_epilogue()

    # ---- front state export ---------------------------------------------
    @pl.when(g == num_tiles - 1)
    def _export():
        h1o_ref[:, :] = buf1[r : r + h1, :]
        qpo_ref[:, :] = qbuf[:, :]
        h2o_ref[:, :] = buf2[r : r + h2, :]
        if use_dc:
            h3o_ref[:, :] = buf3[rd : rd + h3, :]


def fused_step_available(block: int, d: int, cp: int) -> bool:
    """The fused step needs whole clock chunks: block % (d * chunk) == 0,
    and a single 128-lane vreg of channels (the clock carry rows)."""
    return cp == LANES and block % (d * step_chunk()) == 0


def fused_step_call(
    x_tm: jnp.ndarray,  # (B, 2*Cp) f32 time-major
    lpf1_hist: jnp.ndarray,  # (t1-1, 2*Cp)
    quad_prev: jnp.ndarray,  # (1, 2*Cp)
    lpf2_hist: jnp.ndarray,  # (t2-1, Cp)
    dc_hist: jnp.ndarray | None,  # (tdc-1, Cp) or None
    suffix: jnp.ndarray,  # (sfx, Cp) carried clock input tail
    omega: jnp.ndarray,  # (Cp,)
    mu: jnp.ndarray,
    last: jnp.ndarray,
    resid: jnp.ndarray,
    spec: FrontSpec,
    *,
    omega_mid: float,
    omega_relative_limit: float,
    gain_omega: float,
    gain_mu: float,
    num_symbols: int,
    dop=None,
    tile: int | None = None,
    interpret: bool = False,
    precision=None,
):
    """One full demod block, front + clock fused.

    Returns (outs (n_chunks, k_pad, Cp) f32 soft symbols,
    counts (n_chunks, Cp), overflow (n_chunks, Cp),
    (lpf1', quad', lpf2', dc'), {omega, mu, last, resid, suffix}).
    Symbols are bit-identical to fused_front_call + clock_mm_chunked_tpu.
    """
    b, cp2 = x_tm.shape
    cp = cp2 // 2
    d = spec.d
    use_dc = spec.tdc is not None
    chunk = step_chunk()
    r = d * chunk
    if b % r != 0:
        raise ValueError(f"fused step needs block % {r} == 0 (got {b})")
    if cp != LANES:
        raise ValueError("fused step handles exactly 128 channel lanes")
    num_tiles = b // r
    rd = chunk
    if precision is None:
        precision = _default_precision()

    sfx = int(suffix.shape[0])
    if sfx % 8 != 0 or chunk < sfx:
        raise ValueError("suffix must be 8-aligned and <= chunk")
    num_groups, k_pad = _groups_for(num_symbols)
    if tile is None:
        tile = required_tile(num_symbols, omega_mid, omega_relative_limit, sfx)
    lp = -(-(sfx + chunk + _span_budget(omega_mid) + 8) // 128) * 128

    h1, h2, h3 = spec.head1, spec.head2, spec.head3
    pad1 = h1 - (len(spec.t1) - 1)
    pad2 = h2 - (len(spec.t2) - 1)
    pad3 = h3 - (len(spec.tdc) - 1) if use_dc else 0

    h1p = jnp.concatenate([jnp.zeros((pad1, cp2), jnp.float32), lpf1_hist], axis=0)
    qp = jnp.concatenate([quad_prev, jnp.zeros((QROWS - 1, cp2), jnp.float32)], axis=0)
    h2p = jnp.concatenate([jnp.zeros((pad2, cp), jnp.float32), lpf2_hist], axis=0)
    inputs = [x_tm, h1p, qp, h2p]
    if use_dc:
        h3p = jnp.concatenate([jnp.zeros((pad3, cp), jnp.float32), dc_hist], axis=0)
        inputs.append(h3p)

    w1 = jnp.asarray(_band_matrix(spec.t1[::-1], 1, spec.k1, LANES, pad1))
    w2 = jnp.asarray(_band_matrix(spec.t2[::-1], d, spec.k2, LANES, pad2))
    inputs += [w1, w2]
    if use_dc:
        w3 = jnp.asarray(_band_matrix(spec.tdc[::-1], 1, spec.k3, LANES, pad3))
        inputs.append(w3)
    if spec.dop_rows > 0:
        if dop is None:
            raise ValueError("spec.dop_rows > 0 requires dop tables")
        starts, ends, adjs, ph0s = (a.astype(jnp.float32) for a in dop)
        steps = jnp.mod(adjs.astype(jnp.float64) * 4096.0, 2 * np.pi).astype(
            jnp.float32
        )
        inputs.append(jnp.stack([starts, ends, adjs, ph0s, steps], axis=0))

    inputs.append(suffix.astype(jnp.float32))
    state = jnp.zeros((8, cp), jnp.float32)
    for i, v in enumerate((omega, mu, last, resid.astype(jnp.float32))):
        state = jax.lax.dynamic_update_slice(
            state, v.astype(jnp.float32)[None, :], (i, 0)
        )
    inputs.append(state)
    inputs.append(jnp.asarray(bank_poly_coeffs()))

    clamp_in = lambda g: (jnp.minimum(g, num_tiles - 1), 0)
    shift_out = lambda g: (jnp.maximum(g - 1, 0), 0)
    const = lambda shape: pl.BlockSpec(
        shape, lambda g: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((r, cp2), clamp_in, memory_space=pltpu.VMEM),
        const((h1, cp2)),
        const((QROWS, cp2)),
        const((h2, cp)),
    ]
    if use_dc:
        in_specs.append(const((h3, cp)))
    in_specs += [const(w1.shape), const(w2.shape)]
    if use_dc:
        in_specs.append(const(w3.shape))
    if spec.dop_rows > 0:
        in_specs.append(
            pl.BlockSpec(
                (5, spec.dop_rows, cp), lambda g: (0, 0, 0), memory_space=pltpu.VMEM
            )
        )
    in_specs += [const((sfx, cp)), const((8, cp)), const((8, 8))]

    out_shapes = [
        jax.ShapeDtypeStruct((num_tiles * k_pad, cp), jnp.float32),  # outs
        jax.ShapeDtypeStruct((num_tiles * 8, cp), jnp.float32),  # counts
        jax.ShapeDtypeStruct((h1, cp2), jnp.float32),
        jax.ShapeDtypeStruct((QROWS, cp2), jnp.float32),
        jax.ShapeDtypeStruct((h2, cp), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((k_pad, cp), shift_out, memory_space=pltpu.VMEM),
        pl.BlockSpec((8, cp), shift_out, memory_space=pltpu.VMEM),
        const((h1, cp2)),
        const((QROWS, cp2)),
        const((h2, cp)),
    ]
    if use_dc:
        out_shapes.append(jax.ShapeDtypeStruct((h3, cp), jnp.float32))
        out_specs.append(const((h3, cp)))
    out_shapes += [
        jax.ShapeDtypeStruct((8, cp), jnp.float32),  # clock state
        jax.ShapeDtypeStruct((sfx, cp), jnp.float32),  # next-block suffix
    ]
    out_specs += [const((8, cp)), const((sfx, cp))]

    head_max = max(h1, h2, h3, sfx)
    scratch = [
        pltpu.VMEM((h1 + r, cp2), jnp.float32),  # buf1
        pltpu.VMEM((h2 + r, cp), jnp.float32),  # buf2
    ]
    if use_dc:
        scratch.append(pltpu.VMEM((h3 + rd, cp), jnp.float32))  # buf3
    scratch += [
        pltpu.VMEM((QROWS, cp2), jnp.float32),  # qbuf
        pltpu.VMEM((head_max, cp2), jnp.float32),  # tmp
        pltpu.VMEM((2 * lp, cp), jnp.float32),  # y3 slots
        pltpu.VMEM((8, cp), jnp.float32),  # clock carry
    ]

    lim = float(np.float32(omega_mid) * np.float32(omega_relative_limit))
    kernel = functools.partial(
        _fused_step_kernel,
        r=r,
        d=d,
        cp=cp,
        spec=spec,
        num_tiles=num_tiles,
        precision=precision,
        chunk=chunk,
        sfx=sfx,
        lp=lp,
        num_groups=num_groups,
        tile=int(tile),
        k_pad=k_pad,
        omega_mid=float(np.float32(omega_mid)),
        omega_lim=lim,
        gain_omega=float(np.float32(gain_omega)),
        gain_mu=float(np.float32(gain_mu)),
        interleave=_interleave(),
    )
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            out_shape=out_shapes,
            grid=(num_tiles + 1,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
            interpret=interpret,
        )(*inputs)
    oi = iter(outs)
    sym = next(oi).reshape(num_tiles, k_pad, cp)
    cc = next(oi).reshape(num_tiles, 8, cp)
    h1o = next(oi)
    qpo = next(oi)
    h2o = next(oi)
    h3o = next(oi) if use_dc else None
    state_out = next(oi)
    sfx_out = next(oi)

    front = (
        h1o[pad1:, :],
        qpo[0:1, :],
        h2o[pad2:, :],
        h3o[pad3:, :] if use_dc else None,
    )
    clock = dict(
        omega=state_out[0, :],
        mu=state_out[1, :],
        last=state_out[2, :],
        resid=state_out[3, :].astype(jnp.int32),
        suffix=sfx_out,
    )
    return sym, cc[:, 0, :], cc[:, 1, :], front, clock
