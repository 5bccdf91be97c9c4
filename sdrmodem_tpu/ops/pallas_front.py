"""Fused GMSK front-end Pallas kernel: LPF1 → quad demod → LPF2 → DC.

The reference chain (src/dsp/fsk_demod.c:80-110) runs four stream blocks
back to back; the unfused TPU path (dsp/pipeline.py:_front_batched_full)
runs them as four XLA/Pallas launches with every intermediate round-
tripping through HBM, and the banded FIR re-reads its input k_shift
times (3x for LPF1, 6x for the 637-tap DC blocker) — 33 ms of the 51 ms
production step is this HBM traffic (BASELINE.md round-3 attribution).

This kernel runs the whole front-end as ONE Pallas program:

- the grid walks time tiles of R rows SEQUENTIALLY (TPU grid semantics,
  same property the chunked clock kernel relies on) and every FIR's
  history tail is carried between tiles in VMEM scratch — the input
  block is read from HBM exactly once and only the decimated DC output
  is written back: ~1/7th of the unfused front-end's HBM traffic;
- intermediates (y1, the quad-demod soft stream, the decimated LPF2
  output) never leave VMEM;
- each FIR evaluates as the same banded matmul as conv1d_banded_tm
  (pallas_fir.banded_tile_dot), with the scratch buffers laid out so
  every 128-row accumulation sub-block starts at an input-STREAM row
  that is 0 mod 128.  That "stream-aligned" grouping is achieved by
  padding each carried history head with leading zeros up to a 128-row
  multiple (head = ceil((taps-1)/128)*128); the unfused path applies the
  identical convention via conv1d_banded_tm(col_offset=pad), so fused
  and unfused outputs are BIT-IDENTICAL — the property that keeps the
  chaotic M&M clock downstream on the golden fixtures (a changed f32
  accumulation grouping measured up to 25 LSB of slip, BASELINE.md).

Layout: time-major throughout, channels along lanes.  x is (B, 2*Cp)
float32 with I in lanes [0, Cp) and Q in [Cp, 2*Cp); the output is the
(B/d, Cp) DC-blocked soft stream feeding the clock-recovery kernel.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sdrmodem_tpu.ops.pallas_fir import (
    LANES,
    _band_matrix,
    _default_precision,
    banded_tile_dot,
)

QROWS = 8  # quad-prev carry block (1 meaningful row, 8 for sublane alignment)


def _head(taps_len: int) -> int:
    """Scratch head rows for a (taps_len)-tap FIR: taps-1 rounded up to 128."""
    return -(-(taps_len - 1) // LANES) * LANES


class FrontSpec(NamedTuple):
    """Static description of the fused front-end (derived from FskDemodConfig)."""

    t1: tuple  # LPF1 taps, natural order
    t2: tuple  # LPF2 taps
    tdc: tuple | None  # DC-blocker FIR taps (None = no DC stage)
    d: int  # LPF2 decimation
    quad_gain: float
    atan_mode: object  # atan2_dispatch mode; must be gather-free in-kernel
    dop_rows: int = 0  # device-Doppler NCO table rows (0 = no mix stage)

    @property
    def head1(self) -> int:
        return _head(len(self.t1))

    @property
    def head2(self) -> int:
        return _head(len(self.t2))

    @property
    def head3(self) -> int:
        return _head(len(self.tdc)) if self.tdc is not None else 0

    @property
    def k1(self) -> int:
        return 1 + self.head1 // LANES

    @property
    def k2(self) -> int:
        return self.d + self.head2 // LANES

    @property
    def k3(self) -> int:
        return 1 + self.head3 // LANES


def choose_tile(block: int, d: int, target: int = 1024) -> int | None:
    """Largest time-tile R <= ~target with R % (128*d) == 0 and block % R == 0.

    Returns None when no legal tile exists (tiny/odd blocks fall back to
    the unfused path).  SDRM_FRONT_TILE overrides the target."""
    import os

    target = int(os.environ.get("SDRM_FRONT_TILE", str(target)))
    gran = LANES * d
    if block % gran != 0:
        return None
    best = None
    r = gran
    while r <= block:
        if block % r == 0 and r <= max(target, gran):
            best = r
        r += gran
    return best


def _front_kernel(
    *refs,
    r: int,
    d: int,
    cp: int,
    spec: FrontSpec,
    num_tiles: int,
    precision,
):
    use_dc = spec.tdc is not None
    h1, h2, h3 = spec.head1, spec.head2, spec.head3
    k1, k2, k3 = spec.k1, spec.k2, spec.k3
    rd = r // d

    # unpack refs: inputs, outputs, scratch (order fixed by fused_front_call)
    dop = spec.dop_rows > 0
    it = iter(refs)
    x_ref = next(it)
    h1_ref = next(it)
    qp_ref = next(it)
    h2_ref = next(it)
    h3_ref = next(it) if use_dc else None
    w1_ref = next(it)
    w2_ref = next(it)
    w3_ref = next(it) if use_dc else None
    dop_ref = next(it) if dop else None  # (5, S_rows, Cp): start/end/adj/ph0/step4096
    y3_ref = next(it)
    h1o_ref = next(it)
    qpo_ref = next(it)
    h2o_ref = next(it)
    h3o_ref = next(it) if use_dc else None
    buf1 = next(it)
    y1buf = next(it)
    buf2 = next(it)
    buf3 = next(it) if use_dc else None
    qbuf = next(it)
    tmp = next(it)  # staging buffer for the (possibly overlapping) tail moves

    g = pl.program_id(0)

    # ---- heads: carried state at g==0, previous tile's tail afterwards.
    # Tail moves go through ``tmp`` because src/dst ranges can overlap
    # (head3 > rd for long DC blockers) and scratch-to-scratch copy order
    # inside Mosaic is not a contract we want to rely on.
    @pl.when(g == 0)
    def _init():
        buf1[0:h1, :] = h1_ref[:, :]
        qbuf[:, :] = qp_ref[:, :]
        buf2[0:h2, :] = h2_ref[:, :]
        if use_dc:
            buf3[0:h3, :] = h3_ref[:, :]

    @pl.when(g > 0)
    def _carry():
        tmp[0:h1, :] = buf1[r : r + h1, :]
        buf1[0:h1, :] = tmp[0:h1, :]
        tmp[0:h2, :cp] = buf2[r : r + h2, :]
        buf2[0:h2, :] = tmp[0:h2, :cp]
        if use_dc:
            tmp[0:h3, :cp] = buf3[rd : rd + h3, :]
            buf3[0:h3, :] = tmp[0:h3, :cp]

    # ---- stage 0 (optional): device Doppler — the per-lane piecewise-
    # linear-phase NCO multiply applied per tile before LPF1, fused so
    # the mixed stream never round-trips HBM (mirrors
    # elementwise.nco_mix_pair_tm incl. the two-level k*4096 + m ramp;
    # inactive lanes multiply by exactly (1, 0) and pass through
    # bit-identically)
    if dop:
        xt = x_ref[:, :]
        # int32 iota (Mosaic's tpu.iota is integer-only), then to f32
        nrow = jnp.float32(g * r) + jax.lax.broadcasted_iota(
            jnp.int32, (r, 1), 0
        ).astype(jnp.float32)
        ph = jnp.zeros((r, cp), jnp.float32)
        for srow in range(spec.dop_rows):
            st = dop_ref[0, srow : srow + 1, :]  # (1, Cp)
            en = dop_ref[1, srow : srow + 1, :]
            adj = dop_ref[2, srow : srow + 1, :]
            ph0 = dop_ref[3, srow : srow + 1, :]
            stp = dop_ref[4, srow : srow + 1, :]  # per-4096 coarse phase step
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
    w1 = w1_ref[:, :]
    for m in range(r // LANES):
        acc = banded_tile_dot(
            w1,
            lambda s, m=m: buf1[(m + s) * LANES : (m + s + 1) * LANES, :],
            k1,
            precision,
        )
        y1buf[m * LANES : (m + 1) * LANES, :] = acc

    # ---- stage 2: quadrature demod (conj-multiply + gather-free LUT atan;
    # Mosaic has no atan primitive, so the bracketing table entries come
    # from the 1-ulp polynomial — kernel_atan_mode maps the mode)
    from sdrmodem_tpu.dsp.elementwise import atan2_dispatch, kernel_atan_mode

    y1 = y1buf[:, :]
    prev = qbuf[0:1, :]
    shifted = jnp.concatenate([prev, y1[: r - 1, :]], axis=0)
    i, q = y1[:, :cp], y1[:, cp:]
    si, sq = shifted[:, :cp], shifted[:, cp:]
    re = i * si + q * sq
    im = q * si - i * sq
    yq = jnp.float32(spec.quad_gain) * atan2_dispatch(
        im, re, kernel_atan_mode(spec.atan_mode)
    )
    qbuf[0:1, :] = y1[r - 1 : r, :]
    buf2[h2 : h2 + r, :] = yq

    # ---- stage 3: LPF2 (stride d)
    w2 = w2_ref[:, :]
    for m in range(rd // LANES):
        acc = banded_tile_dot(
            w2,
            lambda s, m=m: buf2[(m * d + s) * LANES : (m * d + s + 1) * LANES, :],
            k2,
            precision,
        )
        if use_dc:
            buf3[h3 + m * LANES : h3 + (m + 1) * LANES, :] = acc
        else:
            y3_ref[m * LANES : (m + 1) * LANES, :] = acc

    # ---- stage 4: DC blocker (one causal 4L-3-tap FIR, stride 1)
    if use_dc:
        w3 = w3_ref[:, :]
        for m in range(rd // LANES):
            acc = banded_tile_dot(
                w3,
                lambda s, m=m: buf3[(m + s) * LANES : (m + s + 1) * LANES, :],
                k3,
                precision,
            )
            y3_ref[m * LANES : (m + 1) * LANES, :] = acc

    # ---- state export on the last tile (padded-head format; the wrapper
    # slices the pads off so DemodStateFull keeps its unpadded layout)
    @pl.when(g == num_tiles - 1)
    def _export():
        h1o_ref[:, :] = buf1[r : r + h1, :]
        qpo_ref[:, :] = qbuf[:, :]
        h2o_ref[:, :] = buf2[r : r + h2, :]
        if use_dc:
            h3o_ref[:, :] = buf3[rd : rd + h3, :]


def fused_front_call(
    x_tm: jnp.ndarray,  # (B, 2*Cp) f32 time-major
    lpf1_hist: jnp.ndarray,  # (t1-1, 2*Cp)
    quad_prev: jnp.ndarray,  # (1, 2*Cp)
    lpf2_hist: jnp.ndarray,  # (t2-1, Cp)
    dc_hist: jnp.ndarray | None,  # (tdc-1, Cp) or None
    spec: FrontSpec,
    *,
    dop=None,  # (starts, ends, adjs, ph0s) tables, each (spec.dop_rows, Cp)
    interpret: bool = False,
    precision=None,
):
    """Run the fused front-end over one full block.

    Returns (y3 (B/d, Cp), (lpf1_hist', quad_prev', lpf2_hist', dc_hist')).
    Bit-identical to the stream-aligned unfused path
    (DemodPipeline._front_batched_full with col_offset pads).  With
    ``dop`` (and spec.dop_rows > 0) the device-Doppler NCO multiply runs
    inside the kernel before LPF1 — no separate HBM round trip of the
    mixed stream."""
    b, cp2 = x_tm.shape
    cp = cp2 // 2
    d = spec.d
    use_dc = spec.tdc is not None
    r = choose_tile(b, d)
    if r is None:
        raise ValueError(f"no legal fused tile for block={b}, d={d}")
    num_tiles = b // r
    rd = r // d
    if precision is None:
        precision = _default_precision()

    h1, h2, h3 = spec.head1, spec.head2, spec.head3
    pad1 = h1 - (len(spec.t1) - 1)
    pad2 = h2 - (len(spec.t2) - 1)
    pad3 = h3 - (len(spec.tdc) - 1) if use_dc else 0

    h1p = jnp.concatenate([jnp.zeros((pad1, cp2), jnp.float32), lpf1_hist], axis=0)
    qp = jnp.concatenate(
        [quad_prev, jnp.zeros((QROWS - 1, cp2), jnp.float32)], axis=0
    )
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
        # per-4096 coarse phase step, f64-derived (the two-level ramp of
        # elementwise.nco_mix_pair_tm)
        steps = jnp.mod(adjs.astype(jnp.float64) * 4096.0, 2 * np.pi).astype(
            jnp.float32
        )
        dop_tab = jnp.stack([starts, ends, adjs, ph0s, steps], axis=0)
        inputs.append(dop_tab)  # (5, S_rows, Cp)

    const = lambda shape: pl.BlockSpec(
        shape, lambda g: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec((r, cp2), lambda g: (g, 0), memory_space=pltpu.VMEM),
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
                (5, spec.dop_rows, cp),
                lambda g: (0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )

    out_shapes = [
        jax.ShapeDtypeStruct((b // d, cp), jnp.float32),
        jax.ShapeDtypeStruct((h1, cp2), jnp.float32),
        jax.ShapeDtypeStruct((QROWS, cp2), jnp.float32),
        jax.ShapeDtypeStruct((h2, cp), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((rd, cp), lambda g: (g, 0), memory_space=pltpu.VMEM),
        const((h1, cp2)),
        const((QROWS, cp2)),
        const((h2, cp)),
    ]
    if use_dc:
        out_shapes.append(jax.ShapeDtypeStruct((h3, cp), jnp.float32))
        out_specs.append(const((h3, cp)))

    head_max = max(h1, h2, h3)
    scratch = [
        pltpu.VMEM((h1 + r, cp2), jnp.float32),  # buf1
        pltpu.VMEM((r, cp2), jnp.float32),  # y1buf
        pltpu.VMEM((h2 + r, cp), jnp.float32),  # buf2
    ]
    if use_dc:
        scratch.append(pltpu.VMEM((h3 + rd, cp), jnp.float32))  # buf3
    scratch += [
        pltpu.VMEM((QROWS, cp2), jnp.float32),  # qbuf
        pltpu.VMEM((head_max, cp2), jnp.float32),  # tmp
    ]

    kernel = functools.partial(
        _front_kernel,
        r=r,
        d=d,
        cp=cp,
        spec=spec,
        num_tiles=num_tiles,
        precision=precision,
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
        )(*inputs)
    y3 = outs[0]
    h1o, qpo, h2o = outs[1], outs[2], outs[3]
    lpf1_new = h1o[pad1:, :]
    quad_new = qpo[0:1, :]
    lpf2_new = h2o[pad2:, :]
    dc_new = outs[4][pad3:, :] if use_dc else None
    return y3, (lpf1_new, quad_new, lpf2_new, dc_new)
