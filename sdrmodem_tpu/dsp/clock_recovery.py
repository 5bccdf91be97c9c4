"""Mueller & Müller symbol-timing recovery as a `lax.scan`.

Reference: src/dsp/clock_recovery_mm.c:78-139 plus the 8-tap MMSE
fractional-delay interpolator (src/dsp/mmse_fir_interpolator.c:188-191).

The loop is inherently sequential with data-dependent input strides:

    y_k     = dot(x[ii .. ii+7], bank[rint(mu * 128)])
    mm      = sgn(last) * y_k - sgn(y_k) * last
    omega  <- omega_mid + clip(omega + g_o * mm - omega_mid, +-lim)
    mu     <- mu + omega + g_m * mm;   ii += floor(mu);   mu -= floor(mu)

(NaN input emits 0.0 and strides floor(omega), reference :107-113.)

Formulated here as a fixed-length scan over output symbols with masked
validity: once the read pointer runs past the available input the step
becomes a no-op, so the emitted count is data-dependent but shapes stay
static (XLA-friendly).  Batching over channels is `jax.vmap`.

Per-block carried state {omega, mu, last_sample, input tail} is exactly
the reference's history hand-off (:119-135) and is what gets exchanged
between time-shards in the multi-device pipeline.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from sdrmodem_tpu.dsp import taps as taps_mod

NTAPS = taps_mod.MMSE_INTERP_NTAPS  # 8
NSTEPS = taps_mod.MMSE_INTERP_NSTEPS  # 128

# Maximum input tail carried between blocks: the loop stops with
# ii > L - 8, and a single stride is at most ceil(omega*(1+limit)) + 1,
# so the un-consumed tail is < 8 + max_stride.  The state capacity is
# DERIVED from omega at construction (the reference carries a
# variable-length history with no bound, src/dsp/clock_recovery_mm.c:
# 127-135); the floors keep the historical state shapes (and checkpoint
# compatibility) for the common sps ranges.
TAIL_CAP = 32  # floor: covers sps <= ~22


def tail_cap_for(omega: float, omega_relative_limit: float = 0.01) -> int:
    """Tail capacity (multiple of 8) provably >= the largest unconsumed
    tail for this omega: NTAPS + ceil(omega*(1+limit)) + 1."""
    need = NTAPS + int(np.ceil(float(omega) * (1.0 + omega_relative_limit))) + 2
    return max(TAIL_CAP, -(-need // 8) * 8)


class ClockState(NamedTuple):
    omega: jnp.ndarray  # () f32
    mu: jnp.ndarray  # () f32
    last_sample: jnp.ndarray  # () f32
    tail: jnp.ndarray  # (TAIL_CAP,) f32 — unconsumed input samples
    tail_len: jnp.ndarray  # () i32


# Fixed-size suffix carried by the full-block fast path.  SUFFIX is the
# FLOOR (covers sps <= ~53); the actual capacity is derived from omega at
# state construction (suffix_cap_for), always a multiple of 8 so the
# pallas tile stays sublane-aligned.
SUFFIX = 64


def suffix_cap_for(omega: float, omega_relative_limit: float = 0.01) -> int:
    """Suffix capacity (multiple of 8) provably >= the largest unconsumed
    tail for this omega — the full-block analog of ``tail_cap_for``."""
    need = NTAPS + int(np.ceil(float(omega) * (1.0 + omega_relative_limit))) + 2
    return max(SUFFIX, -(-need // 8) * 8)


# Largest supported samples-per-symbol: the chunked kernel's VMEM
# footprint (work buffer + window ladder) grows ~linearly with omega via
# the per-group consumption budget (8 symbols x ~omega-sample strides),
# so an explicit contract bound replaces a silent state-capacity clip
# (the reference carries an unbounded malloc'd history instead,
# src/dsp/clock_recovery_mm.c:127-135).  512 sps is far past any real
# GMSK configuration (the fixtures run 4.8-25); beyond it, raise/reject
# with guidance to increase demod_decimation.
MAX_SPS = 512.0


def check_sps_supported(omega: float) -> None:
    if float(omega) > MAX_SPS:
        raise ValueError(
            f"samples-per-symbol {float(omega):.1f} exceeds the supported "
            f"bound {MAX_SPS:.0f} (clock state/VMEM budget); increase "
            "demod_decimation so Fs/baud/decimation <= "
            f"{MAX_SPS:.0f}"
        )


class ClockFullState(NamedTuple):
    """State of the full-block clock path (time-major, channel-last).

    Instead of extracting the variable-length unconsumed tail (a gather
    with a per-channel dynamic start — an order of magnitude slower than
    block copies on TPU), the full-block path carries the last ``SUFFIX``
    input samples verbatim (a static slice) plus ``resid``, the number of
    them not yet consumed.  The next block prepends the suffix and starts
    its read pointer at ``SUFFIX - resid`` — numerically identical to the
    reference's tail hand-off (src/dsp/clock_recovery_mm.c:119-135).
    """

    omega: jnp.ndarray  # (C,) f32
    mu: jnp.ndarray  # (C,) f32
    last_sample: jnp.ndarray  # (C,) f32
    suffix: jnp.ndarray  # (SUFFIX, C) f32 — last SUFFIX input samples
    resid: jnp.ndarray  # (C,) i32 — unconsumed count (< SUFFIX)
    overflow: jnp.ndarray  # (C,) f32 — count of chunks that tripped the
    # kernel's window-overflow guard and were re-run on the full-buffer
    # window (observability counter; output stays correct either way)


def initial_full_state(omega: float, channels: int, mu: float = 0.5) -> ClockFullState:
    return ClockFullState(
        omega=jnp.full((channels,), omega, jnp.float32),
        mu=jnp.full((channels,), mu, jnp.float32),
        last_sample=jnp.zeros((channels,), jnp.float32),
        suffix=jnp.zeros((suffix_cap_for(omega), channels), jnp.float32),
        resid=jnp.zeros((channels,), jnp.int32),
        overflow=jnp.zeros((channels,), jnp.float32),
    )


def mm_params(sps: float) -> dict:
    """The reference fsk_demod's M&M constants (src/dsp/fsk_demod.c:63-67)."""
    sps = np.float32(sps)
    return dict(
        omega=float(sps),
        gain_omega=float(np.float32(sps * np.float32(np.pi)) / np.float32(100.0)),
        mu=0.5,
        gain_mu=0.0625,
        omega_relative_limit=0.01,
    )


def initial_state(omega: float, mu: float = 0.5) -> ClockState:
    return ClockState(
        omega=jnp.float32(omega),
        mu=jnp.float32(mu),
        last_sample=jnp.float32(0.0),
        tail=jnp.zeros(tail_cap_for(omega), jnp.float32),
        tail_len=jnp.int32(0),
    )


def max_symbols(n_in: int, omega_mid: float, omega_relative_limit: float, gain_mu: float) -> int:
    """Static upper bound on symbols produced from n_in input samples."""
    min_stride = max(1.0, np.floor(omega_mid * (1.0 - omega_relative_limit) - 4.0 * gain_mu))
    return int(np.ceil(n_in / min_stride)) + 2


def _slice_sign(x):
    return jnp.where(x < 0, jnp.float32(-1.0), jnp.float32(1.0))


def _branchless_clip(x, clip):
    return jnp.float32(0.5) * (jnp.abs(x + clip) - jnp.abs(x - clip))


def clock_mm_stream(
    x: jnp.ndarray,
    *,
    omega: float,
    gain_omega: float,
    mu: float = 0.5,
    gain_mu: float = 0.0625,
    omega_relative_limit: float = 0.01,
    state: ClockState | None = None,
    n_valid: jnp.ndarray | int | None = None,
    num_symbols: int | None = None,
):
    """Run M&M clock recovery over a 1-D float32 stream.

    x: (L,) float32.  ``state`` carries {omega, mu, last, tail} across
    blocks (tail is prepended to x).  ``n_valid`` marks how many samples of
    x are meaningful (for ragged last blocks).  Returns
    (symbols (K,) f32, count () i32, new_state) where K is the static
    ``num_symbols`` bound and only the first ``count`` entries are valid.

    Batch over channels with ``jax.vmap``.
    """
    banks = jnp.asarray(taps_mod.mmse_interp_taps())  # (129, 8)
    omega_mid = np.float32(omega)
    omega_lim = np.float32(omega_mid * np.float32(omega_relative_limit))

    ln = x.shape[-1]
    if state is None:
        state = initial_state(omega, mu)
        cap = state.tail.shape[0]  # capacity derives from omega (tail_cap_for)
        work = jnp.concatenate([x.astype(jnp.float32), jnp.zeros(cap, jnp.float32)])
        base_valid = jnp.asarray(ln if n_valid is None else n_valid, jnp.int32)
        ii0 = jnp.int32(0)
    else:
        cap = state.tail.shape[0]
        # tail_len < 0 encodes a SKIP: the previous block's final stride
        # overshot its end by -tail_len samples, so this block starts its
        # read pointer there instead of at 0.  (The reference instead
        # rewinds to the previously processed position on overshoot,
        # src/dsp/clock_recovery_mm.c:126-131 — making its output depend
        # on the buffer size whenever sps > 8.  Carrying the exact
        # overshoot keeps the symbol trajectory block-size-invariant,
        # which the time-sharded paths rely on.)
        tl = jnp.maximum(state.tail_len, 0)
        ii0 = jnp.maximum(-state.tail_len, 0).astype(jnp.int32)
        # work = [tail, x, pad]; valid length = tail_len + n_valid
        work = jnp.concatenate(
            [state.tail, x.astype(jnp.float32), jnp.zeros(cap, jnp.float32)]
        )
        # left-align [tail[:tail_len], x, ...]: positions >= tail_len skip the
        # unused remainder of the fixed-capacity tail buffer
        i = jnp.arange(work.shape[0])
        idx = jnp.where(i < tl, i, i + (cap - tl))
        work = jnp.take(work, jnp.clip(idx, 0, work.shape[0] - 1))
        base_valid = tl + jnp.asarray(
            ln if n_valid is None else n_valid, jnp.int32
        )

    if num_symbols is None:
        num_symbols = max_symbols(
            ln + cap, float(omega_mid), omega_relative_limit, gain_mu
        )

    (ii_f, mu_f, omega_f, last_f, count), outs = _mm_scan_core(
        work,
        base_valid,
        ii0,
        jnp.asarray(state.mu, jnp.float32),
        jnp.asarray(state.omega, jnp.float32),
        jnp.asarray(state.last_sample, jnp.float32),
        omega_mid=omega_mid,
        omega_lim=omega_lim,
        gain_omega=gain_omega,
        gain_mu=gain_mu,
        num_symbols=int(num_symbols),
    )

    # Tail hand-off: keep work[ii_f:valid_len].  When the final stride
    # overshot the block end (ii_f > valid, possible whenever sps > 8),
    # tail_len goes NEGATIVE — the exact skip into the next block —
    # instead of the reference's rewind-to-previous (:126-131), keeping
    # the output block-size-invariant (see the skip note above).
    lmax = work.shape[0]
    last_index = jnp.minimum(ii_f, base_valid)
    tail_len = jnp.minimum(base_valid - ii_f, cap)
    start = jnp.clip(last_index, 0, lmax - cap)
    tail = jax.lax.dynamic_slice(work, (start,), (cap,))
    tail = jnp.where(jnp.arange(cap) < jnp.maximum(tail_len, 0), tail, 0.0)

    new_state = ClockState(omega_f, mu_f, last_f, tail, tail_len.astype(jnp.int32))
    return outs, count, new_state


def _mm_scan_core(
    work: jnp.ndarray,  # (L,) f32
    base_valid,  # () i32
    ii0,  # () i32 — initial read pointer
    mu0,
    omega0,
    last0,
    *,
    omega_mid,
    omega_lim,
    gain_omega,
    gain_mu,
    num_symbols: int,
):
    """The sequential M&M loop (reference src/dsp/clock_recovery_mm.c:78-139)
    as a fixed-length masked scan.  Returns ((ii, mu, omega, last, count), outs)."""
    banks = jnp.asarray(taps_mod.mmse_interp_taps())  # (129, 8)
    g_o = jnp.float32(gain_omega)
    g_m = jnp.float32(gain_mu)
    lmax = work.shape[0]

    def step(carry, _):
        ii, mu_c, omega_c, last, count = carry
        valid = ii <= base_valid - NTAPS
        ii_c = jnp.clip(ii, 0, lmax - NTAPS)
        window = jax.lax.dynamic_slice(work, (ii_c,), (NTAPS,))
        imu = jnp.clip(jnp.round(mu_c * NSTEPS).astype(jnp.int32), 0, NSTEPS)
        y = jnp.dot(window, banks[imu], preferred_element_type=jnp.float32)

        is_nan = jnp.isnan(y)
        out = jnp.where(is_nan, jnp.float32(0.0), y)

        mm = _slice_sign(last) * out - _slice_sign(out) * last
        omega_n = omega_c + g_o * mm
        omega_n = omega_mid + _branchless_clip(omega_n - omega_mid, omega_lim)
        mu_n = mu_c + omega_n + g_m * mm
        stride_n = jnp.floor(mu_n)
        mu_n = mu_n - stride_n

        # NaN branch: emit 0, stride floor(omega), leave mu/omega/last as-is
        new_mu = jnp.where(is_nan, mu_c, mu_n)
        new_omega = jnp.where(is_nan, omega_c, omega_n)
        new_last = jnp.where(is_nan, last, out)
        stride = jnp.where(is_nan, jnp.floor(omega_c), stride_n).astype(jnp.int32)

        new_ii = ii + stride
        carry = (
            jnp.where(valid, new_ii, ii),
            jnp.where(valid, new_mu, mu_c),
            jnp.where(valid, new_omega, omega_c),
            jnp.where(valid, new_last, last),
            count + valid.astype(jnp.int32),
        )
        return carry, jnp.where(valid, out, jnp.float32(0.0))

    init = (
        jnp.asarray(ii0, jnp.int32),
        jnp.asarray(mu0, jnp.float32),
        jnp.asarray(omega0, jnp.float32),
        jnp.asarray(last0, jnp.float32),
        jnp.int32(0),
    )
    return jax.lax.scan(step, init, None, length=int(num_symbols))


def clock_mm_batched_full(
    x_tm: jnp.ndarray,  # (N, C) float32 time-major — every channel a FULL block
    state: ClockFullState,  # channel-last leaves
    *,
    omega: float,
    gain_omega: float,
    mu: float = 0.5,
    gain_mu: float = 0.0625,
    omega_relative_limit: float = 0.01,
    num_symbols: int | None = None,
    backend: str = "pallas",
    interpret: bool = False,
    tile: int | None = None,
):
    """Batched M&M for the full-block fast path (suffix-carry state).

    Time-major end to end: the work buffer is a STATIC row-concat
    [suffix, x] in the kernel's native (time, lane) layout — no
    per-channel dynamic starts and no transposes anywhere on the data
    path; only the scalar read pointer ``SUFFIX - resid`` is dynamic, and
    the kernel/scan already consumes that as part of its carried state.

    Blocks are ALWAYS processed in <=CHUNK-sample sub-chunks (static
    boundaries, state threaded through; the final chunk may be shorter):
    the suffix hand-off re-syncs every lane's read pointer to within ~2
    strides at each boundary, so the kernel's one-hot window stays small
    even when independent channels' symbol clocks drift apart — and the
    kernel's VMEM footprint is bounded by CHUNK, not the block size.

    If a chunk trips the kernel's window-overflow guard (lane positions
    spread past the drift bound of ``required_tile`` — out-of-contract
    inputs), the chunk is transparently re-run on the full-buffer window
    (``full_tile``), which is provably sufficient, and
    ``state.overflow`` is incremented: the guard heals instead of
    emitting garbage.  ``tile`` overrides the main window size (test
    hook for forcing the fallback).

    Returns (outs (C, n_chunks, K_c), counts (C, n_chunks), new_state).
    """
    n, c = x_tm.shape
    sfx = state.suffix.shape[0]  # capacity derives from omega (suffix_cap_for)
    chunk = max(clock_chunk(c), sfx)
    n_chunks = max(1, -(-n // chunk))
    bounds = [(t * chunk, min((t + 1) * chunk, n)) for t in range(n_chunks)]
    if num_symbols is None:
        # one K for every chunk (so outputs stack), sized by the largest
        cs_max = max(e - s for s, e in bounds)
        num_symbols = max_symbols(
            cs_max + sfx, float(np.float32(omega)), omega_relative_limit, gain_mu
        )

    if backend == "pallas":
        # the whole block in ONE pallas call: chunks are sequential grid
        # steps, the clock state and the suffix persist in VMEM scratch
        # between them (ops/pallas_clock.clock_mm_chunked_tpu) — no
        # per-chunk XLA assembly, cond branches, or kernel re-entry
        from sdrmodem_tpu.ops.pallas_clock import clock_mm_chunked_tpu

        outs3, counts, ovf, fin = clock_mm_chunked_tpu(
            x_tm,
            state.suffix,
            state.omega,
            state.mu,
            state.last_sample,
            state.resid,
            chunk=chunk,
            omega_mid=float(np.float32(omega)),
            omega_relative_limit=omega_relative_limit,
            gain_omega=gain_omega,
            gain_mu=gain_mu,
            num_symbols=int(num_symbols),
            tile=tile,
            interpret=interpret,
        )
        if n >= sfx:
            suffix = x_tm[-sfx:, :]
        else:
            suffix = jnp.concatenate([state.suffix, x_tm], axis=0)[-sfx:, :]
        new_state = ClockFullState(
            fin["omega"], fin["mu"], fin["last"], suffix.astype(jnp.float32),
            fin["resid"], state.overflow + jnp.sum(ovf, axis=0),
        )
        return jnp.transpose(outs3, (2, 0, 1)), counts.T.astype(jnp.int32), new_state

    outs_all, counts_all = [], []
    for s, e in bounds:
        o, cnt, state = _clock_full_one(
            x_tm[s:e],
            state,
            omega=omega,
            gain_omega=gain_omega,
            mu=mu,
            gain_mu=gain_mu,
            omega_relative_limit=omega_relative_limit,
            num_symbols=num_symbols,
            backend=backend,
            interpret=interpret,
            tile=tile,
        )
        outs_all.append(o)
        counts_all.append(cnt)
    return (
        jnp.stack(outs_all, axis=1),
        jnp.stack(counts_all, axis=1),
        state,
    )


def clock_chunk(lanes: int = 128) -> int:
    """Sub-chunk size (rows per sequential grid step of the chunked kernel).

    Bounds the worst-case lane spread a window must cover AND the
    kernel's VMEM footprint (work buffer + the full-buffer ladder rung's
    temporaries + double-buffered input/output blocks must fit 16 MB).
    Every VMEM buffer scales with ceil(lanes/128), so the DEFAULT scales
    inversely with the lane count (128 lanes -> 2048 rows, 256 -> 1024,
    ...) to keep the footprint constant; SDRM_CLOCK_CHUNK overrides —
    read lazily per call like the sibling knobs (SDRM_FIR_TILE_R,
    SDRM_CLOCK_SHIFT_MAX), so setting it after import works."""
    raw = os.environ.get("SDRM_CLOCK_CHUNK")
    if raw is None:
        lane_tiles = max(1, -(-int(lanes) // 128))
        val = max(SUFFIX, 2048 * 128 // (lane_tiles * 128) // 8 * 8)
    else:
        val = int(raw)
    if val % 8 != 0 or val < SUFFIX:
        raise ValueError(
            f"SDRM_CLOCK_CHUNK={val}: must be a multiple of 8 and >= {SUFFIX} "
            "(the carried suffix must fit one chunk)"
        )
    return val


def _clock_full_one(
    x_tm: jnp.ndarray,  # (cs, C)
    state: ClockFullState,
    *,
    omega,
    gain_omega,
    mu,
    gain_mu,
    omega_relative_limit,
    num_symbols,
    backend,
    interpret,
    tile=None,
):
    n, c = x_tm.shape
    sfx = state.suffix.shape[0]
    omega_mid = np.float32(omega)
    omega_lim = np.float32(omega_mid * np.float32(omega_relative_limit))
    if num_symbols is None:
        num_symbols = max_symbols(
            n + sfx, float(omega_mid), omega_relative_limit, gain_mu
        )

    work = jnp.concatenate([state.suffix, x_tm.astype(jnp.float32)], axis=0)
    w = n + sfx
    base_valid = jnp.full((c,), w, jnp.int32)
    ii0 = (jnp.int32(sfx) - state.resid.astype(jnp.int32)).astype(jnp.int32)

    overflowed = jnp.zeros((c,), jnp.float32)
    if backend == "pallas":
        from sdrmodem_tpu.ops.pallas_clock import clock_mm_tpu, full_tile

        def run(window_tile):
            outs, counts, fin = clock_mm_tpu(
                work,
                base_valid,
                state.omega,
                state.mu,
                state.last_sample,
                ii0=ii0,
                omega_mid=float(omega_mid),
                omega_relative_limit=omega_relative_limit,
                gain_omega=gain_omega,
                gain_mu=gain_mu,
                num_symbols=int(num_symbols),
                time_major=True,
                interpret=interpret,
                tile=window_tile,
            )
            return outs, counts, fin["ii"], fin["omega"], fin["mu"], fin[
                "last"
            ], fin["overflow"]

        first = run(tile)
        # self-healing overflow guard: a lane spread past the drift bound
        # of required_tile corrupts the windowed dot products — detect via
        # fin["overflow"] and re-run this chunk on the full-buffer window
        # (provably sufficient), matching the C loop's always-correct
        # contract (src/dsp/clock_recovery_mm.c:78-139)
        tripped = jnp.max(first[6]) > 0.0
        results = jax.lax.cond(
            tripped,
            lambda: run(full_tile(w, float(omega_mid)))[:6],
            lambda: first[:6],
        )
        outs, counts, ii_f, omega_f, mu_f, last_f = results
        overflowed = jnp.broadcast_to(tripped.astype(jnp.float32), (c,))
    else:
        def one(row, i0, mu_c, om_c, la_c):
            (ii_f, mu_f, om_f, la_f, count), outs = _mm_scan_core(
                row, jnp.int32(w), i0, mu_c, om_c, la_c,
                omega_mid=omega_mid, omega_lim=omega_lim,
                gain_omega=gain_omega, gain_mu=gain_mu,
                num_symbols=int(num_symbols),
            )
            return outs, count, ii_f, mu_f, om_f, la_f

        outs, counts, ii_f, mu_f, omega_f, last_f = jax.vmap(one)(
            work.T, ii0, state.mu, state.omega, state.last_sample
        )

    # negative resid = the final stride overshot the block end: the next
    # block starts its read pointer sfx - resid > sfx samples in (exact
    # continuation instead of the reference's rewind, see clock_mm_stream)
    resid = jnp.minimum(jnp.int32(w) - ii_f, sfx - 1)
    new_state = ClockFullState(
        omega_f, mu_f, last_f, work[-sfx:, :], resid.astype(jnp.int32),
        state.overflow + overflowed,
    )
    return outs, counts, new_state


def clock_mm_batched_pallas(
    x: jnp.ndarray,  # (C, N) float32
    n_valid: jnp.ndarray,  # (C,) int32
    state: ClockState,  # batched: leaves with leading (C,)
    *,
    omega: float,
    gain_omega: float,
    mu: float = 0.5,
    gain_mu: float = 0.0625,
    omega_relative_limit: float = 0.01,
    num_symbols: int | None = None,
    interpret: bool = False,
):
    """Batched M&M via the Pallas TPU kernel (all channels in one call).

    Same stream semantics / state hand-off as ``clock_mm_stream``; the
    interpolator bank is evaluated as Farrow polynomials (tap error <6e-7).
    """
    from sdrmodem_tpu.ops.pallas_clock import clock_mm_tpu

    c, n = x.shape
    cap = state.tail.shape[-1]  # capacity derives from omega (tail_cap_for)
    omega_mid = np.float32(omega)
    if num_symbols is None:
        num_symbols = max_symbols(n + cap, float(omega_mid), omega_relative_limit, gain_mu)

    # assemble [tail[:tail_len], x, zeros] per channel: two block copies
    # per channel instead of a gather (vmapped dynamic_update_slice)
    w = n + 2 * cap

    # tail_len < 0 encodes a skip into this block (see clock_mm_stream)
    tl = jnp.maximum(state.tail_len, 0)
    ii0 = jnp.maximum(-state.tail_len, 0).astype(jnp.int32)

    def assemble(tail, tail_len, row):
        buf = jnp.zeros((w,), jnp.float32)
        buf = jax.lax.dynamic_update_slice(buf, tail, (0,))
        return jax.lax.dynamic_update_slice(buf, row, (tail_len.astype(jnp.int32),))

    work = jax.vmap(assemble)(state.tail, tl, x.astype(jnp.float32))
    base_valid = tl + n_valid.astype(jnp.int32)
    work = jnp.where(jnp.arange(w)[None, :] < base_valid[:, None], work, 0.0)

    from sdrmodem_tpu.ops.pallas_clock import full_tile

    def run(window_tile):
        outs, counts, fin = clock_mm_tpu(
            work,
            base_valid,
            state.omega,
            state.mu,
            state.last_sample,
            ii0,
            omega_mid=float(omega_mid),
            omega_relative_limit=omega_relative_limit,
            gain_omega=gain_omega,
            gain_mu=gain_mu,
            num_symbols=int(num_symbols),
            interpret=interpret,
            tile=window_tile,
        )
        return outs, counts, fin

    first = run(None)
    # overflow guard: re-run on the provably sufficient full-buffer window
    # when lane positions spread past required_tile's drift bound
    outs, counts, fin = jax.lax.cond(
        jnp.max(first[2]["overflow"]) > 0.0,
        lambda: run(full_tile(w, float(omega_mid))),
        lambda: first,
    )

    last_index = jnp.minimum(fin["ii"], base_valid)
    tail_len = jnp.minimum(base_valid - fin["ii"], cap)
    start = jnp.clip(last_index, 0, w - cap).astype(jnp.int32)
    tail = jax.vmap(lambda row, s: jax.lax.dynamic_slice(row, (s,), (cap,)))(
        work, start
    )
    tail = jnp.where(
        jnp.arange(cap)[None, :] < jnp.maximum(tail_len, 0)[:, None], tail, 0.0
    )
    new_state = ClockState(
        fin["omega"], fin["mu"], fin["last"], tail, tail_len.astype(jnp.int32)
    )
    return outs, counts, new_state
