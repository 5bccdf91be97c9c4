"""Decimating / interpolating FIR filtering as batched XLA convolutions.

Stream semantics (chunk-size invariant, proven by the reference's
big/small-buffer tests) of the reference FIR
(src/dsp/fir_filter.c:93-144): with X' = [taps_len-1 zeros, stream],

    y[k] = sum_j X'[k*decimation + j] * taps[taps_len-1-j]

i.e. a plain strided convolution of the zero-pre-padded stream with the
taps.  The C implementation carries a (taps_len-1)-sample history between
calls; here the whole-stream transform is a single
``lax.conv_general_dilated`` (batched over channels).  Streaming state
(the carried history) is handled by ``sdrmodem_tpu.dsp.streaming``.

The interpolating (polyphase) FIR of src/dsp/interp_fir_filter.c:75-154
is expressed as a single convolution producing ``interpolation`` output
features per input step:  y[n*I + i] = sum_m x[n-m] * h[m*I + i].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: int,
    left_pad: int,
    *,
    exact: bool = False,
) -> jnp.ndarray:
    """Batched 1-D correlation.  x: (B, N) float32, kernel: (T,) or (O, T).

    Returns (B, O, M) with
    out[b, o, k] = sum_j x_pad[b, k*stride + j] * kernel[o, j],
    where x is padded with ``left_pad`` zeros on the left.

    ``exact=True`` accumulates in float64 and rounds the result to float32:
    a canonical deterministic dot product, independent of how the backend
    partitions the reduction.  This is the parity mode used to match the
    reference's golden fixtures (the M&M feedback loop downstream is
    chaotic w.r.t. 1-ulp differences, like the reference's own
    VOLK_GENERIC + fixed-alignment golden policy).  ``exact=False`` is the
    fast float32 production path.
    """
    if kernel.ndim == 1:
        kernel = kernel[None, :]
    dtype = jnp.float64 if exact else jnp.float32
    lhs = x.astype(dtype)[:, None, :]  # (B, 1, N)
    rhs = kernel.astype(dtype)[:, None, :]  # (O, 1, T)
    out = jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(stride,),
        padding=[(left_pad, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=dtype,
    )
    return out.astype(jnp.float32)


def fir_stream(
    x: jnp.ndarray,
    taps: jnp.ndarray,
    decimation: int = 1,
    *,
    history: bool = True,
    exact: bool = False,
) -> jnp.ndarray:
    """Decimating FIR over a whole stream, float or complex input.

    x: (..., N) float32 or complex64; taps: (T,) float32 (natural order, as
    designed).

    With ``history=True`` (fresh-filter semantics) the stream is pre-padded
    with T-1 zeros and the output length is ceil(N / decimation), matching
    the reference's produced count from a zeroed history buffer.  With
    ``history=False`` the first output's window starts at x[0] (used by the
    streaming runner, which prepends carried history itself).
    """
    taps = jnp.asarray(taps, jnp.float32)
    rev = taps[::-1]
    t = taps.shape[0]
    left_pad = t - 1 if history else 0
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    if jnp.iscomplexobj(x):
        # real taps: filter I and Q independently through the batch dim
        flat = jnp.concatenate(
            [jnp.real(x).reshape(-1, n), jnp.imag(x).reshape(-1, n)], axis=0
        )
        out = conv1d(flat, rev, decimation, left_pad, exact=exact)[:, 0, :]
        half = out.shape[0] // 2
        y = jax.lax.complex(out[:half], out[half:])
        return y.reshape(*batch_shape, -1)
    flat = x.reshape(-1, n).astype(jnp.float32)
    out = conv1d(flat, rev, decimation, left_pad, exact=exact)[:, 0, :]
    return out.reshape(*batch_shape, -1)


def interp_fir_stream(x: jnp.ndarray, taps: np.ndarray, interpolation: int) -> jnp.ndarray:
    """Interpolating polyphase FIR over a whole stream.

    x: (..., N) float32; taps: (T,) float32; output (..., N*interpolation)
    with y[n*I + i] = sum_m x[n-m] * taps[m*I + i] (zero initial history),
    matching reference src/dsp/interp_fir_filter.c:139-154.
    """
    taps = np.asarray(taps, np.float32)
    ii = int(interpolation)
    pad = (-len(taps)) % ii
    if pad:
        taps = np.concatenate([taps, np.zeros(pad, np.float32)])
    k = len(taps) // ii
    # kernel[i, m] = taps[(K-1-m)*I + i]  -> correlation over left-padded x
    kernel = jnp.asarray(taps.reshape(k, ii)[::-1].T.copy())  # (I, K)
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    flat = x.reshape(-1, n).astype(jnp.float32)
    out = conv1d(flat, kernel, 1, k - 1)  # (B, I, N)
    y = jnp.swapaxes(out, 1, 2).reshape(-1, n * ii)  # interleave phases
    return y.reshape(*batch_shape, n * ii)
