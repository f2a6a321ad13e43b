"""Gaussian/Laplacian image pyramids (cv2.pyrDown/pyrUp semantics).

Building block for the Ancuti multi-scale fusion strategy
(BASELINE.json config #4 — not present in the reference repo, added as a
first-class capability).  The 5-tap binomial kernel [1 4 6 4 1]/16 is
applied separably with REFLECT_101 borders, matching OpenCV's pyramid
filters; parity vs cv2.pyrDown/pyrUp is gated in tests/test_fusion.py.

All functions operate on single (H, W) float32 planes (channel-first
convention, see pipeline/six.py) and are shape-polymorphic over leading
batch dims.
"""

from __future__ import annotations

from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax import lax

_K5 = (1.0 / 16.0, 4.0 / 16.0, 6.0 / 16.0, 4.0 / 16.0, 1.0 / 16.0)


def _blur5_axis(x: jnp.ndarray, axis: int, scale: float = 1.0) -> jnp.ndarray:
    """Separable 5-tap binomial blur along one axis, REFLECT_101 border."""
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (2, 2)
    xp = jnp.pad(x, pad, mode="reflect")
    out = None
    for k, w in enumerate(_K5):
        term = lax.slice_in_dim(xp, k, k + n, axis=axis) * (w * scale)
        out = term if out is None else out + term
    return out


def blur5(x: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """5x5 binomial blur of (..., H, W); ``scale`` multiplies the kernel."""
    return _blur5_axis(_blur5_axis(x, x.ndim - 2, scale), x.ndim - 1)


def _even_cols(x: jnp.ndarray) -> jnp.ndarray:
    """x[..., ::2] without a lane-dim strided slice (which forces a slow
    relayout): pad to even width, split the lane dim in two, take slot 0."""
    W = x.shape[-1]
    if W % 2:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, 1)])
        W += 1
    return x.reshape(x.shape[:-1] + (W // 2, 2))[..., 0]


def _interleave_zeros(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """(..., n, ...) -> (..., 2n, ...) with zeros in the odd slots, via a
    stack+reshape (no strided scatter)."""
    z = jnp.zeros_like(x)
    out = jnp.stack([x, z], axis=axis + 1 if axis >= 0 else x.ndim + axis + 1)
    shape = list(x.shape)
    shape[axis] = shape[axis] * 2
    return out.reshape(shape)


def pyr_down(x: jnp.ndarray) -> jnp.ndarray:
    """cv2.pyrDown: blur then keep even rows/cols -> (..., ceil(H/2), ceil(W/2))."""
    b = blur5(x)
    return _even_cols(b[..., ::2, :])


def pyr_up(x: jnp.ndarray, dst_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv2.pyrUp with explicit dstsize: zero-interleave then blur with 4x kernel."""
    H, W = dst_hw
    up = _interleave_zeros(x, x.ndim - 2)
    up = _interleave_zeros(up, up.ndim - 1)
    up = up[..., :H, :W]
    return blur5(up, scale=4.0)


def gaussian_pyramid(x: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """[G0 (=x), G1, ..., G_{levels-1}], each pyr_down of the previous."""
    pyr = [x]
    for _ in range(levels - 1):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def laplacian_pyramid(x: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """[L0..L_{n-2}, G_{n-1}]: band-pass residuals plus the coarse top."""
    g = gaussian_pyramid(x, levels)
    lap = [
        g[i] - pyr_up(g[i + 1], g[i].shape[-2:])
        for i in range(levels - 1)
    ]
    lap.append(g[-1])
    return lap


def reconstruct(lap: List[jnp.ndarray]) -> jnp.ndarray:
    """Inverse of laplacian_pyramid: upsample-and-add from coarse to fine."""
    out = lap[-1]
    for lvl in reversed(lap[:-1]):
        out = lvl + pyr_up(out, lvl.shape[-2:])
    return out


@partial(jax.jit, static_argnames=("levels",))
def blend_pyramids(inputs: jnp.ndarray, weights: jnp.ndarray,
                   levels: int) -> jnp.ndarray:
    """Multi-scale fusion core: sum_k GaussPyr(W_k) * LapPyr(I_k), collapsed.

    inputs: (K, C, H, W) channel planes across K fusion inputs;
    weights: (K, H, W) normalized weight maps (sum_k == 1 per pixel), whose
    Gaussian pyramids are computed once and shared by all C channels.
    Returns (C, H, W).
    """
    K = inputs.shape[0]
    w_pyrs = [gaussian_pyramid(weights[k], levels) for k in range(K)]
    # one Laplacian pyramid per (input, channel) stack: the channel dim is a
    # leading batch axis for every pyramid op
    i_pyrs = [laplacian_pyramid(inputs[k], levels) for k in range(K)]
    fused: List[jnp.ndarray] = []
    for lvl in range(levels):
        acc = sum(w_pyrs[k][lvl][None] * i_pyrs[k][lvl] for k in range(K))
        fused.append(acc)
    return reconstruct(fused)
