"""Ancuti-style multi-scale fusion enhancement (BASELINE.json config #4).

Not present in the reference repo — added as a first-class strategy:
``ancuti_fusion(img)`` follows Ancuti et al., "Enhancing Underwater Images
and Videos by Fusion" (CVPR 2012):

1. Input 1: gray-world white balance of the image (channel means equalized
   to the global luminance mean) — the reference's WB is a percentile
   stretch (six_stadigy.py:210-219); the channel-mean-scaling form named by
   BASELINE config #1 lives here as ``gray_world_wb``.
2. Input 2: CLAHE (LAB-L, the bit-exact cv2 kernel) of input 1.
3. Per-input weight maps: Laplacian contrast, per-pixel RGB saturation, and
   Achanta-style saliency (|| blur(Lab) - mean(Lab) ||); normalized with a
   +0.1 regularizer.
4. Multi-scale blend: Gaussian pyramid of the weights x Laplacian pyramid
   of the inputs, collapsed (ops/pyramid.py).

Gated >= 50 dB against a float64 numpy oracle (testing/golden_fusion.py)
in tests/test_fusion.py.  Channel-first internally like the other
pipelines.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from underwater_image_enhancement_tpu.ops import pyramid
from underwater_image_enhancement_tpu.ops.edges import laplacian
from underwater_image_enhancement_tpu.ops.histeq import clahe_enhancement_planes

_W_EPS = 0.1  # Ancuti's weight regularizer delta


def gray_world_wb_planes(p: Tuple[jnp.ndarray, ...]):
    """Gray-world white balance: scale each channel so its mean matches the
    mean of the channel means; clipped to [0, 1]."""
    means = [jnp.mean(c) for c in p]
    target = (means[0] + means[1] + means[2]) / 3.0
    return tuple(
        jnp.clip(c * (target / jnp.maximum(m, 1e-6)), 0.0, 1.0)
        for c, m in zip(p, means)
    )


def gray_world_wb(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) [0,1] -> gray-world balanced image."""
    out = gray_world_wb_planes(tuple(img[..., c] for c in range(3)))
    return jnp.stack(out, axis=-1)


def _lab_float(p):
    """Continuous (float) Lab from [0,1] RGB planes: L in [0,100], a/b ~0."""
    from underwater_image_enhancement_tpu.ops.colorspace import (
        _RGB2XYZ_NP,
        _lab_f,
        _srgb_to_linear,
    )

    lin = [_srgb_to_linear(c) for c in p]
    white = (0.950456, 1.0, 1.088754)
    f = []
    for row in range(3):
        xyz = (lin[0] * float(_RGB2XYZ_NP[row, 0])
               + lin[1] * float(_RGB2XYZ_NP[row, 1])
               + lin[2] * float(_RGB2XYZ_NP[row, 2])) / white[row]
        f.append(_lab_f(xyz))
    L = 116.0 * f[1] - 16.0
    a = 500.0 * (f[0] - f[1])
    b = 200.0 * (f[1] - f[2])
    return L, a, b


def _weight_maps(p):
    """Laplacian-contrast + saturation + saliency weights for one input."""
    lum = 0.299 * p[0] + 0.587 * p[1] + 0.114 * p[2]
    w_contrast = jnp.abs(laplacian(lum, ksize=1))
    w_sat = jnp.sqrt(((p[0] - lum) ** 2 + (p[1] - lum) ** 2
                      + (p[2] - lum) ** 2) / 3.0)
    L, a, b = _lab_float(p)
    Lb = pyramid.blur5(L)
    ab_ = pyramid.blur5(a)
    bb = pyramid.blur5(b)
    w_sal = jnp.sqrt((Lb - jnp.mean(L)) ** 2 + (ab_ - jnp.mean(a)) ** 2
                     + (bb - jnp.mean(b)) ** 2)
    # saliency lives on a [0,100]-ish scale; normalize to [0,1] magnitude
    return w_contrast + w_sat + w_sal / 100.0


def _fusion_levels(H: int, W: int) -> int:
    levels = 1
    while min(H, W) >> levels >= 16 and levels < 5:
        levels += 1
    return levels


@jax.jit
def ancuti_fusion(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) or (B, H, W, 3) [0,1] -> fused enhancement."""
    if img.ndim == 4:
        return jax.vmap(ancuti_fusion)(img)
    from underwater_image_enhancement_tpu.ops.layout import split_planes

    p = split_planes(img)
    wb = gray_world_wb_planes(p)
    cl = clahe_enhancement_planes(wb, 2.0, 8, 8)

    w1 = _weight_maps(wb)
    w2 = _weight_maps(cl)
    norm = w1 + w2 + 2.0 * _W_EPS
    w1n = (w1 + _W_EPS) / norm
    w2n = (w2 + _W_EPS) / norm

    H, W = p[0].shape
    levels = _fusion_levels(H, W)
    weights = jnp.stack([w1n, w2n])
    inputs = jnp.stack([jnp.stack(wb), jnp.stack(cl)])  # (K=2, C=3, H, W)
    fused = pyramid.blend_pyramids(inputs, weights, levels)  # (3, H, W)
    return jnp.clip(jnp.moveaxis(fused, 0, -1), 0.0, 1.0)
