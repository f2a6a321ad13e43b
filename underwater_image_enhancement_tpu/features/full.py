"""The 79-dimensional hand-crafted feature vector — one jitted program.

Reproduces feature_extraction.py:16-297 exactly (the happy path; the
reference's silent try/except feature-group dropping is NOT reproduced —
SURVEY.md F6):

  F1 color   (35): LAB u8 float stats (mean/std/skew/kurt x3), HSV u8 raw
                   (mean/std x3), color-cast block (CCF, M, D, mean_a,
                   mean_b), RGB float stats (mean/std/min/max x3)
  F2 texture (22): uniform LBP (P=8, R=1) 10-bin density hist + GLCM on the
                   128x128 resize (6 props x mean/std over 4 angles)
  F3 freq    (5) : DCT band energies (low/mid/high) + mean/std |DCT|
  F4 edges   (7) : Sobel mag mean/std/max, Canny density, Laplacian(k3)
                   abs-mean/std/var
  F5 quality (10): gray std, entropy, mean/median/p25/p75, dynamic range,
                   saturation mean/std, RMS contrast

scipy.stats skew/kurtosis conventions: biased moments, Fisher kurtosis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from underwater_image_enhancement_tpu.ops import colorspace as cs
from underwater_image_enhancement_tpu.ops import stretch
from underwater_image_enhancement_tpu.ops.dct import dct2
from underwater_image_enhancement_tpu.ops.edges import canny_u8, laplacian, sobel
from underwater_image_enhancement_tpu.ops.resize import resize_u8
from underwater_image_enhancement_tpu.ops.texture import glcm_props, lbp_uniform_hist

FEATURE_DIM = 79


def _skew(x):
    m = jnp.mean(x)
    m2 = jnp.mean((x - m) ** 2)
    m3 = jnp.mean((x - m) ** 3)
    return jnp.where(m2 > 0, m3 / jnp.maximum(m2, 1e-30) ** 1.5, 0.0)


def _kurtosis(x):
    m = jnp.mean(x)
    m2 = jnp.mean((x - m) ** 2)
    m4 = jnp.mean((x - m) ** 4)
    return jnp.where(m2 > 0, m4 / jnp.maximum(m2, 1e-30) ** 2 - 3.0, -3.0)


def _color_features(img, lab_f, hsv_f):
    """feature_extraction.py:16-77 (35 dims)."""
    feats = []
    for c in range(3):
        ch = lab_f[..., c].reshape(-1)
        feats += [jnp.mean(ch), jnp.std(ch), _skew(ch), _kurtosis(ch)]
    for c in range(3):
        ch = hsv_f[..., c].reshape(-1)
        feats += [jnp.mean(ch), jnp.std(ch)]
    a = lab_f[..., 1]
    b = lab_f[..., 2]
    mean_a = jnp.mean(a)
    mean_b = jnp.mean(b)
    M = jnp.sqrt(mean_a**2 + mean_b**2)
    Da = jnp.mean(jnp.abs(a - mean_a))
    Db = jnp.mean(jnp.abs(b - mean_b))
    D = jnp.sqrt(Da**2 + Db**2)
    feats += [M / (D + 1e-10), M, D, mean_a, mean_b]
    for c in range(3):
        ch = img[..., c].reshape(-1)
        feats += [jnp.mean(ch), jnp.std(ch), jnp.min(ch), jnp.max(ch)]
    return feats


def _texture_features(gray_u8):
    """feature_extraction.py:79-120 (22 dims)."""
    lbp_hist = lbp_uniform_hist(gray_u8)
    reduced = resize_u8(gray_u8, 128, 128)
    props = glcm_props(reduced)  # (6, 4)
    feats = [lbp_hist[i] for i in range(10)]
    for p in range(6):
        feats += [jnp.mean(props[p]), jnp.std(props[p])]
    return feats


def _frequency_features(gray255_f, fast: bool = False):
    """feature_extraction.py:122-158 (5 dims).  gray255_f: u8 gray as f32."""
    d = dct2(gray255_f, precision="default" if fast else "highest")
    H, W = d.shape
    total = jnp.sum(d**2)
    low = jnp.sum(d[: H // 4, : W // 4] ** 2) / total
    mid = jnp.sum(d[H // 4:H // 2, W // 4:W // 2] ** 2) / total
    high = jnp.sum(d[H // 2:, W // 2:] ** 2) / total
    ad = jnp.abs(d)
    return [low, mid, high, jnp.mean(ad), jnp.std(ad)]


def _edge_features(gray_unit_f, gray_u8):
    """feature_extraction.py:160-200 (7 dims)."""
    gx = sobel(gray_unit_f, "x")
    gy = sobel(gray_unit_f, "y")
    mag = jnp.sqrt(gx**2 + gy**2)
    edges = canny_u8(gray_u8, 50, 150)
    lap = laplacian(gray_u8.astype(jnp.float32), ksize=3)
    return [
        jnp.mean(mag), jnp.std(mag), jnp.max(mag),
        jnp.mean(edges.astype(jnp.float32)),
        jnp.mean(jnp.abs(lap)), jnp.std(lap), jnp.var(lap),
    ]


from underwater_image_enhancement_tpu.ops.histeq import shannon_entropy_u8 as _entropy_u8


def _quality_features(gray_unit_f, gray_u8, hsv_unit_s):
    """feature_extraction.py:202-246 (10 dims)."""
    g = gray_unit_f.reshape(-1)
    mean = jnp.mean(g)
    # one shared O(n) radix select instead of jnp.percentile's full sort
    # (the sort was the single largest remaining op in the Phase-1 label
    # program trace); identical order statistics, ops/stretch notes
    p50, p25, p75 = stretch.percentiles_radix(g, (50.0, 25.0, 75.0))
    return [
        jnp.std(g),
        _entropy_u8(gray_u8),
        mean,
        p50,
        p25,
        p75,
        jnp.max(g) - jnp.min(g),
        jnp.mean(hsv_unit_s),
        jnp.std(hsv_unit_s),
        jnp.sqrt(jnp.mean((g - mean) ** 2)),
    ]


from functools import partial as _partial


@_partial(jax.jit, static_argnames=("fast",))
def extract_all_features(img: jnp.ndarray, fast: bool = False) -> jnp.ndarray:
    """(H, W, 3) float [0,1] -> (79,) float32 feature vector.

    fast=True is the throughput labeling tier's variant: the LAB stats use
    the fused arithmetic conversion (±2 LSB of the exact integer pipeline —
    no table-gather kernels) and the DCT runs at default (bf16-input) MXU
    precision.  Classifier features only — the exact tier stays default."""
    u8 = cs.quantize_u8(img)
    if fast:
        lab_f = cs.rgb_to_lab_u8_arith(u8)
    else:
        lab_f = cs.rgb_to_lab_u8_exact(u8).astype(jnp.float32)
    hsv_u8 = cs.rgb_to_hsv_u8(u8)
    hsv_f = hsv_u8.astype(jnp.float32)
    gray_u8 = cs.rgb_to_gray_u8(u8)
    gray_unit = cs.u8_to_unit(gray_u8)
    gray255 = gray_u8.astype(jnp.float32)
    hsv_unit_s = hsv_f[..., 1] / 255.0

    feats = (
        _color_features(img, lab_f, hsv_f)
        + _texture_features(gray_u8)
        + _frequency_features(gray255, fast)
        + _edge_features(gray_unit, gray_u8)
        + _quality_features(gray_unit, gray_u8, hsv_unit_s)
    )
    return jnp.stack(feats).astype(jnp.float32)


@_partial(jax.jit, static_argnames=("fast",))
def extract_batch(imgs: jnp.ndarray, fast: bool = False) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, 79)."""
    return jax.vmap(lambda im: extract_all_features(im, fast))(imgs)
