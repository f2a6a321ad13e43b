"""Texture operators: uniform LBP and GLCM, skimage-compatible.

Used by the texture features (feature_extraction.py:79-120).  skimage is not
installed in this environment, so the spec below (and the numpy golden in
testing/golden_features.py) follows skimage's documented/Cython behavior:

- local_binary_pattern(gray_u8, P=8, R=1, method='uniform'):
  samples at (-R*sin(2*pi*k/P), R*cos(2*pi*k/P)) around each pixel with
  bilinear interpolation (exact pixels when within 1e-6 of integer offsets),
  out-of-bounds reads are 0 (cval=0), bit k set iff sample >= center;
  'uniform' label = popcount if transitions <= 2 else P+1 (10 labels).
  Feature histogram: 10 bins over [0, 10), density=True.

- graycomatrix(img, [1], [0, pi/4, pi/2, 3pi/4], levels=256,
  symmetric=True, normed=True): pair (r, c) with
  (r + round(sin(a)*d), c + round(cos(a)*d)); P += P.T; P /= P.sum().
  graycoprops: contrast, dissimilarity, homogeneity, energy, correlation,
  ASM with skimage's formulas (correlation -> 1 when either std < eps).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_SQRT2_INV = float(np.sqrt(2.0) / 2.0)


def _sample_shift(x: jnp.ndarray, dr: float, dc: float) -> jnp.ndarray:
    """Bilinearly sample x at (r+dr, c+dc) per pixel, 0 outside (cval=0)."""
    H, W = x.shape
    if abs(dr - round(dr)) < 1e-6 and abs(dc - round(dc)) < 1e-6:
        return _shift0(x, int(round(dr)), int(round(dc)))
    r0, c0 = int(np.floor(dr)), int(np.floor(dc))
    fr, fc = dr - r0, dc - c0
    s00 = _shift0(x, r0, c0)
    s01 = _shift0(x, r0, c0 + 1)
    s10 = _shift0(x, r0 + 1, c0)
    s11 = _shift0(x, r0 + 1, c0 + 1)
    # difference form: exactly s00 in flat regions regardless of FMA fusion
    # (the products form flips `sample >= center` ties under XLA fusion)
    return (s00 + fr * (s10 - s00) + fc * (s01 - s00)
            + fr * fc * (s11 - s10 - s01 + s00))


def _shift0(x: jnp.ndarray, dr: int, dc: int) -> jnp.ndarray:
    H, W = x.shape
    xp = jnp.pad(x, ((2, 2), (2, 2)))
    return jax.lax.dynamic_slice(xp, (2 + dr, 2 + dc), (H, W))


@jax.jit
def lbp_uniform_hist(gray_u8: jnp.ndarray) -> jnp.ndarray:
    """Uniform LBP (P=8, R=1) 10-bin density histogram of a (H, W) plane."""
    x = gray_u8.astype(jnp.float32)
    P = 8
    bits = []
    for k in range(P):
        angle = 2.0 * np.pi * k / P
        dr = -np.sin(angle)
        dc = np.cos(angle)
        # snap near-integer offsets like skimage
        dr = 0.0 if abs(dr) < 1e-9 else dr
        dc = 0.0 if abs(dc) < 1e-9 else dc
        sample = _sample_shift(x, float(dr), float(dc))
        bits.append((sample >= x).astype(jnp.int32))
    b = jnp.stack(bits)  # (8, H, W)
    ones = jnp.sum(b, axis=0)
    trans = jnp.sum(jnp.abs(b - jnp.roll(b, 1, axis=0)), axis=0)
    label = jnp.where(trans <= 2, ones, P + 1)  # 0..9
    bins = jnp.arange(P + 2, dtype=jnp.int32)
    hist = jnp.sum(label.reshape(-1)[None, :] == bins[:, None], axis=1)
    return hist.astype(jnp.float32) / (gray_u8.shape[0] * gray_u8.shape[1])


_GLCM_OFFSETS = ((0, 1), (1, 1), (1, 0), (1, -1))  # angles 0, pi/4, pi/2, 3pi/4


def _glcm_one(gray_u8: jnp.ndarray, dr: int, dc: int) -> jnp.ndarray:
    """Symmetric normalized 256x256 co-occurrence matrix for one offset."""
    H, W = gray_u8.shape
    r0 = max(0, -dr)
    r1 = H - max(0, dr)
    c0 = max(0, -dc)
    c1 = W - max(0, dc)
    a = gray_u8[r0:r1, c0:c1].reshape(-1)
    b = gray_u8[r0 + dr:r1 + dr, c0 + dc:c1 + dc].reshape(-1)
    idx = a * 256 + b
    p = jnp.zeros((65536,), jnp.float32).at[idx].add(1.0).reshape(256, 256)
    p = p + p.T
    return p / jnp.sum(p)


@jax.jit
def glcm_props(gray_u8: jnp.ndarray) -> jnp.ndarray:
    """graycoprops over 4 angles -> (6, 4): rows are contrast, dissimilarity,
    homogeneity, energy, correlation, ASM (skimage order as consumed at
    feature_extraction.py:115-118)."""
    i = jnp.arange(256, dtype=jnp.float32)[:, None]
    j = jnp.arange(256, dtype=jnp.float32)[None, :]
    diff = i - j
    outs = []
    for dr, dc in _GLCM_OFFSETS:
        p = _glcm_one(gray_u8, dr, dc)
        contrast = jnp.sum(p * diff**2)
        dissim = jnp.sum(p * jnp.abs(diff))
        homog = jnp.sum(p / (1.0 + diff**2))
        asm = jnp.sum(p * p)
        energy = jnp.sqrt(asm)
        mu_i = jnp.sum(p * i)
        mu_j = jnp.sum(p * j)
        s_i = jnp.sqrt(jnp.sum(p * (i - mu_i) ** 2))
        s_j = jnp.sqrt(jnp.sum(p * (j - mu_j) ** 2))
        corr = jnp.where(
            (s_i < 1e-15) | (s_j < 1e-15),
            1.0,
            jnp.sum(p * (i - mu_i) * (j - mu_j)) / (s_i * s_j),
        )
        outs.append(jnp.stack([contrast, dissim, homog, energy, corr, asm]))
    return jnp.stack(outs, axis=1)  # (6, 4)
