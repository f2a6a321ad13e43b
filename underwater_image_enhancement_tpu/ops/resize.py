"""Bilinear resize with cv2.resize(INTER_LINEAR) coordinate semantics.

Used by the GLCM feature path (feature_extraction.py:104 resizes gray u8 to
128x128) and the model input pipeline (vgg_16_UIE.py:342, use_trained_model
py:41).  Sampling: src = (dst + 0.5) * scale - 0.5, clamped, float weights.
cv2's 8U path quantizes weights to 2^-11 fixed point, so u8 outputs can
differ by 1 LSB on a small fraction of pixels; float outputs match to fp32
precision.  Implemented as two separable matmuls (MXU-friendly: the
interpolation matrices are dense (dst, src) operators).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _interp_matrix(dst: int, src: int) -> np.ndarray:
    """(dst, src) row-interpolation operator, cv2 INTER_LINEAR mapping."""
    scale = src / dst
    x = (np.arange(dst) + 0.5) * scale - 0.5
    x0 = np.floor(x).astype(np.int64)
    frac = x - x0
    x0c = np.clip(x0, 0, src - 1)
    x1c = np.clip(x0 + 1, 0, src - 1)
    m = np.zeros((dst, src), np.float32)
    m[np.arange(dst), x0c] += (1.0 - frac).astype(np.float32)
    m[np.arange(dst), x1c] += frac.astype(np.float32)
    return m


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """(H, W) or (H, W, C) float -> (out_h, out_w[, C]), cv2 INTER_LINEAR."""
    H, W = img.shape[0], img.shape[1]
    mh = jnp.asarray(_interp_matrix(out_h, H))
    mw = jnp.asarray(_interp_matrix(out_w, W))
    hp = jax.lax.Precision.HIGHEST
    if img.ndim == 2:
        return mh @ img @ mw.T
    out = jnp.einsum("hH,HWc,wW->hwc", mh, img, mw, precision=hp)
    return out


def _fixed_coeffs(dst: int, src: int):
    """cv2 8U INTER_LINEAR fixed-point (2^11) coefficients + source indices."""
    scale = src / dst
    f = (np.arange(dst) + 0.5) * scale - 0.5
    s = np.floor(f).astype(np.int64)
    f = f - s
    f = np.where(s < 0, 0.0, f)
    s = np.maximum(s, 0)
    f = np.where(s >= src - 1, 1.0, f)
    s = np.minimum(s, src - 2)
    a0 = np.rint((1.0 - f) * 2048).astype(np.int32)
    a1 = np.rint(f * 2048).astype(np.int32)
    return s.astype(np.int32), a0, a1


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_u8(img_u8: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv2.resize INTER_LINEAR on uint8, fixed-point emulation.

    Horizontal pass in int32 (coeff scale 2^11), vertical pass with cv2's
    SIMD descale ((b*(t>>4))>>16 summed, +2, >>2); rows whose vertical
    weight collapses to a single source row keep the full-precision rounded
    descale.  Matches cv2 exactly except ~0.2% of border-row pixels on some
    shapes (cv2's border rows take an internal truncating path we don't
    fully replicate); all interior pixels are bit-exact."""
    H, W = img_u8.shape
    sx, ax0, ax1 = _fixed_coeffs(out_w, W)
    sy, ay0, ay1 = _fixed_coeffs(out_h, H)
    s = img_u8.astype(jnp.int32)
    rp = s[:, sx] * ax0[None, :] + s[:, sx + 1] * ax1[None, :]  # (H, out_w)
    r0 = rp[sy, :]
    r1 = rp[sy + 1, :]
    ay0c = jnp.asarray(ay0)[:, None]
    ay1c = jnp.asarray(ay1)[:, None]
    t0 = r0 >> 4
    t1 = r1 >> 4
    simd = (((ay0c * t0) >> 16) + ((ay1c * t1) >> 16) + 2) >> 2
    scalar = (r0 * ay0c + r1 * ay1c + (1 << 21)) >> 22
    border = jnp.asarray((ay1 == 0) | (ay0 == 0))[:, None]
    return jnp.clip(jnp.where(border, scalar, simd), 0, 255)
