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


def _frac_f32(dst: int, src: int):
    """cv2's source coordinate: ``(float)((dx+0.5)*scale - 0.5)`` — the
    inner product in double, CAST TO FLOAT32 before floor/frac (resize.cpp).
    Reproducing the f32 rounding is required for bit-exactness: in f64 the
    2048-scaled coefficients flip on ~0.1% of rows/cols of strong
    downscales."""
    scale = src / dst
    f = ((np.arange(dst) + 0.5) * scale - 0.5).astype(np.float32)
    s = np.floor(f).astype(np.int64)
    frac = f - s.astype(np.float32)
    return s, frac


def _quant11(frac):
    """float32 (1-f)*2048 / f*2048, cvRound (round-half-even)."""
    one = np.float32(1.0)
    sc = np.float32(2048.0)
    a0 = np.rint(((one - frac) * sc).astype(np.float32)).astype(np.int32)
    a1 = np.rint((frac * sc).astype(np.float32)).astype(np.int32)
    return a0, a1


def _fixed_coeffs(dst: int, src: int):
    """cv2 8U INTER_LINEAR horizontal fixed-point (2^11) coefficients.

    Border columns collapse to a single full-weight tap (fx reset to 0/1
    with the index clamped into range) — cv2's HResize xmax machinery."""
    if src == 1:
        # degenerate 1-px source: pure replication (min(s, src-2) would
        # yield -1 and wrap the second tap to the last column)
        z = np.zeros(dst, np.int32)
        return z, np.full(dst, 2048, np.int32), z.copy()
    s, frac = _frac_f32(dst, src)
    frac = np.where(s < 0, np.float32(0.0), frac)
    s = np.maximum(s, 0)
    frac = np.where(s >= src - 1, np.float32(1.0), frac)
    s = np.minimum(s, src - 2)
    a0, a1 = _quant11(frac)
    return s.astype(np.int32), a0, a1


def _fixed_coeffs_v(dst: int, src: int):
    """cv2 8U INTER_LINEAR VERTICAL coefficients: row indices are clamped
    into range (border replicate, resizeGeneric_'s srows lookup) but the
    betas KEEP their fractional values — both taps of a border row read the
    same source row with split coefficients, whose two separate >>16
    truncations differ from a single full-weight tap.  (Discovered
    empirically vs cv2 5.0; using single-tap borders here left ~0.2% of
    border-row pixels 1-off.)"""
    s, frac = _frac_f32(dst, src)
    s0 = np.clip(s, 0, src - 1).astype(np.int32)
    s1 = np.clip(s + 1, 0, src - 1).astype(np.int32)
    a0, a1 = _quant11(frac)
    return s0, s1, a0, a1


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def resize_u8(img_u8: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """cv2.resize INTER_LINEAR on uint8, BIT-EXACT fixed-point emulation.

    Horizontal pass in int32 (coeff scale 2^11, single-tap borders),
    vertical pass with cv2's 8U descale ((b*(t>>4))>>16 summed, +2, >>2 —
    the scalar tail in cv2 replicates the SIMD arithmetic, so one formula
    covers every column) and clamped-row/fractional-beta borders
    (_fixed_coeffs_v)."""
    H, W = img_u8.shape
    sx, ax0, ax1 = _fixed_coeffs(out_w, W)
    sy0, sy1, ay0, ay1 = _fixed_coeffs_v(out_h, H)
    s = img_u8.astype(jnp.int32)
    rp = s[:, sx] * ax0[None, :] + s[:, sx + 1] * ax1[None, :]  # (H, out_w)
    r0 = rp[sy0, :]
    r1 = rp[sy1, :]
    ay0c = jnp.asarray(ay0)[:, None]
    ay1c = jnp.asarray(ay1)[:, None]
    simd = (((ay0c * (r0 >> 4)) >> 16) + ((ay1c * (r1 >> 4)) >> 16) + 2) >> 2
    return jnp.clip(simd, 0, 255)
