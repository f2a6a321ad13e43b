"""Color-space conversions with OpenCV-compatible semantics, in pure JAX.

The reference project round-trips through OpenCV's uint8 conversions everywhere
(e.g. ``cv2.cvtColor((img*255).astype(np.uint8), cv2.COLOR_RGB2GRAY)`` at
enhancement_strategies.py:180, quality_assessment.py:25, RGB2LAB at
enhancement_strategies.py:299, RGB2HSV at quality_assessment.py:88).  To hit
bit-close parity, this module reproduces OpenCV's quantized conversions:

- ``rgb_to_gray_u8``: bit-exact vs cv2 5.x (fixed-point, shift 15).
- ``rgb_to_hsv_u8`` / ``rgb_to_lab_u8`` / ``lab_to_rgb_u8``: float math with
  OpenCV's formulas (sRGB companding for LAB, H in [0,180)) and final
  rounding; differs from cv2's fixed-point tables by <=2 LSB on rare pixels.

Integer images are carried as int32 (TPU-friendly; uint8 compute is not).
All functions are shape-polymorphic over leading batch dims: they operate on
the trailing channel dim only, so (H,W,3) and (B,H,W,3) both work.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# sRGB -> XYZ (D65) matrix and white point, as used by OpenCV.
_RGB2XYZ_NP = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=np.float64,
)
_RGB2XYZ = jnp.asarray(_RGB2XYZ_NP, dtype=jnp.float32)
_XYZ2RGB = jnp.asarray(np.linalg.inv(_RGB2XYZ_NP), dtype=jnp.float32)
_WHITE = jnp.array([0.950456, 1.0, 1.088754], dtype=jnp.float32)

# cv2 5.x RGB2GRAY fixed-point weights (shift 15), empirically bit-exact.
_GRAY_SHIFT = 15
_R2Y = 9798
_G2Y = 19235
_B2Y = 32768 - _R2Y - _G2Y  # 3735


def quantize_u8(img: jnp.ndarray) -> jnp.ndarray:
    """``(img * 255).astype(np.uint8)`` — the reference's float->u8 step.

    Note numpy's ``astype(uint8)`` truncates toward zero (no rounding); the
    reference relies on this everywhere, so we floor, not round.
    Returns int32 values in [0, 255].
    """
    return jnp.clip(img * 255.0, 0.0, 255.0).astype(jnp.int32)


def u8_to_unit(img_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8-valued int array -> float32 in [0, 1]."""
    return img_u8.astype(jnp.float32) / 255.0


def rgb_to_gray_u8(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """cv2.COLOR_RGB2GRAY on uint8 input, bit-exact (fixed point, shift 15).

    rgb_u8: (..., 3) int32 in [0,255].  Returns (...,) int32 in [0,255].
    """
    r = rgb_u8[..., 0]
    g = rgb_u8[..., 1]
    b = rgb_u8[..., 2]
    acc = r * _R2Y + g * _G2Y + b * _B2Y + (1 << (_GRAY_SHIFT - 1))
    return acc >> _GRAY_SHIFT


def rgb_to_gray_f32(rgb: jnp.ndarray) -> jnp.ndarray:
    """cv2.COLOR_RGB2GRAY float path: 0.299 R + 0.587 G + 0.114 B."""
    return 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]


def unit_to_gray_unit(img: jnp.ndarray) -> jnp.ndarray:
    """The reference's ubiquitous ``cvtColor((img*255).u8, RGB2GRAY)/255``.

    (quality_assessment.py:25,46,68; feature_extraction.py:90; etc.)
    Returns float32 gray in [0,1] quantized to the uint8 grid.
    """
    return u8_to_unit(rgb_to_gray_u8(quantize_u8(img)))


def rgb_to_hsv_u8(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """cv2.COLOR_RGB2HSV on uint8: H in [0,180), S,V in [0,255].

    Float math + rounding; <=1 LSB from cv2's fixed-point tables on ~2% of
    pixels (cv2 uses truncated division tables).
    """
    rgb = rgb_u8.astype(jnp.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    safe_diff = jnp.where(diff == 0, 1.0, diff)
    safe_v = jnp.where(v == 0, 1.0, v)

    s = jnp.where(v == 0, 0.0, jnp.round(255.0 * diff / safe_v))
    # cv2 selects the first channel equal to the max, in order r, g, b.
    term = jnp.where(
        v == r,
        g - b,
        jnp.where(v == g, b - r + 2.0 * diff, r - g + 4.0 * diff),
    )
    h = jnp.where(diff == 0, 0.0, jnp.round(30.0 * term / safe_diff))
    h = jnp.where(h < 0, h + 180.0, h)
    return jnp.stack([h, s, v], axis=-1).astype(jnp.int32)


def _srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.maximum(c, 0.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)


def _lab_f(t: jnp.ndarray) -> jnp.ndarray:
    d = 6.0 / 29.0
    return jnp.where(t > d**3, jnp.cbrt(t), t / (3.0 * d * d) + 4.0 / 29.0)


def _lab_f_inv(ft: jnp.ndarray) -> jnp.ndarray:
    d = 6.0 / 29.0
    return jnp.where(ft > d, ft**3, 3.0 * d * d * (ft - 4.0 / 29.0))


def rgb_to_lab_u8(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """cv2.COLOR_RGB2LAB on uint8 (sRGB companding, D65).

    Output int32: L in [0,255] (L*255/100), a,b offset by +128.
    Within ~2 LSB of cv2's table-based fixed point implementation.
    """
    rgb = rgb_u8.astype(jnp.float32) / 255.0
    lin = _srgb_to_linear(rgb)
    xyz = jnp.einsum("...c,kc->...k", lin, _RGB2XYZ) / _WHITE
    fxyz = _lab_f(xyz)
    L = 116.0 * fxyz[..., 1] - 16.0
    a = 500.0 * (fxyz[..., 0] - fxyz[..., 1])
    b = 200.0 * (fxyz[..., 1] - fxyz[..., 2])
    out = jnp.stack([L * 255.0 / 100.0, a + 128.0, b + 128.0], axis=-1)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.int32)


def lab_to_rgb_u8(lab_u8: jnp.ndarray) -> jnp.ndarray:
    """cv2.COLOR_LAB2RGB on uint8 (inverse of rgb_to_lab_u8)."""
    lab = lab_u8.astype(jnp.float32)
    L = lab[..., 0] * 100.0 / 255.0
    a = lab[..., 1] - 128.0
    b = lab[..., 2] - 128.0
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    xyz = jnp.stack([_lab_f_inv(fx), _lab_f_inv(fy), _lab_f_inv(fz)], axis=-1)
    xyz = xyz * _WHITE
    lin = jnp.einsum("...c,kc->...k", xyz, _XYZ2RGB)
    srgb = _linear_to_srgb(lin)
    return jnp.clip(jnp.round(srgb * 255.0), 0, 255).astype(jnp.int32)


def rgb_to_hsv_f32(rgb: jnp.ndarray) -> jnp.ndarray:
    """cv2.COLOR_RGB2HSV on float input: H in [0,360), S,V in [0,1]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    safe_diff = jnp.where(diff == 0, 1.0, diff)
    safe_v = jnp.where(v == 0, 1.0, v)
    s = jnp.where(v == 0, 0.0, diff / safe_v)
    term = jnp.where(
        v == r,
        g - b,
        jnp.where(v == g, b - r + 2.0 * diff, r - g + 4.0 * diff),
    )
    h = jnp.where(diff == 0, 0.0, 60.0 * term / safe_diff)
    h = jnp.where(h < 0, h + 360.0, h)
    return jnp.stack([h, s, v], axis=-1)
