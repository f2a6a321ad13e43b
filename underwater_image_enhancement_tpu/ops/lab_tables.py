"""OpenCV RGB2Lab_b integer pipeline tables (numpy, shared by TPU + golden).

Empirically verified bit-exact against cv2 5.0 over 327k probes
(docs/lab_bitexact_notes.md).  The cbrt table MUST be built in float32 to
match OpenCV's softfloat table init.
"""

from __future__ import annotations

import numpy as np

LAB_SHIFT = 12
LAB_SHIFT2 = 15
GAMMA_SCALE = 2040  # 255 * 8
NCBRT = 3072        # 256 * 3/2 * 8

_M_RGB2XYZ = np.array(
    [[0.412453, 0.357580, 0.180423],
     [0.212671, 0.715160, 0.072169],
     [0.019334, 0.119193, 0.950227]])
_WHITE_D65 = np.array([0.950456, 1.0, 1.088754])


def _build_gamma_tab() -> np.ndarray:
    x = np.arange(256) / 255.0
    lin = np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)
    return np.round(lin * GAMMA_SCALE).astype(np.int32)


def _build_cbrt_tab() -> np.ndarray:
    f32 = np.float32
    t = (np.arange(NCBRT) / f32(GAMMA_SCALE)).astype(f32)
    f = np.where(t < f32(0.008856),
                 t * f32(7.787) + f32(16.0 / 116.0),
                 np.cbrt(t.astype(f32)).astype(f32))
    return np.round((f * f32(1 << LAB_SHIFT2)).astype(f32)).astype(np.int32)


GAMMA_TAB = _build_gamma_tab()          # (256,) 0..2040
CBRT_TAB = _build_cbrt_tab()            # (3072,) 0..32768
COEFFS = np.round(_M_RGB2XYZ / _WHITE_D65[:, None] * (1 << LAB_SHIFT)).astype(np.int32)
L_SCALE = (116 * 255 + 50) // 100
L_SHIFT = -((16 * 255 * (1 << LAB_SHIFT2) + 50) // 100)


def _descale(v, n):
    return (v + (1 << (n - 1))) >> n


def rgb_to_lab_u8_exact_np(rgb_u8: np.ndarray) -> np.ndarray:
    """Numpy reference of the integer forward (bit-exact vs cv2 RGB2LAB 8U)."""
    rgb = rgb_u8.astype(np.int64)
    R = GAMMA_TAB[rgb[..., 0]].astype(np.int64)
    G = GAMMA_TAB[rgb[..., 1]].astype(np.int64)
    B = GAMMA_TAB[rgb[..., 2]].astype(np.int64)
    C = COEFFS.astype(np.int64)
    fX = CBRT_TAB[np.clip(_descale(R * C[0, 0] + G * C[0, 1] + B * C[0, 2], LAB_SHIFT), 0, NCBRT - 1)]
    fY = CBRT_TAB[np.clip(_descale(R * C[1, 0] + G * C[1, 1] + B * C[1, 2], LAB_SHIFT), 0, NCBRT - 1)]
    fZ = CBRT_TAB[np.clip(_descale(R * C[2, 0] + G * C[2, 1] + B * C[2, 2], LAB_SHIFT), 0, NCBRT - 1)]
    L = _descale(L_SCALE * fY.astype(np.int64) + L_SHIFT, LAB_SHIFT2)
    a = _descale(500 * (fX.astype(np.int64) - fY) + 128 * (1 << LAB_SHIFT2), LAB_SHIFT2)
    b = _descale(200 * (fY.astype(np.int64) - fZ) + 128 * (1 << LAB_SHIFT2), LAB_SHIFT2)
    return np.clip(np.stack([L, a, b], -1), 0, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# Inverse (Lab2RGBinteger) — verified bit-exact vs cv2 5.0 over 393k probes.
# ---------------------------------------------------------------------------

BASE_SHIFT = 14
BASE = 1 << BASE_SHIFT          # 16384
MIN_AB = -8145
INV_GAMMA_SIZE = 4096
AB_LIN_THRESH = 3390            # ~ 6/29 * BASE
AB_LIN_K = (BASE * 16 // 116) * 108 // 841


def _build_l2yf() -> np.ndarray:
    """LabToYF_b: L_u8 -> (y, ify) in BASE scale (threshold L_u8 <= 20)."""
    i = np.arange(256)
    fy = (i * 100.0 / 255.0 + 16.0) / 116.0
    y = np.where(i <= 20, np.round(i * BASE * 100.0 / (255.0 * 903.3)),
                 np.round(BASE * fy ** 3))
    ify = np.where(i <= 20,
                   np.round(BASE * (7.787 * i * 100.0 / (255.0 * 903.3) + 16.0 / 116.0)),
                   np.round(BASE * fy))
    return np.stack([y, ify], axis=1).astype(np.int32)  # (256, 2)


def _build_inv_gamma() -> np.ndarray:
    x = np.arange(INV_GAMMA_SIZE) / float(INV_GAMMA_SIZE)
    s = np.where(x <= 0.0031308, x * 12.92,
                 1.055 * np.maximum(x, 0.0) ** (1 / 2.4) - 0.055)
    return np.clip(np.round(255.0 * s), 0, 255).astype(np.int32)


L2YF_TAB = _build_l2yf()
INV_GAMMA_TAB = _build_inv_gamma()
COEFFS_INV = np.round(
    np.linalg.inv(_M_RGB2XYZ) * _WHITE_D65[None, :] * (1 << 12)
).astype(np.int32)  # rows: R,G,B over (x, y, z)


def _ctrunc_div(a, b):
    """C/C++ integer division (truncation toward zero) for array a, int b>0."""
    q = np.abs(a) // b
    return np.where(a < 0, -q, q)


def ab_to_xz_np(v: np.ndarray) -> np.ndarray:
    """abToXZ_b as arithmetic (no table): v in BASE scale (may be negative)."""
    v = np.clip(v, MIN_AB, BASE * 9 // 4)
    lin = _ctrunc_div(v * 108, 841) - AB_LIN_K
    cub = _ctrunc_div(_ctrunc_div(v * v, BASE) * v, BASE)
    return np.where(v <= AB_LIN_THRESH, lin, cub)


def adiv_np(a):
    return ((5 * a * 53687 + (1 << 7)) >> 13) - 128 * BASE // 500


def bdiv_np(b):
    return ((b * 41943 + (1 << 4)) >> 9) - 128 * BASE // 200 + 1


def lab_to_rgb_u8_exact_np(lab_u8: np.ndarray) -> np.ndarray:
    """Numpy reference of the integer inverse (bit-exact vs cv2 LAB2RGB 8U)."""
    lab = lab_u8.astype(np.int64)
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    y = L2YF_TAB[L, 0].astype(np.int64)
    ify = L2YF_TAB[L, 1].astype(np.int64)
    x = ab_to_xz_np(ify + adiv_np(a))
    z = ab_to_xz_np(ify - bdiv_np(b))
    C = COEFFS_INV.astype(np.int64)
    out = []
    for ch in range(3):
        idx = _descale(C[ch, 0] * x + C[ch, 1] * y + C[ch, 2] * z, 14)
        out.append(INV_GAMMA_TAB[np.clip(idx, 0, INV_GAMMA_SIZE - 1)])
    return np.stack(out, -1).astype(np.int32)
