"""Float64 numpy oracle for the Ancuti fusion strategy (pipeline/fusion.py).

Mirrors the TPU implementation's spec exactly (same 5-tap kernel, reflect
borders, crop-before-blur pyr_up, weight formulas) in float64 — the >=50 dB
gate in tests/test_fusion.py runs against this.  cv2.pyrDown/pyrUp parity
of the pyramid ops themselves is tested separately.
"""

from __future__ import annotations

import numpy as np

from underwater_image_enhancement_tpu.testing.golden import clahe

_K5 = np.array([1, 4, 6, 4, 1], np.float64) / 16.0


def _blur5_axis(x: np.ndarray, axis: int, scale: float = 1.0) -> np.ndarray:
    pad = [(0, 0)] * x.ndim
    pad[axis] = (2, 2)
    xp = np.pad(x, pad, mode="reflect")
    n = x.shape[axis]
    out = np.zeros_like(x)
    sl = [slice(None)] * x.ndim
    for k, w in enumerate(_K5):
        sl[axis] = slice(k, k + n)
        out += xp[tuple(sl)] * (w * scale)
    return out


def blur5(x: np.ndarray, scale: float = 1.0) -> np.ndarray:
    return _blur5_axis(_blur5_axis(x, x.ndim - 2, scale), x.ndim - 1)


def pyr_down(x: np.ndarray) -> np.ndarray:
    return blur5(x)[..., ::2, ::2]


def pyr_up(x: np.ndarray, dst_hw) -> np.ndarray:
    H, W = dst_hw
    h, w = x.shape[-2], x.shape[-1]
    up = np.zeros(x.shape[:-2] + (2 * h, 2 * w), x.dtype)
    up[..., ::2, ::2] = x
    return blur5(up[..., :H, :W], scale=4.0)


def gaussian_pyramid(x, levels):
    pyr = [x]
    for _ in range(levels - 1):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def laplacian_pyramid(x, levels):
    g = gaussian_pyramid(x, levels)
    lap = [g[i] - pyr_up(g[i + 1], g[i].shape[-2:]) for i in range(levels - 1)]
    lap.append(g[-1])
    return lap


def reconstruct(lap):
    out = lap[-1]
    for lvl in reversed(lap[:-1]):
        out = lvl + pyr_up(out, lvl.shape[-2:])
    return out


def gray_world_wb(img: np.ndarray) -> np.ndarray:
    means = img.reshape(-1, 3).mean(axis=0)
    target = means.mean()
    return np.clip(img * (target / np.maximum(means, 1e-6)), 0.0, 1.0)


_M = np.array(
    [[0.412453, 0.357580, 0.180423],
     [0.212671, 0.715160, 0.072169],
     [0.019334, 0.119193, 0.950227]], np.float64)
_WHITE = np.array([0.950456, 1.0, 1.088754], np.float64)


def _lab_float(img: np.ndarray):
    lin = np.where(img <= 0.04045, img / 12.92, ((img + 0.055) / 1.055) ** 2.4)
    xyz = lin @ _M.T / _WHITE
    d = 6.0 / 29.0
    f = np.where(xyz > d ** 3, np.cbrt(xyz), xyz / (3 * d * d) + 4.0 / 29.0)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return L, a, b


def _laplacian3(x: np.ndarray) -> np.ndarray:
    xp = np.pad(x, 1, mode="reflect")
    return (xp[:-2, 1:-1] + xp[2:, 1:-1] + xp[1:-1, :-2] + xp[1:-1, 2:]
            - 4.0 * x)


def _weight_maps(img: np.ndarray) -> np.ndarray:
    lum = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    w_contrast = np.abs(_laplacian3(lum))
    w_sat = np.sqrt(((img - lum[..., None]) ** 2).mean(axis=-1))
    L, a, b = _lab_float(img)
    w_sal = np.sqrt((blur5(L) - L.mean()) ** 2 + (blur5(a) - a.mean()) ** 2
                    + (blur5(b) - b.mean()) ** 2)
    return w_contrast + w_sat + w_sal / 100.0


def fusion_levels(H: int, W: int) -> int:
    levels = 1
    while min(H, W) >> levels >= 16 and levels < 5:
        levels += 1
    return levels


def ancuti_fusion(img: np.ndarray) -> np.ndarray:
    """Float64 oracle of pipeline.fusion.ancuti_fusion."""
    img = img.astype(np.float64)
    wb = gray_world_wb(img)
    cl = clahe(wb, 2.0, (8, 8)).astype(np.float64)
    w1 = _weight_maps(wb)
    w2 = _weight_maps(cl)
    norm = w1 + w2 + 0.2
    w1n = (w1 + 0.1) / norm
    w2n = (w2 + 0.1) / norm
    levels = fusion_levels(*img.shape[:2])
    out = np.zeros_like(img)
    for c in range(3):
        wp1 = gaussian_pyramid(w1n, levels)
        wp2 = gaussian_pyramid(w2n, levels)
        ip1 = laplacian_pyramid(wb[..., c], levels)
        ip2 = laplacian_pyramid(cl[..., c], levels)
        fused = [wp1[l] * ip1[l] + wp2[l] * ip2[l] for l in range(levels)]
        out[..., c] = reconstruct(fused)
    return np.clip(out, 0.0, 1.0)
