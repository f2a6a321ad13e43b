"""CPU oracles for metrics: the reference NR-IQA (cv2/numpy) and UIQM/UCIQE.

The NR-IQA functions reproduce quality_assessment.py:14-286 verbatim
semantics (same cv2 conversions, same normalizations).  UIQM/UCIQE mirror
metrics/uiqm.py's definitions in float64 (they have no reference
implementation; BASELINE.json names them as parity metrics).
"""

from __future__ import annotations

import cv2
import numpy as np


def _gray(img):
    return cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY).astype(
        np.float32
    ) / 255.0


def assess_contrast(img):
    return float(np.clip(np.std(_gray(img)) / 0.5 * 100, 0, 100))


def assess_sharpness(img):
    # cv2 5.0 dropped the f32-src -> f64-dst Laplacian combination, so feed
    # float64 (numerically identical to the reference's f32->CV_64F call)
    lap = cv2.Laplacian(_gray(img).astype(np.float64), cv2.CV_64F)
    return float(np.clip(np.var(lap) / 0.5 * 100, 0, 100))


def assess_entropy(img):
    g = _gray(img)
    _, counts = np.unique(g, return_counts=True)
    p = counts / counts.sum()
    ent = -np.sum(p * np.log2(p))
    return float(np.clip((ent - 4) / 4 * 100, 0, 100))


def assess_saturation(img):
    hsv = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2HSV).astype(
        np.float32
    ) / 255.0
    return float(np.clip(np.mean(hsv[:, :, 1]) * 100, 0, 100))


def assess_brightness(img):
    lab = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2LAB).astype(
        np.float32
    )
    dev = abs(np.mean(lab[:, :, 0]) - 128)
    return float(100 - np.clip(dev / 128 * 100, 0, 100))


def assess_edge_density(img):
    g = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
    edges = cv2.Canny(g, 50, 150)
    return float(np.clip((edges > 0).mean() / 0.2 * 100, 0, 100))


def assess_colorfulness(img):
    r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
    rg = r - g
    yb = 0.5 * (r + g) - b
    std = np.sqrt(np.std(rg) ** 2 + np.std(yb) ** 2)
    mean = np.sqrt(np.mean(rg) ** 2 + np.mean(yb) ** 2)
    return float(np.clip((std + 0.3 * mean) / 0.5 * 100, 0, 100))


def assess_naturalness(img):
    hsv = cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2HSV).astype(
        np.float32
    ) / 255.0
    over = (hsv[:, :, 1] > 0.9).mean()
    g = _gray(img)
    ratio = over + (g < 0.1).mean() + (g > 0.9).mean()
    return float(100 - np.clip(ratio * 200, 0, 100))


ASSESSORS = {
    "contrast": assess_contrast,
    "sharpness": assess_sharpness,
    "entropy": assess_entropy,
    "saturation": assess_saturation,
    "brightness": assess_brightness,
    "edge_density": assess_edge_density,
    "colorfulness": assess_colorfulness,
    "naturalness": assess_naturalness,
}


def comprehensive(img, weights=None):
    """quality_assessment.py:215-286 (weights.get(key, 0) semantics)."""
    if weights is None:
        weights = {
            "contrast": 0.20, "sharpness": 0.20, "entropy": 0.15,
            "saturation": 0.15, "brightness": 0.10, "edge_density": 0.10,
            "colorfulness": 0.05, "naturalness": 0.05,
        }
    scores = {k: f(img) for k, f in ASSESSORS.items()}
    total = sum(scores[k] * weights.get(k, 0) for k in scores)
    return total, scores


# --- UIQM / UCIQE (float64 mirrors of metrics/uiqm.py) ---------------------

def _trim_stats(x, alpha=0.1):
    flat = np.sort(x.reshape(-1))
    n = len(flat)
    lo = int(alpha * n)
    w = flat[lo:n - lo]
    return w.mean(), ((w - w.mean()) ** 2).mean()


def _blocks(x, k=8):
    H, W = x.shape
    x = x[: (H // k) * k, : (W // k) * k]
    return x.reshape(H // k, k, -1, k).transpose(0, 2, 1, 3).reshape(-1, k * k)


def _eme(x):
    # eps 1e-3: near-zero block minima make log(max/min) numerically
    # unstable across precisions; this bounds the ratio (metric is ours —
    # no reference implementation exists — so stability is part of the spec)
    b = _blocks(x)
    return np.mean(2.0 * np.log((b.max(1) + 1e-3) / (b.min(1) + 1e-3)))


def uiqm(img):
    img = img.astype(np.float64)
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    rg, yb = r - g, 0.5 * (r + g) - b
    mu_rg, s2_rg = _trim_stats(rg)
    mu_yb, s2_yb = _trim_stats(yb)
    uicm = -0.0268 * np.sqrt(mu_rg**2 + mu_yb**2) + 0.1586 * np.sqrt(s2_rg + s2_yb)
    uism = 0.0
    for c, wc in enumerate((0.299, 0.587, 0.114)):
        ch = img[..., c].astype(np.float32)
        gx = cv2.Sobel(ch, cv2.CV_32F, 1, 0, ksize=3)
        gy = cv2.Sobel(ch, cv2.CV_32F, 0, 1, ksize=3)
        mag = np.sqrt(gx**2 + gy**2).astype(np.float64)
        uism += wc * _eme(mag * ch)
    gray = img.mean(-1)
    blk = _blocks(gray)
    mx, mn = blk.max(1), blk.min(1)
    m = (mx - mn) / (mx + mn + 1e-8)
    uiconm = abs(np.mean(np.where(m > 0, m * np.log(np.maximum(m, 1e-8)), 0.0)))
    c1, c2, c3 = (0.0282, 0.2953, 3.5753)
    return c1 * uicm + c2 * uism + c3 * uiconm


def uciqe(img):
    from underwater_image_enhancement_tpu.ops.lab_tables import rgb_to_lab_u8_exact_np

    u8 = (img * 255).astype(np.uint8)
    lab = rgb_to_lab_u8_exact_np(u8).astype(np.float64)
    L = lab[..., 0] * 100.0 / 255.0
    a = lab[..., 1] - 128.0
    b = lab[..., 2] - 128.0
    chroma = np.sqrt(a * a + b * b)
    sigma_c = chroma.std() / 100.0
    con_l = (np.percentile(L, 99) - np.percentile(L, 1)) / 100.0
    hsv = cv2.cvtColor(u8, cv2.COLOR_RGB2HSV).astype(np.float64) / 255.0
    mu_s = hsv[..., 1].mean()
    return 0.4680 * sigma_c + 0.2745 * con_l + 0.2576 * mu_s
