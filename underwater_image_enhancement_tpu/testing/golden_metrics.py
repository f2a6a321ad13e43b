"""CPU oracles for metrics: the reference NR-IQA (cv2/numpy) and UIQM/UCIQE.

The NR-IQA functions reproduce quality_assessment.py:14-286 verbatim
semantics (same cv2 conversions, same normalizations).  The UIQM/UCIQE
oracles are INDEPENDENTLY re-derived from the published papers (see the
section comment below for citations and the derivation ground rules) — they
deliberately share no structure with metrics/uiqm.py, which they gate
(UIQM/UCIQE have no reference implementation; BASELINE.json names them as
parity metrics).
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


# --- UIQM / UCIQE: independently-derived float64 oracles -------------------
#
# Re-derived from the PUBLISHED definitions, NOT from metrics/uiqm.py
# (VERDICT r2 item 6): Panetta, Gao, Agaian, "Human-Visual-System-Inspired
# Underwater Image Quality Measures", IEEE J. Oceanic Eng. 41(3), 2016
# (UICM eq. 3-6, UISM eq. 8-10, UIConM eq. 12) and Yang & Sowmya, "An
# Underwater Color Image Quality Evaluation Metric", IEEE TIP 24(12), 2015
# (eq. 11).  Where the paper leaves a choice open, the framework's
# documented spec (metrics/uiqm.py module docstring) pins it: the PLIP-free
# logAMEE simplification for UIConM, the 1e-3 EME ratio epsilon, and
# UCIQE's /100 normalizations of sigma_c/con_l.  The code below computes
# every term from first principles (explicit per-block loops, explicit
# Sobel convolution with cv2's REFLECT_101 border) so it shares no
# structure with the vectorized TPU implementation it gates.


def _trimmed_mean_var(values, alpha=0.1):
    """Panetta et al. eq. 3-4: drop the floor(alpha*N) smallest and largest
    samples, then plain mean / biased variance of the remainder."""
    v = np.sort(np.asarray(values, np.float64).ravel())
    t = int(alpha * v.size)
    kept = v[t:v.size - t]
    mu = kept.sum() / kept.size
    return mu, float(np.square(kept - mu).sum() / kept.size)


def _iter_blocks(x, k=8):
    """Full k x k blocks in row-major order (partial edge blocks dropped)."""
    H, W = x.shape
    for i in range(H // k):
        for j in range(W // k):
            yield x[i * k:(i + 1) * k, j * k:(j + 1) * k]


def _sobel_mag_reflect101(x):
    """3x3 Sobel gradient magnitude from the kernel definition, with cv2's
    default BORDER_REFLECT_101 padding (no cv2 call)."""
    xp = np.pad(np.asarray(x, np.float64), 1, mode="reflect")
    kx = np.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]])
    H, W = x.shape
    gx = np.zeros((H, W))
    gy = np.zeros((H, W))
    for di in range(3):
        for dj in range(3):
            win = xp[di:di + H, dj:dj + W]
            gx += kx[di, dj] * win
            gy += kx[dj, di] * win
    return np.sqrt(gx * gx + gy * gy)


def uiqm(img):
    img = np.asarray(img, np.float64)
    r, g, b = img[..., 0], img[..., 1], img[..., 2]

    # UICM (eq. 3-6): alpha-trimmed chroma statistics
    mu_rg, s2_rg = _trimmed_mean_var(r - g)
    mu_yb, s2_yb = _trimmed_mean_var((r + g) / 2.0 - b)
    uicm = (-0.0268 * np.hypot(mu_rg, mu_yb)
            + 0.1586 * np.sqrt(s2_rg + s2_yb))

    # UISM (eq. 8-10): per-channel Sobel-weighted EME, luma weights
    uism = 0.0
    for ch, wc in ((r, 0.299), (g, 0.587), (b, 0.114)):
        graysc = _sobel_mag_reflect101(ch) * ch
        terms = []
        for blk in _iter_blocks(graysc):
            # spec: 1e-3 ratio epsilon bounds log(max/min) on flat blocks
            terms.append(2.0 * np.log((blk.max() + 1e-3)
                                      / (blk.min() + 1e-3)))
        uism += wc * (sum(terms) / len(terms))

    # UIConM (eq. 12, PLIP-free logAMEE spec): entropy-weighted Michelson
    gray = (r + g + b) / 3.0
    terms = []
    for blk in _iter_blocks(gray):
        mx, mn = blk.max(), blk.min()
        m = (mx - mn) / (mx + mn + 1e-8)
        terms.append(m * np.log(max(m, 1e-8)) if m > 0 else 0.0)
    uiconm = abs(sum(terms) / len(terms))

    return 0.0282 * uicm + 0.2953 * uism + 3.5753 * uiconm


def uciqe(img):
    """Yang & Sowmya eq. 11 over OpenCV's u8 LAB/HSV encodings (the
    framework spec pins the u8 color path + /100 normalizations)."""
    from underwater_image_enhancement_tpu.ops.lab_tables import (
        rgb_to_lab_u8_exact_np,
    )

    u8 = (np.asarray(img, np.float64) * 255).astype(np.uint8)
    lab = rgb_to_lab_u8_exact_np(u8).astype(np.float64)
    L = lab[..., 0] * (100.0 / 255.0)
    ca = lab[..., 1] - 128.0
    cb = lab[..., 2] - 128.0
    chroma = np.hypot(ca, cb)
    sigma_c = np.sqrt(np.mean(np.square(chroma - chroma.mean()))) / 100.0
    con_l = (np.percentile(L, 99) - np.percentile(L, 1)) / 100.0
    hsv = cv2.cvtColor(u8, cv2.COLOR_RGB2HSV).astype(np.float64) / 255.0
    mu_s = hsv[..., 1].mean()
    return 0.4680 * sigma_c + 0.2745 * con_l + 0.2576 * mu_s
