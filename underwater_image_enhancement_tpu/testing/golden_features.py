"""CPU oracle for the 79-dim feature extractor (feature_extraction.py).

skimage is not installed in this environment, so LBP/GLCM are re-implemented
here in numpy following skimage's documented/Cython semantics (the same spec
ops/texture.py implements); everything else uses cv2/scipy like the
reference.
"""

from __future__ import annotations

import cv2
import numpy as np
from scipy import stats


def lbp_uniform(gray_u8: np.ndarray) -> np.ndarray:
    """skimage.feature.local_binary_pattern(g, 8, 1, 'uniform') labels."""
    H, W = gray_u8.shape
    # float32 like the TPU op: the bilinear tie decisions (sample >= center)
    # are part of the fp32 spec
    x = gray_u8.astype(np.float32)
    P = 8
    bits = np.zeros((P, H, W), np.int64)
    for k in range(P):
        ang = 2 * np.pi * k / P
        dr, dc = -np.sin(ang), np.cos(ang)
        if abs(dr - round(dr)) < 1e-6 and abs(dc - round(dc)) < 1e-6:
            s = _shift0(x, int(round(dr)), int(round(dc)))
        else:
            r0, c0 = int(np.floor(dr)), int(np.floor(dc))
            fr, fc = dr - r0, dc - c0
            s00 = _shift0(x, r0, c0)
            s01 = _shift0(x, r0, c0 + 1)
            s10 = _shift0(x, r0 + 1, c0)
            s11 = _shift0(x, r0 + 1, c0 + 1)
            # tie-robust difference form (see ops/texture.py)
            s = (s00 + fr * (s10 - s00) + fc * (s01 - s00)
                 + fr * fc * (s11 - s10 - s01 + s00))
        bits[k] = (s >= x)
    ones = bits.sum(0)
    trans = np.abs(bits - np.roll(bits, 1, axis=0)).sum(0)
    return np.where(trans <= 2, ones, P + 1)


def _shift0(x, dr, dc):
    H, W = x.shape
    xp = np.pad(x, 2)
    return xp[2 + dr:2 + dr + H, 2 + dc:2 + dc + W]


def lbp_hist(gray_u8: np.ndarray) -> np.ndarray:
    lbp = lbp_uniform(gray_u8)
    h, _ = np.histogram(lbp.ravel(), bins=10, range=(0, 10), density=True)
    return h


def glcm_props(gray_u8: np.ndarray) -> np.ndarray:
    """graycomatrix + graycoprops over 4 angles -> (6, 4)."""
    offsets = ((0, 1), (1, 1), (1, 0), (1, -1))
    i = np.arange(256)[:, None].astype(np.float64)
    j = np.arange(256)[None, :].astype(np.float64)
    diff = i - j
    out = np.zeros((6, 4))
    for k, (dr, dc) in enumerate(offsets):
        H, W = gray_u8.shape
        r0, r1 = max(0, -dr), H - max(0, dr)
        c0, c1 = max(0, -dc), W - max(0, dc)
        a = gray_u8[r0:r1, c0:c1].ravel()
        b = gray_u8[r0 + dr:r1 + dr, c0 + dc:c1 + dc].ravel()
        p = np.zeros((256, 256))
        np.add.at(p, (a, b), 1.0)
        p = p + p.T
        p /= p.sum()
        contrast = (p * diff**2).sum()
        dissim = (p * np.abs(diff)).sum()
        homog = (p / (1 + diff**2)).sum()
        asm = (p * p).sum()
        energy = np.sqrt(asm)
        mu_i, mu_j = (p * i).sum(), (p * j).sum()
        s_i = np.sqrt((p * (i - mu_i) ** 2).sum())
        s_j = np.sqrt((p * (j - mu_j) ** 2).sum())
        corr = 1.0 if (s_i < 1e-15 or s_j < 1e-15) else (
            (p * (i - mu_i) * (j - mu_j)).sum() / (s_i * s_j)
        )
        out[:, k] = [contrast, dissim, homog, energy, corr, asm]
    return out


def extract_all_features(img: np.ndarray) -> np.ndarray:
    """feature_extraction.py:249-297 happy path -> (79,)."""
    feats = []
    u8 = (img * 255).astype(np.uint8)
    lab = cv2.cvtColor(u8, cv2.COLOR_RGB2LAB).astype(np.float32)
    hsv = cv2.cvtColor(u8, cv2.COLOR_RGB2HSV).astype(np.float32)
    # F1 color (35)
    for c in range(3):
        ch = lab[:, :, c].flatten()
        feats += [np.mean(ch), np.std(ch), stats.skew(ch), stats.kurtosis(ch)]
    for c in range(3):
        ch = hsv[:, :, c].flatten()
        feats += [np.mean(ch), np.std(ch)]
    a, b = lab[:, :, 1], lab[:, :, 2]
    mean_a, mean_b = np.mean(a), np.mean(b)
    M = np.sqrt(mean_a**2 + mean_b**2)
    Da, Db = np.mean(np.abs(a - mean_a)), np.mean(np.abs(b - mean_b))
    D = np.sqrt(Da**2 + Db**2)
    feats += [M / (D + 1e-10), M, D, mean_a, mean_b]
    for c in range(3):
        ch = img[:, :, c].flatten()
        feats += [np.mean(ch), np.std(ch), np.min(ch), np.max(ch)]
    # F2 texture (22)
    gray = cv2.cvtColor(u8, cv2.COLOR_RGB2GRAY).astype(np.float32) / 255.0
    gray_u8 = (gray * 255).astype(np.uint8)
    feats += list(lbp_hist(gray_u8))
    reduced = cv2.resize(gray_u8, (128, 128))
    props = glcm_props(reduced)
    for p in range(6):
        feats += [np.mean(props[p]), np.std(props[p])]
    # F3 frequency (5)
    gray255 = cv2.cvtColor(u8, cv2.COLOR_RGB2GRAY).astype(np.float32)
    d = cv2.dct(gray255)
    H, W = d.shape
    total = np.sum(d**2)
    feats += [
        np.sum(d[: H // 4, : W // 4] ** 2) / total,
        np.sum(d[H // 4:H // 2, W // 4:W // 2] ** 2) / total,
        np.sum(d[H // 2:, W // 2:] ** 2) / total,
        np.mean(np.abs(d)),
        np.std(np.abs(d)),
    ]
    # F4 edges (7)
    gx = cv2.Sobel(gray, cv2.CV_32F, 1, 0, ksize=3)
    gy = cv2.Sobel(gray, cv2.CV_32F, 0, 1, ksize=3)
    mag = np.sqrt(gx**2 + gy**2)
    edges = cv2.Canny(gray_u8, 50, 150)
    lap = cv2.Laplacian(gray_u8.astype(np.float64), cv2.CV_64F, ksize=3)
    feats += [np.mean(mag), np.std(mag), np.max(mag), (edges > 0).mean(),
              np.mean(np.abs(lap)), np.std(lap), np.var(lap)]
    # F5 quality (10)
    _, counts = np.unique(gray, return_counts=True)
    p = counts / counts.sum()
    ent = -np.sum(p * np.log2(p))
    sat = hsv[:, :, 1] / 255.0
    feats += [
        np.std(gray), ent, np.mean(gray), np.median(gray),
        np.percentile(gray, 25), np.percentile(gray, 75),
        np.max(gray) - np.min(gray), np.mean(sat), np.std(sat),
        np.sqrt(np.mean((gray - np.mean(gray)) ** 2)),
    ]
    return np.array(feats, np.float64)


def extract_basic_features(img: np.ndarray) -> np.ndarray:
    """vgg_16_UIE.py:435-466 -> (79,) with zero pad."""
    feats = []
    for c in range(3):
        ch = img[:, :, c]
        feats += [np.mean(ch), np.std(ch), np.min(ch), np.max(ch), np.median(ch)]
    feats += [np.mean(img), np.std(img), np.mean(img**2)]
    while len(feats) < 79:
        feats.append(0.0)
    return np.array(feats[:79], np.float64)
