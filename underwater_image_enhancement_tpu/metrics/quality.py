"""No-reference image quality assessment — batched, jitted.

Reproduces the reference's 8 metrics and weighting exactly
(quality_assessment.py:14-286):

  contrast     RMS std of u8-gray/255, /0.5*100           (:14-33)
  sharpness    variance of Laplacian(k=1) of gray, /0.5*100 (:35-55)
  entropy      Shannon entropy of gray, (e-4)/4*100        (:57-75)
  saturation   mean HSV-S (u8/255), *100                   (:77-97)
  brightness   100 - |mean LAB-L - 128|/128*100            (:99-123)
  edge_density Canny density /0.2*100                      (:125-147)
  colorfulness Hasler-Süsstrunk /0.5*100                   (:149-184)
  naturalness  100 - 200*(oversat + toodark + toobright)   (:186-212)

``comprehensive_assessment`` applies the weights dict with ``get(key, 0)``
exactly like quality_assessment.py:284 (so config.py's 6-weight dict zeroes
colorfulness/naturalness).  All metrics are computed in ONE fused program
per image (shared colorspace transforms), vmapped over batches.

Unlike the reference there is no per-metric try/except -> 50.0 fallback:
shapes are static and failures cannot occur inside jit by construction.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from underwater_image_enhancement_tpu.ops import colorspace as cs
from underwater_image_enhancement_tpu.ops.edges import canny_u8, laplacian

METRIC_NAMES = (
    "contrast", "sharpness", "entropy", "saturation",
    "brightness", "edge_density", "colorfulness", "naturalness",
)


from underwater_image_enhancement_tpu.ops.histeq import shannon_entropy_u8 as _entropy_u8


def assess_all(img: jnp.ndarray,
               needed: frozenset | None = None,
               fast: bool = False) -> Dict[str, jnp.ndarray]:
    """Metric scores for one (H, W, 3) image in [0,1].

    Thin NHWC shim over ``assess_all_planes`` (bit-identical: every
    metric is elementwise-then-reduce, so channel split order is the only
    difference and it has none)."""
    return assess_all_planes((img[..., 0], img[..., 1], img[..., 2]),
                             needed=needed, fast=fast)


def assess_all_planes(planes,
                      needed: frozenset | None = None,
                      fast: bool = False) -> Dict[str, jnp.ndarray]:
    """Metric scores for one image given as (r, g, b) float planes in [0,1]
    — the Phase-1 label program's channel-first layout (consuming strategy
    outputs directly as planes removes the NHWC stack + re-split layout
    copies the device trace showed, tools/prof_label_trace).

    needed=None computes all 8; otherwise only the named metrics (and
    only the colorspace transforms they read) are traced — zero-weight
    metrics in config.py's 6-weight dict cost full-frame reductions the
    weighted total then multiplies by 0, so the totals-only callers skip
    them at trace time (bit-identical totals: each metric is finite, so
    the dropped terms are exact zeros).

    fast=True (the throughput labeling tier) computes the brightness
    metric's L with the fused arithmetic conversion instead of the exact
    table kernel: only mean(L) is consumed, so the whole brightness path
    fuses into one reduction (±1 LSB per pixel ⇒ score delta well under
    the fast-tier near-tie budget)."""
    k = METRIC_NAMES if needed is None else needed
    r, g, b = planes
    r8, g8, b8 = cs.quantize_u8(r), cs.quantize_u8(g), cs.quantize_u8(b)
    gray_u8 = cs.gray_u8_planes(r8, g8, b8)
    gray = cs.u8_to_unit(gray_u8)

    scores = {}
    # contrast (:25-33)
    if "contrast" in k:
        scores["contrast"] = jnp.clip(jnp.std(gray) / 0.5 * 100.0, 0.0, 100.0)
    # sharpness (:46-55) — cv2.Laplacian default ksize=1
    if "sharpness" in k:
        lap = laplacian(gray, ksize=1)
        scores["sharpness"] = jnp.clip(jnp.var(lap) / 0.5 * 100.0, 0.0, 100.0)
    # entropy (:68-75)
    if "entropy" in k:
        ent = _entropy_u8(gray_u8)
        scores["entropy"] = jnp.clip((ent - 4.0) / 4.0 * 100.0, 0.0, 100.0)
    if "saturation" in k or "naturalness" in k:
        sat = cs.hsv_s_u8_planes(r8, g8, b8).astype(jnp.float32) / 255.0
    # saturation (:88-97)
    if "saturation" in k:
        scores["saturation"] = jnp.clip(jnp.mean(sat) * 100.0, 0.0, 100.0)
    # brightness (:111-123) — L-only tier: one CBRT lookup and one output
    # plane instead of three (bit-identical to the full conversion);
    # fast tier: arithmetic L fused into the mean (no gathers, no plane)
    if "brightness" in k:
        if fast:
            lab_l = cs.rgb_u8_to_lab_l_arith_planes(r8, g8, b8)
        else:
            u8 = jnp.stack([r8, g8, b8], axis=-1)
            lab_l = cs.rgb_to_lab_l_u8_exact(u8).astype(jnp.float32)
        dev = jnp.abs(jnp.mean(lab_l) - 128.0)
        scores["brightness"] = 100.0 - jnp.clip(dev / 128.0 * 100.0, 0.0, 100.0)
    # edge density (:136-147)
    if "edge_density" in k:
        edges = canny_u8(gray_u8, 50, 150)
        scores["edge_density"] = jnp.clip(
            jnp.mean(edges.astype(jnp.float32)) / 0.2 * 100.0, 0.0, 100.0
        )
    # colorfulness (:160-184) — on the FLOAT image, like the reference
    if "colorfulness" in k:
        rg = r - g
        yb = 0.5 * (r + g) - b
        std_rgyb = jnp.sqrt(jnp.std(rg) ** 2 + jnp.std(yb) ** 2)
        mean_rgyb = jnp.sqrt(jnp.mean(rg) ** 2 + jnp.mean(yb) ** 2)
        scores["colorfulness"] = jnp.clip(
            (std_rgyb + 0.3 * mean_rgyb) / 0.5 * 100.0, 0.0, 100.0
        )
    # naturalness (:198-212)
    if "naturalness" in k:
        over_sat = jnp.mean((sat > 0.9).astype(jnp.float32))
        too_dark = jnp.mean((gray < 0.1).astype(jnp.float32))
        too_bright = jnp.mean((gray > 0.9).astype(jnp.float32))
        unnatural = over_sat + too_dark + too_bright
        scores["naturalness"] = 100.0 - jnp.clip(unnatural * 200.0, 0.0, 100.0)
    return scores


@jax.jit
def assess_all_vector(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) -> (8,) scores in METRIC_NAMES order (batch-friendly)."""
    s = assess_all(img)
    return jnp.stack([s[k] for k in METRIC_NAMES])


@jax.jit
def assess_batch(imgs: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, 8)."""
    return jax.vmap(assess_all_vector)(imgs)


def comprehensive_assessment(
    img: jnp.ndarray, weights: Dict[str, float] | None = None
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """quality_assessment.py:215-286: weighted total + per-metric dict.

    weights=None -> the 8-metric defaults (:229-238); missing keys get 0."""
    from underwater_image_enhancement_tpu.utils.config import FULL_QUALITY_WEIGHTS

    w = FULL_QUALITY_WEIGHTS if weights is None else weights
    scores = assess_all(img)
    total = sum(scores[k] * w.get(k, 0) for k in METRIC_NAMES)
    return total, scores


def comprehensive_batch(imgs: jnp.ndarray,
                        weights: Dict[str, float] | None = None,
                        fast: bool = False) -> jnp.ndarray:
    """(B, H, W, 3) -> (B,) weighted totals, one compiled program."""
    from underwater_image_enhancement_tpu.utils.config import FULL_QUALITY_WEIGHTS

    w = FULL_QUALITY_WEIGHTS if weights is None else weights
    needed = frozenset(k for k in METRIC_NAMES if w.get(k, 0) != 0)

    def total_one(img):
        s = assess_all(img, needed=needed, fast=fast)
        # left-to-right in METRIC_NAMES order; dropped terms are exact 0s
        total = jnp.float32(0.0)
        for k in METRIC_NAMES:
            if k in needed:
                total = total + s[k] * jnp.float32(w[k])
        return total

    return jax.vmap(total_one)(imgs)


def comprehensive_batch_planes(planes,
                               weights: Dict[str, float] | None = None,
                               fast: bool = False) -> jnp.ndarray:
    """(r, g, b) planes, each (B, H, W) -> (B,) weighted totals.

    Bit-identical to ``comprehensive_batch`` on the stacked NHWC batch;
    the Phase-1 label program feeds strategy outputs through here without
    ever stacking them (see assess_all_planes)."""
    from underwater_image_enhancement_tpu.utils.config import FULL_QUALITY_WEIGHTS

    w = FULL_QUALITY_WEIGHTS if weights is None else weights
    needed = frozenset(k for k in METRIC_NAMES if w.get(k, 0) != 0)

    def total_one(p):
        s = assess_all_planes(p, needed=needed, fast=fast)
        total = jnp.float32(0.0)
        for k in METRIC_NAMES:
            if k in needed:
                total = total + s[k] * jnp.float32(w[k])
        return total

    return jax.vmap(total_one)(planes)
