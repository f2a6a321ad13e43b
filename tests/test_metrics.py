"""Metrics parity: NR-IQA vs the reference-semantics oracle; UIQM/UCIQE <1%."""

import numpy as np
import pytest

from underwater_image_enhancement_tpu.metrics import quality, uiqm
from underwater_image_enhancement_tpu.testing import golden_metrics as gm
from underwater_image_enhancement_tpu.utils.config import DEFAULT_QUALITY_WEIGHTS


@pytest.fixture(scope="module")
def imgs(rng):
    out = {"natural": None, "dark": None, "flat": None, "bright": None}
    h, w = 96, 128
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [0.2 + 0.15 * np.sin(xx / 11), 0.45 + 0.2 * (yy / h), 0.5 + 0.2 * (xx / w)],
        -1,
    )
    nat = np.clip(base + rng.normal(0, 0.05, (h, w, 3)), 0, 1).astype(np.float32)
    out["natural"] = (np.floor(nat * 255) / 255).astype(np.float32)
    out["dark"] = (out["natural"] * 0.25).astype(np.float32)
    out["flat"] = np.full((h, w, 3), 0.5, np.float32)
    out["bright"] = np.clip(out["natural"] + 0.5, 0, 1).astype(np.float32)
    return out


def test_metric_scores_match_reference(imgs):
    for name, img in imgs.items():
        got = np.asarray(quality.assess_all_vector(img))
        for i, key in enumerate(quality.METRIC_NAMES):
            want = gm.ASSESSORS[key](img.astype(np.float64))
            # brightness goes through LAB (bit-exact) etc.; all should be tight
            assert abs(got[i] - want) < 0.25, f"{name}/{key}: {got[i]} vs {want}"


def test_comprehensive_default_weights(imgs):
    img = imgs["natural"]
    total, scores = quality.comprehensive_assessment(img)
    want_total, want_scores = gm.comprehensive(img.astype(np.float64))
    assert abs(float(total) - want_total) < 0.3
    assert set(scores) == set(want_scores)


def test_comprehensive_config_weights(imgs):
    """config.py passes only 6 weights; colorfulness/naturalness get 0."""
    img = imgs["natural"]
    total, _ = quality.comprehensive_assessment(img, DEFAULT_QUALITY_WEIGHTS)
    want_total, _ = gm.comprehensive(img.astype(np.float64), DEFAULT_QUALITY_WEIGHTS)
    assert abs(float(total) - want_total) < 0.3


def test_batch_matches_single(imgs):
    batch = np.stack([imgs["natural"], imgs["dark"]])
    got = np.asarray(quality.assess_batch(batch))
    for i in range(2):
        single = np.asarray(quality.assess_all_vector(batch[i]))
        np.testing.assert_allclose(got[i], single, atol=1e-4)


def test_uiqm_within_1pct(imgs):
    for name in ("natural", "dark", "bright"):
        got = float(uiqm.uiqm(imgs[name]))
        want = gm.uiqm(imgs[name].astype(np.float64))
        assert abs(got - want) / max(abs(want), 1e-6) < 0.01, f"{name}: {got} vs {want}"


def test_uciqe_within_1pct(imgs):
    for name in ("natural", "dark", "bright"):
        got = float(uiqm.uciqe(imgs[name]))
        want = gm.uciqe(imgs[name].astype(np.float64))
        assert abs(got - want) / max(abs(want), 1e-6) < 0.01, f"{name}: {got} vs {want}"


def test_ranking_sanity(imgs):
    """The comprehensive score should prefer the natural image over flat."""
    t_nat, _ = quality.comprehensive_assessment(imgs["natural"])
    t_flat, _ = quality.comprehensive_assessment(imgs["flat"])
    assert float(t_nat) > float(t_flat)


def test_fast_tier_scores_close_to_exact(imgs):
    """The throughput-tier totals (arithmetic brightness L) stay within 0.5
    of the exact totals — far inside the fast-label near-tie budget."""
    for name, img in imgs.items():
        exact = np.asarray(quality.comprehensive_batch(
            img[None], DEFAULT_QUALITY_WEIGHTS))
        fast = np.asarray(quality.comprehensive_batch(
            img[None], DEFAULT_QUALITY_WEIGHTS, fast=True))
        assert abs(float(exact[0]) - float(fast[0])) < 0.5, (name, exact, fast)
