"""Feature extractor parity: 79-dim and 18-dim variants vs CPU oracle."""

import numpy as np
import pytest

from underwater_image_enhancement_tpu.features import basic, full
from underwater_image_enhancement_tpu.testing import golden_features as gf


def test_feature_dim(underwater_img):
    v = np.asarray(full.extract_all_features(underwater_img))
    assert v.shape == (79,)
    assert np.isfinite(v).all()


def test_features_match_golden(underwater_img):
    got = np.asarray(full.extract_all_features(underwater_img)).astype(np.float64)
    want = gf.extract_all_features(underwater_img.astype(np.float64))
    assert want.shape == (79,)
    # relative tolerance per feature; features feed classifiers so 1e-3 rel
    # (or 1e-4 abs for near-zero entries) is far below decision noise
    err = np.abs(got - want)
    rel = err / np.maximum(np.abs(want), 1e-3)
    tol = np.full(79, 1e-2)
    bad = np.where((rel > tol) & (err > 1e-3))[0]
    assert len(bad) == 0, f"features off: {bad}, got {got[bad]}, want {want[bad]}"


def test_features_match_golden_tight_groups(underwater_img):
    """Color (0:35) and quality (69:79) groups are pure statistics over
    bit-exact conversions — they must agree to ~1e-5 relative."""
    got = np.asarray(full.extract_all_features(underwater_img)).astype(np.float64)
    want = gf.extract_all_features(underwater_img.astype(np.float64))
    for lo, hi in [(0, 35), (69, 79)]:
        rel = np.abs(got[lo:hi] - want[lo:hi]) / np.maximum(np.abs(want[lo:hi]), 1e-3)
        assert rel.max() < 1e-3, (lo, hi, rel.max())


def test_lbp_hist_exact(underwater_img):
    """LBP labels are integer decisions on bit-exact gray — hist must match."""
    from underwater_image_enhancement_tpu.ops import colorspace as cs
    from underwater_image_enhancement_tpu.ops.texture import lbp_uniform_hist

    u8g = np.asarray(cs.rgb_to_gray_u8(cs.quantize_u8(underwater_img)))
    got = np.asarray(lbp_uniform_hist(u8g))
    want = gf.lbp_hist(u8g.astype(np.uint8))
    # XLA fusion may flip O(1) borderline fp32 tie decisions per image
    n = u8g.size
    np.testing.assert_allclose(got, want, atol=2.5 / n)


def test_basic_features(underwater_img):
    got = np.asarray(basic.extract_basic_features(underwater_img)).astype(np.float64)
    want = gf.extract_basic_features(underwater_img.astype(np.float64))
    np.testing.assert_allclose(got[:18], want[:18], atol=1e-5)
    assert (got[18:] == 0).all()


def test_batch(underwater_img):
    b = np.stack([underwater_img, underwater_img[:, ::-1]])
    got = np.asarray(full.extract_batch(b))
    assert got.shape == (2, 79)
    single = np.asarray(full.extract_all_features(b[1]))
    np.testing.assert_allclose(got[1], single, rtol=1e-5, atol=1e-5)


def test_fast_tier_features_close_to_exact(underwater_img):
    """The throughput-tier 79-dim vector (arithmetic LAB ±2 LSB, default-
    precision DCT) stays within 1% relative (or 0.02 absolute for
    near-zero dims) of the exact tier — classifier-grade agreement."""
    import jax.numpy as jnp

    from underwater_image_enhancement_tpu.features.full import (
        extract_all_features,
    )

    exact = np.asarray(extract_all_features(jnp.asarray(underwater_img)))
    fast = np.asarray(extract_all_features(jnp.asarray(underwater_img),
                                           fast=True))
    rel = np.abs(fast - exact) / np.maximum(np.abs(exact), 1e-6)
    absd = np.abs(fast - exact)
    ok = (rel < 0.01) | (absd < 0.02)
    assert ok.all(), np.argwhere(~ok).ravel()
