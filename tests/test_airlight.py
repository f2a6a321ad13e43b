"""Quadtree airlight vs the golden CPU descent (per-block cv2.Canny)."""

import numpy as np
import pytest

from underwater_image_enhancement_tpu.ops import airlight
from underwater_image_enhancement_tpu.testing import golden


def _mk_img(rng, h=120, w=160):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [
            0.2 + 0.1 * np.sin(xx / 13.0),
            0.4 + 0.2 * (yy / h),
            0.5 + 0.2 * (xx / w),
        ],
        axis=-1,
    )
    img = np.clip(base + rng.normal(0, 0.05, (h, w, 3)), 0, 1).astype(np.float32)
    return (np.floor(img * 255) / 255).astype(np.float32)


def test_airlight_matches_canonical_sat_golden(rng):
    """TPU quadtree must match the canonical global-edge-map golden exactly
    (same spec; fp32 vs fp64 moment noise must not flip any descent here)."""
    for i in range(12):
        img = _mk_img(np.random.default_rng(100 + i))
        got = np.asarray(airlight.quadtree_airlight(img))
        want = golden.quadtree_airlight_sat(img.astype(np.float64))
        assert np.abs(got - want).max() < 1e-6, f"trial {i}"


def test_airlight_agreement_with_reference_perblock(rng):
    """Documented approximation: the reference recomputes Canny per block
    crop (enhancement_strategies.py:180-183); the canonical SAT descent uses
    a global edge map.  Quantify the A agreement rate across images."""
    matches = 0
    n_trials = 12
    for i in range(n_trials):
        img = _mk_img(np.random.default_rng(100 + i))
        got = np.asarray(airlight.quadtree_airlight(img))
        want = golden.quadtree_airlight(img.astype(np.float64))
        if np.abs(got - want).max() < 1e-6:
            matches += 1
    assert matches >= n_trials - 2, f"only {matches}/{n_trials} agree"


def test_airlight_exact_perblock_12_of_12(rng):
    """quadtree_airlight_exact recomputes Canny per child crop exactly like
    the reference (enhancement_strategies.py:180-183): the golden per-block
    descent must agree on ALL 12 test images (the global-edge-map canonical
    mode agrees on only ~10/12)."""
    for i in range(12):
        img = _mk_img(np.random.default_rng(100 + i))
        got = np.asarray(airlight.quadtree_airlight_exact(img))
        want = golden.quadtree_airlight(img.astype(np.float64))
        assert np.abs(got - want).max() < 1e-6, f"trial {i}"


def test_airlight_exact_odd_sizes():
    img = _mk_img(np.random.default_rng(56), h=101, w=147)
    got = np.asarray(airlight.quadtree_airlight_exact(img))
    want = golden.quadtree_airlight(img.astype(np.float64))
    assert np.abs(got - want).max() < 1e-6


def test_airlight_batch_consistent(rng):
    imgs = np.stack([_mk_img(np.random.default_rng(7)), _mk_img(np.random.default_rng(8))])
    batch = np.asarray(airlight.quadtree_airlight_batch(imgs))
    for i in range(2):
        single = np.asarray(airlight.quadtree_airlight(imgs[i]))
        np.testing.assert_allclose(batch[i], single, atol=1e-7)


def test_airlight_bright_corner():
    """A deterministic edge-free case: the smooth bright blue-green gradient
    region must win and yield its brightest pixel, identically to golden."""
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) / 64.0
    img = np.stack([0.15 + 0.1 * xx, 0.3 + 0.4 * xx * yy, 0.35 + 0.5 * xx * yy],
                   axis=-1).astype(np.float32)
    got = np.asarray(airlight.quadtree_airlight(img))
    for want in (golden.quadtree_airlight(img.astype(np.float64)),
                 golden.quadtree_airlight_sat(img.astype(np.float64))):
        np.testing.assert_allclose(got, want, atol=1e-6)
    # brightest pixel of the image is at (63, 63); the descent should end there
    np.testing.assert_allclose(got, img[63, 63], atol=1e-6)


def test_airlight_odd_sizes():
    img = _mk_img(np.random.default_rng(55), h=101, w=147)
    got = np.asarray(airlight.quadtree_airlight(img))
    want = golden.quadtree_airlight_sat(img.astype(np.float64))
    assert np.abs(got - want).max() < 1e-6
