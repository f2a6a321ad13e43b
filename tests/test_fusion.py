"""Ancuti multi-scale fusion: pyramid parity vs cv2, fusion vs f64 oracle."""

import cv2
import numpy as np
import jax.numpy as jnp

from underwater_image_enhancement_tpu.ops import pyramid
from underwater_image_enhancement_tpu.pipeline import fusion
from underwater_image_enhancement_tpu.testing import golden_fusion as gf

from .conftest import psnr


def test_pyr_down_matches_cv2(rng):
    """cv2.pyrDown parity on an even-sized plane (the kernel/border spec)."""
    x = rng.random((128, 192)).astype(np.float32)
    got = np.asarray(pyramid.pyr_down(jnp.asarray(x)))
    want = cv2.pyrDown(x)
    assert got.shape == want.shape == (64, 96)
    assert np.abs(got - want).max() < 1e-5


def test_pyr_up_matches_cv2(rng):
    x = rng.random((64, 96)).astype(np.float32)
    got = np.asarray(pyramid.pyr_up(jnp.asarray(x), (128, 192)))
    want = cv2.pyrUp(x)
    assert got.shape == want.shape == (128, 192)
    assert np.abs(got - want).max() < 1e-5


def test_laplacian_pyramid_reconstructs(rng):
    """reconstruct(laplacian_pyramid(x)) == x (odd sizes included)."""
    for h, w in [(128, 192), (101, 147)]:
        x = rng.random((h, w)).astype(np.float32)
        lap = pyramid.laplacian_pyramid(jnp.asarray(x), 4)
        back = np.asarray(pyramid.reconstruct(lap))
        assert np.abs(back - x).max() < 1e-5, (h, w)


def test_gray_world_wb(underwater_img):
    out = np.asarray(fusion.gray_world_wb(jnp.asarray(underwater_img)))
    want = gf.gray_world_wb(underwater_img.astype(np.float64))
    assert psnr(out, want) > 55
    # channel means equalized (up to clipping)
    m = out.reshape(-1, 3).mean(axis=0)
    assert m.std() < 0.02


def test_ancuti_fusion_matches_oracle(underwater_img):
    """>= 50 dB vs the float64 numpy oracle (BASELINE.json config #4 gate)."""
    got = np.asarray(fusion.ancuti_fusion(jnp.asarray(underwater_img)))
    want = gf.ancuti_fusion(underwater_img.astype(np.float64))
    p = psnr(got, want)
    assert p > 50, p
    assert got.shape == underwater_img.shape
    assert got.min() >= 0.0 and got.max() <= 1.0


def test_ancuti_fusion_batched(underwater_img, rng):
    """vmapped batch equals per-image results."""
    other = (np.floor(np.clip(
        underwater_img[::-1].copy() * 0.8 + 0.05, 0, 1) * 255) / 255
    ).astype(np.float32)
    batch = np.stack([underwater_img, other])
    got = np.asarray(fusion.ancuti_fusion(jnp.asarray(batch)))
    for i, im in enumerate(batch):
        single = np.asarray(fusion.ancuti_fusion(jnp.asarray(im)))
        np.testing.assert_allclose(got[i], single, atol=1e-6)


def test_fusion_improves_degraded_image(underwater_img):
    """Sanity: fusion should raise the comprehensive quality score of the
    blue-green hazy fixture (it fuses WB + CLAHE, both contrast lifters)."""
    from underwater_image_enhancement_tpu.metrics.quality import (
        comprehensive_assessment,
    )

    before, _ = comprehensive_assessment(jnp.asarray(underwater_img))
    out = fusion.ancuti_fusion(jnp.asarray(underwater_img))
    after, _ = comprehensive_assessment(out)
    assert float(after) > float(before)
