"""Parity tests: equalizeHist and CLAHE vs cv2."""

import cv2
import numpy as np
import pytest

from underwater_image_enhancement_tpu.ops import histeq
from underwater_image_enhancement_tpu.testing import golden
from tests.conftest import psnr


def test_equalize_hist_bit_exact(rgb_u8):
    for c in range(3):
        plane = rgb_u8[..., c]
        got = np.asarray(histeq.equalize_hist_u8(plane.astype(np.int32)))
        want = cv2.equalizeHist(plane).astype(np.int32)
        np.testing.assert_array_equal(got, want)


def test_equalize_hist_natural(underwater_img):
    u8 = (underwater_img * 255).astype(np.uint8)
    for c in range(3):
        got = np.asarray(histeq.equalize_hist_u8(u8[..., c].astype(np.int32)))
        want = cv2.equalizeHist(u8[..., c]).astype(np.int32)
        np.testing.assert_array_equal(got, want)


def test_equalize_hist_constant():
    plane = np.full((32, 32), 77, np.int32)
    got = np.asarray(histeq.equalize_hist_u8(plane))
    want = cv2.equalizeHist(plane.astype(np.uint8)).astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_histogram_equalization_full(underwater_img):
    got = np.asarray(histeq.histogram_equalization(underwater_img))
    want = golden.hist_eq(underwater_img.astype(np.float64))
    assert psnr(got, want) > 50


@pytest.mark.parametrize("clip", [1.5, 2.0, 3.0, 3.5, 4.0])
def test_clahe_l_channel_bit_exact(underwater_img, clip):
    """CLAHE on a uint8 plane must be bit-exact vs cv2 (divisible size)."""
    u8 = (underwater_img * 255).astype(np.uint8)
    gray = cv2.cvtColor(u8, cv2.COLOR_RGB2GRAY)  # 120x160: divisible by 8
    c = cv2.createCLAHE(clipLimit=clip, tileGridSize=(8, 8))
    want = c.apply(gray).astype(np.int32)
    got = np.asarray(histeq.clahe_u8(gray.astype(np.int32), clip))
    np.testing.assert_array_equal(got, want)


def test_clahe_nondivisible_size(rng):
    """H, W not multiples of 8 exercise the REFLECT_101 padding path."""
    gray = rng.integers(0, 256, (101, 147), dtype=np.uint8)
    c = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
    want = c.apply(gray).astype(np.int32)
    got = np.asarray(histeq.clahe_u8(gray.astype(np.int32), 2.0))
    np.testing.assert_array_equal(got, want)


def test_clahe_enhancement_end_to_end_bit_exact(underwater_img):
    """Full roundtrip (quantize -> RGB2LAB -> CLAHE -> LAB2RGB) must be
    BIT-EXACT vs cv2: every stage replicates OpenCV's integer pipeline."""
    got = np.asarray(histeq.clahe_enhancement(underwater_img, 2.0))
    want = golden.clahe(underwater_img.astype(np.float64), 2.0)
    np.testing.assert_array_equal((got * 255).round(), (want * 255).round())


def test_clahe_multi_matches_per_leg(rng):
    """clahe_enhancement_planes_multi (one folded program, per-image clip
    limits) == independent clahe_enhancement_planes calls, bit for bit."""
    import jax.numpy as jnp
    from underwater_image_enhancement_tpu.ops.histeq import (
        clahe_enhancement_planes, clahe_enhancement_planes_multi)

    imgs = rng.random((3, 70, 90, 3)).astype(np.float32)
    planes_list = [tuple(jnp.asarray(imgs[i, ..., c]) for c in range(3))
                   for i in range(3)]
    clips = (3.0, 1.5, 4.0)
    got = clahe_enhancement_planes_multi(planes_list, clips)
    for i in range(3):
        want = clahe_enhancement_planes(planes_list[i], clips[i])
        for gp, wp in zip(got[i], want):
            np.testing.assert_array_equal(np.asarray(gp), np.asarray(wp))
