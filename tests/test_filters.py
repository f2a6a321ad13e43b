"""Parity tests: box filter, guided filter, dehaze chain, stretch/gamma."""

import cv2
import numpy as np
import pytest

from underwater_image_enhancement_tpu.ops import boxfilter, dehaze, guided, stretch
from underwater_image_enhancement_tpu.testing import golden
from tests.conftest import psnr


@pytest.mark.parametrize("r", [2, 3, 10, 15, 20, 25])
def test_box_filter_vs_cv2(underwater_img, r):
    gray = underwater_img[..., 1]
    got = np.asarray(boxfilter.box_filter(gray, r))
    want = cv2.boxFilter(gray.astype(np.float64), cv2.CV_64F, (r, r))
    assert np.abs(got - want).max() < 1e-5
    assert psnr(got, want) > 80


def test_box_filter_batched(underwater_img):
    x = np.stack([underwater_img[..., 0], underwater_img[..., 2]])
    got = np.asarray(boxfilter.box_filter(x, 15))
    for i in range(2):
        want = cv2.boxFilter(x[i].astype(np.float64), cv2.CV_64F, (15, 15))
        assert np.abs(got[i] - want).max() < 1e-5


@pytest.mark.parametrize("r,eps", [(15, 0.001), (20, 0.5), (10, 0.1)])
def test_guided_filter(underwater_img, r, eps):
    guide = golden.gray_unit(underwater_img).astype(np.float32)
    src = underwater_img[..., 2]
    got = np.asarray(guided.guided_filter(guide, src, r, eps))
    want = golden.gf(guide, src, r, eps)
    assert psnr(got, want) > 60


def test_transmission_and_recover(underwater_img):
    A = np.array([0.4, 0.7, 0.8], np.float32)
    t_got = np.asarray(dehaze.estimate_transmission(underwater_img, A, 0.6, 20, 0.001))
    t_want = golden.transmission(underwater_img.astype(np.float64), A, 0.6, 20, 0.001)
    assert psnr(t_got, t_want) > 60

    j_got = np.asarray(dehaze.recover_image(underwater_img, t_got, A))
    j_want = golden.recover(underwater_img.astype(np.float64), t_want, A)
    assert psnr(j_got, j_want) > 55


def test_transmission_six_flavor(underwater_img):
    A = np.array([0.5, 0.6, 0.9], np.float32)
    t_got = np.asarray(
        dehaze.estimate_transmission_six(underwater_img, A, 0.3, 20, 0.5)
    )
    t_want = golden.transmission_six(underwater_img.astype(np.float64), A, 0.3, 20, 0.5)
    assert psnr(t_got, t_want) > 60


def test_stretch_vs_golden(underwater_img):
    got = np.asarray(stretch.color_enhancement(underwater_img, 15.0, 95.0))
    want = golden.stretch(underwater_img.astype(np.float64), 15, 95)
    assert psnr(got, want) > 60


def test_stretch_batched_independent(underwater_img):
    """Percentiles must be per-image, not pooled across the batch."""
    darker = (underwater_img * 0.5).astype(np.float32)
    batch = np.stack([underwater_img, darker])
    got = np.asarray(stretch.color_enhancement(batch, 10.0, 90.0))
    for i, im in enumerate([underwater_img, darker]):
        want = golden.stretch(im.astype(np.float64), 10, 90)
        assert psnr(got[i], want) > 60


def test_stretch_hist_method_close(underwater_img):
    exact = np.asarray(stretch.color_enhancement(underwater_img, 15.0, 95.0))
    fast = np.asarray(
        stretch.color_enhancement(underwater_img, 15.0, 95.0, method="hist")
    )
    assert psnr(fast, exact) > 40  # fast path is approximate by design


def test_white_balance(underwater_img):
    got = np.asarray(stretch.white_balance(underwater_img, 2.0))
    want = golden.white_balance(underwater_img.astype(np.float64), 2)
    assert psnr(got, want) > 60


def test_gamma_both_conventions(underwater_img):
    got_inv = np.asarray(stretch.gamma_correction_inv(underwater_img, 1.2))
    np.testing.assert_allclose(
        got_inv, golden.gamma_inv(underwater_img.astype(np.float64), 1.2), atol=1e-5
    )
    got_pow = np.asarray(stretch.gamma_correction_pow(underwater_img, 1.5))
    np.testing.assert_allclose(
        got_pow, golden.gamma_pow(underwater_img.astype(np.float64), 1.5), atol=1e-5
    )
