"""Parity tests: Sobel / Laplacian / Canny vs cv2."""

import cv2
import numpy as np
import jax.numpy as jnp

from underwater_image_enhancement_tpu.ops import edges
from underwater_image_enhancement_tpu.testing.golden import gray_unit


def test_sobel_matches_cv2(underwater_img):
    g = gray_unit(underwater_img).astype(np.float32)
    gx = np.asarray(edges.sobel(g, "x"))
    gy = np.asarray(edges.sobel(g, "y"))
    wx = cv2.Sobel(g, cv2.CV_32F, 1, 0, ksize=3)
    wy = cv2.Sobel(g, cv2.CV_32F, 0, 1, ksize=3)
    np.testing.assert_allclose(gx, wx, atol=1e-5)
    np.testing.assert_allclose(gy, wy, atol=1e-5)


def test_laplacian_k1_matches_cv2(underwater_img):
    g = gray_unit(underwater_img).astype(np.float32)
    got = np.asarray(edges.laplacian(g, ksize=1))
    want = cv2.Laplacian(g.astype(np.float64), cv2.CV_64F)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_laplacian_k3_matches_cv2(underwater_img):
    u8 = (gray_unit(underwater_img) * 255).astype(np.uint8)
    got = np.asarray(edges.laplacian(u8.astype(np.int32).astype(np.float32), ksize=3))
    want = cv2.Laplacian(u8, cv2.CV_64F, ksize=3)
    np.testing.assert_allclose(got, want, atol=1e-4)


def _canny_agreement(gray_u8, low=50, high=150):
    want = (cv2.Canny(gray_u8, low, high) > 0).astype(np.int32)
    got = np.asarray(edges.canny_u8(gray_u8.astype(np.int32), low, high))
    agree = (got == want).mean()
    d_want = want.mean()
    d_got = got.mean()
    return agree, d_got, d_want


def test_canny_agreement_natural(underwater_img):
    u8 = (gray_unit(underwater_img) * 255).astype(np.uint8)
    agree, d_got, d_want = _canny_agreement(u8)
    assert agree > 0.99
    # edge DENSITY (what the reference consumes) must be very close
    assert abs(d_got - d_want) < 0.005


def test_canny_agreement_random(rng):
    u8 = rng.integers(0, 256, (96, 128), dtype=np.uint8)
    agree, d_got, d_want = _canny_agreement(u8)
    assert agree > 0.97
    assert abs(d_got - d_want) < 0.02


def test_canny_structured():
    """A clean geometric image: circles + box, where hysteresis matters."""
    img = np.zeros((128, 128), np.uint8)
    cv2.circle(img, (40, 40), 25, 200, -1)
    cv2.rectangle(img, (60, 60), (110, 110), 120, -1)
    cv2.circle(img, (90, 30), 10, 80, 2)
    agree, d_got, d_want = _canny_agreement(img)
    assert agree > 0.995
    assert abs(d_got - d_want) < 0.005


def test_hysteresis_packed_bit_identical_to_loop(rng):
    """Row-packed propagation == the naive dilate loop, bit for bit, at
    32-indivisible heights, short planes, narrow planes, and batched."""
    from underwater_image_enhancement_tpu.ops.edges import (
        _dilate8, _hysteresis_packed)
    import jax

    def loop(strong, weak, iters):
        e = jnp.asarray(strong)
        w = jnp.asarray(weak)
        for _ in range(iters):
            e = e | (w & _dilate8(e))
        return np.asarray(e)

    for shape, iters in [((67, 90), 64), ((17, 40), 8), ((200, 31), 64),
                         ((32, 32), 3), ((1, 5), 4)]:
        strong = (rng.random(shape) < 0.02).astype(np.int32)
        weak = ((rng.random(shape) < 0.4).astype(np.int32)) & (1 - strong)
        got = np.asarray(_hysteresis_packed(
            jnp.asarray(strong), jnp.asarray(weak), iters))
        np.testing.assert_array_equal(got, loop(strong, weak, iters))

    # vmapped: the label program maps canny over batch x strategies
    B = 3
    strong = (rng.random((B, 45, 70)) < 0.02).astype(np.int32)
    weak = ((rng.random((B, 45, 70)) < 0.4).astype(np.int32)) & (1 - strong)
    got = np.asarray(jax.vmap(
        lambda s, w: _hysteresis_packed(s, w, 16))(jnp.asarray(strong),
                                                   jnp.asarray(weak)))
    for i in range(B):
        np.testing.assert_array_equal(got[i], loop(strong[i], weak[i], 16))
