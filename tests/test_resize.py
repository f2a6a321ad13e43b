"""cv2.resize INTER_LINEAR parity (ops/resize.py).

The u8 path reproduces cv2's fixed-point pipeline bit-for-bit, including
the two behaviors discovered against cv2 5.0 on this container:
- source coordinates are computed in FLOAT32 (``(float)((dx+0.5)*scale -
  0.5)``) — f64 coords flip 2048-scaled coefficients on strong downscales;
- vertical borders clamp the row INDICES but keep fractional betas (both
  taps read the same row with split coefficients), while horizontal
  borders collapse to one full-weight tap (HResize xmax machinery).
"""

import numpy as np
import cv2
import jax.numpy as jnp

from underwater_image_enhancement_tpu.ops.resize import resize_u8, resize_bilinear


def test_resize_u8_bit_exact_vs_cv2(rng):
    shapes = [(480, 640), (123, 77), (711, 1033), (97, 130), (1080, 1920),
              (128, 128), (37, 41), (1000, 4), (4, 1000), (99, 201)]
    outs = [(128, 128), (224, 224), (64, 96), (37, 53)]
    for (H, W) in shapes:
        img = rng.integers(0, 256, (H, W)).astype(np.uint8)
        for (oh, ow) in outs:
            want = cv2.resize(img, (ow, oh), interpolation=cv2.INTER_LINEAR)
            got = np.asarray(resize_u8(jnp.asarray(img.astype(np.int32)),
                                       oh, ow))
            np.testing.assert_array_equal(
                got, want.astype(np.int64),
                err_msg=f"{H}x{W} -> {oh}x{ow}")


def test_resize_bilinear_float_close(rng):
    img = rng.random((97, 130, 3)).astype(np.float32)
    want = cv2.resize(img, (64, 48), interpolation=cv2.INTER_LINEAR)
    got = np.asarray(resize_bilinear(jnp.asarray(img), 48, 64))
    # float path: fp32-precision agreement away from borders
    assert np.abs(got - want).max() < 1e-3
