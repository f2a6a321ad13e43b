"""Pallas kernel tests (interpret mode on the CPU backend)."""

import numpy as np
import jax.numpy as jnp

from underwater_image_enhancement_tpu.ops.edges import _dilate8, canny_u8
from underwater_image_enhancement_tpu.ops.pallas_kernels import hysteresis_propagate


def _xla_hyst(strong, weak, iters=64):
    e = jnp.asarray(strong)
    w = jnp.asarray(weak)
    for _ in range(iters):
        e = e | (w & _dilate8(e))
    return np.asarray(e)


def test_hysteresis_bit_identical(rng):
    for shape in [(200, 256), (130, 128), (64, 384)]:
        strong = (rng.random(shape) < 0.01).astype(np.int32)
        weak = ((rng.random(shape) < 0.3).astype(np.int32)) & (1 - strong)
        got = np.asarray(hysteresis_propagate(jnp.asarray(strong), jnp.asarray(weak)))
        want = _xla_hyst(strong, weak)
        np.testing.assert_array_equal(got, want)


def test_canny_pallas_flag_identical(rng):
    gray = rng.integers(0, 256, (160, 256)).astype(np.int32)
    a = np.asarray(canny_u8(jnp.asarray(gray), use_pallas=True))
    b = np.asarray(canny_u8(jnp.asarray(gray), use_pallas=False))
    np.testing.assert_array_equal(a, b)
