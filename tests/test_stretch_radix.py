"""Radix-select percentile (ops/stretch._perc_pair_radix) vs the sort
oracle: the radix path must select the IDENTICAL order statistics and
interpolate with the same arithmetic — on the suite's no-FMA CPU backend
the pair is bit-equal to jnp.percentile.  It is the production method for
the Phase-1 label strategies (pipeline/strategies.py), replacing 15
full-channel sorts per batch (measured >half the label program on v5e).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from underwater_image_enhancement_tpu.ops import stretch


def _pairs(channel, lo, hi):
    a = stretch._perc_pair_sort(jnp.asarray(channel), lo, hi)
    b = stretch._perc_pair_radix(jnp.asarray(channel), lo, hi)
    return [float(x) for x in a], [float(x) for x in b]


@pytest.mark.parametrize("lo,hi", [(10.0, 95.0), (15.0, 92.0), (20.0, 85.0),
                                   (10.0, 90.0), (0.0, 100.0)])
def test_radix_bit_equal_random_f32(rng, lo, hi):
    x = rng.random((217, 331)).astype(np.float32)  # arbitrary off-grid f32
    want, got = _pairs(x, lo, hi)
    assert want == got, (want, got)


def test_radix_bit_equal_u8_grid(rng):
    x = (rng.integers(0, 256, (120, 160)) / 255.0).astype(np.float32)
    want, got = _pairs(x, 15.0, 95.0)
    assert want == got, (want, got)


def test_radix_heavy_duplicates(rng):
    # many ties: cumulative-count boundaries land inside buckets
    x = (rng.integers(0, 4, (64, 64)) / 4.0).astype(np.float32)
    want, got = _pairs(x, 10.0, 95.0)
    assert want == got, (want, got)


def test_radix_constant_and_extremes():
    want, got = _pairs(np.full((32, 32), 0.25, np.float32), 15.0, 95.0)
    assert want == got
    x = np.zeros((16, 16), np.float32)
    x[0, 0] = 1.0
    want, got = _pairs(x, 0.0, 100.0)
    assert want == got


def test_radix_tiny_and_odd_sizes(rng):
    for shape in [(1, 1), (1, 3), (7, 5)]:
        x = rng.random(shape).astype(np.float32)
        want, got = _pairs(x, 15.0, 95.0)
        assert want == got, (shape, want, got)


def test_radix_subnormal_and_exact_one(rng):
    # exercise the bottom and top of the non-negative bit-pattern order
    x = rng.random((33, 65)).astype(np.float32)
    x.flat[0] = 0.0
    x.flat[1] = np.float32(1e-40)  # subnormal
    x.flat[2] = 1.0
    want, got = _pairs(x, 1.0, 99.0)
    assert want == got, (want, got)


def test_radix_equal_and_close_percentiles(rng):
    """Equal/adjacent percentiles share candidate prefixes at every level
    — exercises the slotted histogram's first-match + fixup path."""
    x = rng.random((77, 103)).astype(np.float32)
    got = stretch.percentiles_radix(jnp.asarray(x), (50.0, 50.0, 50.001))
    flat = jnp.asarray(x).reshape(-1)
    for i, p in enumerate((50.0, 50.0, 50.001)):
        a, _ = stretch._perc_pair_sort(flat, p, p)
        assert float(got[i]) == float(a), (i, float(got[i]), float(a))


def test_color_enhancement_planes_radix_joint(rng):
    # the joint 3-channel path (one histogram call per radix level over
    # all channel x rank rows) == the per-channel sort oracle, bit-exact
    planes = tuple(jnp.asarray(rng.random((91, 123)).astype(np.float32))
                   for _ in range(3))
    want = stretch.color_enhancement_planes(planes, 15.0, 92.0,
                                            method="sort")
    got = stretch.color_enhancement_planes(planes, 15.0, 92.0,
                                           method="radix")
    for w, g in zip(want, got):
        np.testing.assert_array_equal(np.asarray(w), np.asarray(g))


def test_stretch_channel_radix_method(rng):
    x = rng.random((96, 128)).astype(np.float32)
    a = np.asarray(stretch.stretch_channel(jnp.asarray(x), 15.0, 95.0,
                                           method="sort"))
    b = np.asarray(stretch.stretch_channel(jnp.asarray(x), 15.0, 95.0,
                                           method="radix"))
    np.testing.assert_array_equal(a, b)
