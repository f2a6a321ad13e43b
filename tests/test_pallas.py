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


def test_canny_pallas_short_iters_identical(rng):
    gray = rng.integers(0, 256, (96, 128)).astype(np.int32)
    a = np.asarray(canny_u8(jnp.asarray(gray), hysteresis_iters=16,
                            use_pallas=True))
    b = np.asarray(canny_u8(jnp.asarray(gray), hysteresis_iters=16,
                            use_pallas=False))
    np.testing.assert_array_equal(a, b)


def _planes(rng, shape, extremes=True):
    """Random u8 planes; first pixels pinned to table-boundary extremes."""
    p = rng.integers(0, 256, (3,) + shape).astype(np.int32)
    if extremes:
        for i, v in enumerate([0, 255, 128, 1, 254, 20, 21]):
            p[:, 0, i] = v
    return p


def test_lab_forward_kernel_bit_identical(rng):
    """Pallas forward LAB vs the float64 numpy oracle (the cv2 spec).

    The oracle, not impl="xla", is the comparison target: on the real TPU
    the surrogate-arithmetic XLA path was measured to drift +-1 LSB at some
    shapes (128x256, 64x100) while the lane-gather kernel is exact — which
    is exactly why the kernel is the TPU default."""
    from underwater_image_enhancement_tpu.ops import colorspace as cs
    from underwater_image_enhancement_tpu.ops import lab_tables as lt

    for shape in [(150, 200), (128, 256), (64, 100)]:
        p = _planes(rng, shape)
        want = lt.rgb_to_lab_u8_exact_np(
            p.transpose(1, 2, 0).astype(np.uint8)).astype(np.int64)
        got = cs.rgb_to_lab_u8_exact_planes(*(jnp.asarray(x) for x in p),
                                            impl="pallas")
        got = np.stack([np.asarray(x) for x in got], -1).astype(np.int64)
        np.testing.assert_array_equal(got, want)


def test_lab_inverse_kernel_bit_identical(rng):
    from underwater_image_enhancement_tpu.ops import colorspace as cs
    from underwater_image_enhancement_tpu.ops import lab_tables as lt

    for shape in [(150, 200), (128, 256)]:
        p = _planes(rng, shape)
        want = lt.lab_to_rgb_u8_exact_np(
            p.transpose(1, 2, 0).astype(np.uint8)).astype(np.int64)
        got = cs.lab_to_rgb_u8_exact_planes(*(jnp.asarray(x) for x in p),
                                            impl="pallas")
        got = np.stack([np.asarray(x) for x in got], -1).astype(np.int64)
        np.testing.assert_array_equal(got, want)


def test_lab_roundtrip_kernels_vs_cv2_oracle(rng):
    """Kernel path vs the float64 numpy oracle derived from OpenCV sources
    (ops/lab_tables.py) — independent of the XLA surrogate path."""
    from underwater_image_enhancement_tpu.ops import lab_tables as lt

    rgb = _planes(rng, (80, 96)).transpose(1, 2, 0)
    want = lt.rgb_to_lab_u8_exact_np(rgb.astype(np.uint8))
    r, g, b = (jnp.asarray(rgb[..., c]) for c in range(3))
    from underwater_image_enhancement_tpu.ops.pallas_kernels import (
        lab_forward_planes, lab_inverse_planes)

    L, A, B = lab_forward_planes(r, g, b)
    got = np.stack([np.asarray(L), np.asarray(A), np.asarray(B)], axis=-1)
    np.testing.assert_array_equal(got, want.astype(np.int32))

    lab = _planes(rng, (80, 96)).transpose(1, 2, 0)
    want2 = lt.lab_to_rgb_u8_exact_np(lab.astype(np.uint8))
    rr, gg, bb = lab_inverse_planes(*(jnp.asarray(lab[..., c])
                                      for c in range(3)))
    got2 = np.stack([np.asarray(rr), np.asarray(gg), np.asarray(bb)], axis=-1)
    np.testing.assert_array_equal(got2, want2.astype(np.int32))


def test_clahe_vmap_rule_matches_per_image(rng):
    """vmap(clahe_u8) routes through the batch-folded formulation
    (histeq._clahe_u8_batched); outputs must equal per-image calls
    bit-for-bit on both impls."""
    import jax
    from underwater_image_enhancement_tpu.ops.histeq import clahe_u8

    x = rng.integers(0, 256, (3, 90, 121)).astype(np.int32)
    for impl in ("xla", "pallas"):
        got = jax.vmap(lambda p: clahe_u8(p, 3.0, impl=impl))(jnp.asarray(x))
        for b in range(x.shape[0]):
            want = clahe_u8(jnp.asarray(x[b]), 3.0, impl=impl)
            np.testing.assert_array_equal(np.asarray(got[b]),
                                          np.asarray(want))


def test_sat_rows_kernel_exact(rng):
    from underwater_image_enhancement_tpu.ops.pallas_kernels import sat_rows

    for shape in [(7, 100, 130), (3, 64, 128), (1, 200, 256)]:
        x = rng.random(shape).astype(np.float32)
        got = np.asarray(sat_rows(jnp.asarray(x)))
        want = np.concatenate(
            [np.zeros((shape[0], 1, shape[2]), np.float64),
             np.cumsum(x.astype(np.float64), axis=1)], axis=1)
        # f64 reference within f32 prefix-sum error; the kernel's
        # Hillis-Steele association differs from XLA's cumsum in the last
        # bits, which is why only the fast airlight path uses it
        np.testing.assert_allclose(got, want, rtol=3e-6, atol=1e-4)
        # integer inputs: exact (no rounding at u8-scale prefix sums)
        xi = rng.integers(0, 256, shape).astype(np.float32)
        goti = np.asarray(sat_rows(jnp.asarray(xi)))
        wanti = np.concatenate(
            [np.zeros((shape[0], 1, shape[2]), np.float64),
             np.cumsum(xi.astype(np.float64), axis=1)], axis=1)
        np.testing.assert_array_equal(goti, wanti.astype(np.float32))


def test_lab_unit_kernels_bit_identical(rng):
    """In-kernel quantize/unit conversions == separate quantize_u8 /
    u8_to_unit passes, including the truncation and f32-division details."""
    from underwater_image_enhancement_tpu.ops import colorspace as cs

    img = rng.random((70, 100, 3)).astype(np.float32)
    planes = tuple(jnp.asarray(img[..., c]) for c in range(3))
    want = cs.rgb_to_lab_u8_exact_planes(
        *(cs.quantize_u8(p) for p in planes), impl="pallas")
    got = cs.rgb_unit_to_lab_planes(*planes, impl="pallas")
    for gp, wp in zip(got, want):
        np.testing.assert_array_equal(np.asarray(gp), np.asarray(wp))

    lab = tuple(jnp.asarray(x) for x in
                rng.integers(0, 256, (3, 70, 100)).astype(np.int32))
    # the u8 ints must agree exactly; the /255 unit conversion may differ
    # by 1 ulp between codegens (XLA rewrites jitted division to a
    # reciprocal multiply — 126/256 u8 values differ from IEEE division)
    want8 = cs.lab_to_rgb_u8_exact_planes(*lab, impl="pallas")
    gotr = cs.lab_to_rgb_unit_planes(*lab, impl="pallas")
    for gp, wp in zip(gotr, want8):
        g255 = np.rint(np.asarray(gp) * 255.0).astype(np.int64)
        np.testing.assert_array_equal(g255, np.asarray(wp))
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(wp).astype(np.float64) / 255.0,
            rtol=0, atol=1e-7)


def test_lab_inverse_gamma_epilogue(rng):
    """The gamma-folded inverse kernel (six's post-CLAHE gamma as an
    in-kernel 256-entry LUT): the LUT pow(k/255, g) is applied EXACTLY
    (gathered bit-for-bit), and the result is within 1 ulp of composing
    lab_to_rgb_unit_planes + gamma_correction_pow (XLA's pow drifts the
    last ulp between evaluation shapes, so exact equality to the composed
    pass is not a stable target).  Plain and vmapped, odd shapes."""
    import jax
    from underwater_image_enhancement_tpu.ops import colorspace as cs
    from underwater_image_enhancement_tpu.ops.stretch import (
        _U8_GRID, gamma_correction_pow)

    for shape, g in [((70, 100), 1.5), ((64, 128), 1.2), ((33, 57), 1.4)]:
        lab = tuple(jnp.asarray(x) for x in
                    rng.integers(0, 256, (3,) + shape).astype(np.int32))
        unit = cs.lab_to_rgb_unit_planes(*lab, impl="pallas")
        lut = np.asarray(jnp.power(jnp.asarray(_U8_GRID), jnp.float32(g)))
        got = cs.lab_to_rgb_unit_gamma_planes(*lab, g, impl="pallas")
        for gp, up in zip(got, unit):
            v8 = np.rint(np.asarray(up) * 255.0).astype(np.int64)
            np.testing.assert_array_equal(np.asarray(gp), lut[v8])
            np.testing.assert_allclose(
                np.asarray(gp), np.asarray(gamma_correction_pow(up, g)),
                rtol=0, atol=2.4e-7)

    labb = tuple(jnp.asarray(x) for x in
                 rng.integers(0, 256, (3, 2, 40, 60)).astype(np.int32))
    f = jax.vmap(lambda L, a, b: jnp.stack(
        cs.lab_to_rgb_unit_gamma_planes(L, a, b, 1.3, impl="pallas"), -1))
    gotb = np.asarray(f(*labb))
    lut13 = np.asarray(jnp.power(jnp.asarray(_U8_GRID), jnp.float32(1.3)))
    for bi in range(2):
        unit_i = cs.lab_to_rgb_unit_planes(*(x[bi] for x in labb),
                                           impl="pallas")
        want_i = np.stack([lut13[np.rint(np.asarray(u) * 255.0).astype(
            np.int64)] for u in unit_i], -1)
        np.testing.assert_array_equal(gotb[bi], want_i)


def test_clahe_lab_fused_bit_identical(rng):
    """Fused CLAHE+inverse-LAB pass == split clahe_u8 + lab_to_rgb,
    single image and vmapped."""
    import jax
    from underwater_image_enhancement_tpu.ops.histeq import (
        clahe_enhancement_planes)

    for shape in [(90, 121), (128, 128)]:
        imgs = rng.random((2,) + shape + (3,)).astype(np.float32)
        planes = tuple(jnp.asarray(imgs[0, ..., c]) for c in range(3))
        want = clahe_enhancement_planes(planes, 3.0, impl="split")
        got = clahe_enhancement_planes(planes, 3.0, impl="fused")
        for gp, wp in zip(got, want):
            np.testing.assert_array_equal(np.asarray(gp), np.asarray(wp))
        # vmapped: the custom_vmap rule folds the batch into the block grid
        f = jax.vmap(lambda im: jnp.stack(clahe_enhancement_planes(
            tuple(im[..., c] for c in range(3)), 3.0, impl="fused"), -1))
        gotb = np.asarray(f(jnp.asarray(imgs)))
        for bi in range(2):
            planes_i = tuple(jnp.asarray(imgs[bi, ..., c]) for c in range(3))
            want_i = np.stack([np.asarray(p) for p in
                               clahe_enhancement_planes(planes_i, 3.0,
                                                        impl="split")], -1)
            np.testing.assert_array_equal(gotb[bi], want_i)


def test_clahe_pallas_impl_bit_identical(rng):
    from underwater_image_enhancement_tpu.ops.histeq import clahe_u8

    for shape, tiles in [((137, 211), (8, 8)), ((128, 128), (4, 4)),
                         ((97, 260), (8, 8))]:
        x = jnp.asarray(rng.integers(0, 256, shape).astype(np.int32))
        a = np.asarray(clahe_u8(x, 2.0, tiles[0], tiles[1], impl="pallas"))
        b = np.asarray(clahe_u8(x, 2.0, tiles[0], tiles[1], impl="xla"))
        np.testing.assert_array_equal(a, b)


def test_sat_rows_vmap_folds_batch(rng):
    """The custom_vmap rule (batch -> plane-axis fold) is bit-identical to
    mapping the kernel per example — the vmapped fast airlight path keeps
    the Pallas scan instead of falling back to XLA cumsum."""
    import jax

    from underwater_image_enhancement_tpu.ops.pallas_kernels import sat_rows

    x = rng.random((4, 3, 60, 130)).astype(np.float32)
    got = np.asarray(jax.vmap(sat_rows)(jnp.asarray(x)))
    for b in range(4):
        want = np.asarray(sat_rows(jnp.asarray(x[b])))
        np.testing.assert_array_equal(got[b], want)
