"""Parity tests: ops.colorspace vs OpenCV (the reference's backend)."""

import cv2
import numpy as np
import pytest

from underwater_image_enhancement_tpu.ops import colorspace as cs
from tests.conftest import psnr


def test_gray_u8_bit_exact(rgb_u8):
    got = np.asarray(cs.rgb_to_gray_u8(rgb_u8.astype(np.int32)))
    want = cv2.cvtColor(rgb_u8, cv2.COLOR_RGB2GRAY).astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_gray_f32(img_unit):
    got = np.asarray(cs.rgb_to_gray_f32(img_unit))
    want = cv2.cvtColor(img_unit, cv2.COLOR_RGB2GRAY)
    assert np.abs(got - want).max() < 1e-6


def test_quantize_truncates():
    x = np.array([0.0, 0.2, 0.5, 0.999, 1.0], np.float32)
    got = np.asarray(cs.quantize_u8(x))
    want = (x * 255).astype(np.uint8).astype(np.int32)
    np.testing.assert_array_equal(got, want)


def test_hsv_u8_bit_exact(rgb_u8, underwater_img):
    for img in [rgb_u8, (underwater_img * 255).astype(np.uint8)]:
        got = np.asarray(cs.rgb_to_hsv_u8(img.astype(np.int32)))
        want = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.int32)
        np.testing.assert_array_equal(got, want)


def test_lab_u8_close(rgb_u8):
    got = np.asarray(cs.rgb_to_lab_u8(rgb_u8.astype(np.int32)))
    want = cv2.cvtColor(rgb_u8, cv2.COLOR_RGB2LAB).astype(np.int32)
    assert np.abs(got - want).max() <= 2
    # PSNR on the u8 scale must clear 50 dB
    assert psnr(got, want, peak=255.0) > 50.0


def test_lab_roundtrip(rgb_u8, underwater_img):
    # Random saturated uint8 colors are the worst case (out-of-gamut clipping
    # amplifies 1-2 LSB Lab differences); require broad agreement there...
    lab = cs.rgb_to_lab_u8(rgb_u8.astype(np.int32))
    back = np.asarray(cs.lab_to_rgb_u8(lab))
    lab_cv = cv2.cvtColor(rgb_u8, cv2.COLOR_RGB2LAB)
    back_cv = cv2.cvtColor(lab_cv, cv2.COLOR_LAB2RGB).astype(np.int32)
    assert psnr(back, back_cv, peak=255.0) > 40.0
    # ...and tight parity on a natural image (the actual use case).  cv2's
    # 8U path uses fixed-point interpolation tables that carry ~±1 LSB noise
    # vs the exact float formulas, so vs-cv2 parity tops out around 43 dB;
    # the bit-close >50 dB gate is enforced against the float golden oracle
    # in testing/golden.py, which this module matches to fp32 precision.
    nat_u8 = (underwater_img * 255).astype(np.uint8)
    lab_n = cs.rgb_to_lab_u8(nat_u8.astype(np.int32))
    back_n = np.asarray(cs.lab_to_rgb_u8(lab_n))
    back_n_cv = cv2.cvtColor(
        cv2.cvtColor(nat_u8, cv2.COLOR_RGB2LAB), cv2.COLOR_LAB2RGB
    ).astype(np.int32)
    assert psnr(back_n, back_n_cv, peak=255.0) > 42.0


def test_lab2rgb_matches_cv2_on_modified_lab(rgb_u8):
    """CLAHE modifies L then converts back — test LAB2RGB on perturbed L."""
    lab = cv2.cvtColor(rgb_u8, cv2.COLOR_RGB2LAB)
    lab_mod = lab.copy()
    lab_mod[..., 0] = np.clip(lab[..., 0].astype(np.int32) + 13, 0, 255).astype(np.uint8)
    want = cv2.cvtColor(lab_mod, cv2.COLOR_LAB2RGB).astype(np.int32)
    got = np.asarray(cs.lab_to_rgb_u8(lab_mod.astype(np.int32)))
    # random u8 colors include extreme out-of-gamut chroma where cv2's
    # fixed-point tables diverge from exact float math; see test_lab_roundtrip
    assert psnr(got, want, peak=255.0) > 40.0


def test_batched_shapes(rgb_u8):
    batch = np.stack([rgb_u8, rgb_u8[::-1]]).astype(np.int32)
    out = cs.rgb_to_gray_u8(batch)
    assert out.shape == batch.shape[:-1]
    hsv = cs.rgb_to_hsv_u8(batch)
    assert hsv.shape == batch.shape


def test_unit_to_gray_unit(img_unit):
    got = np.asarray(cs.unit_to_gray_unit(img_unit))
    want = (
        cv2.cvtColor((img_unit * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY).astype(
            np.float32
        )
        / 255.0
    )
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_lab_exact_bit_exact_roundtrip(rgb_u8, underwater_img):
    """The integer LAB pipelines must match cv2 exactly, both directions."""
    for img in [rgb_u8, (underwater_img * 255).astype(np.uint8)]:
        fwd = np.asarray(cs.rgb_to_lab_u8_exact(img.astype(np.int32)))
        want_fwd = cv2.cvtColor(img, cv2.COLOR_RGB2LAB).astype(np.int32)
        np.testing.assert_array_equal(fwd, want_fwd)
        inv = np.asarray(cs.lab_to_rgb_u8_exact(want_fwd))
        want_inv = cv2.cvtColor(want_fwd.astype(np.uint8), cv2.COLOR_LAB2RGB).astype(np.int32)
        np.testing.assert_array_equal(inv, want_inv)


def test_lab_l_only_tier_bit_identical(rgb_u8, underwater_img):
    """The L-only forward tier (one CBRT lookup, one output plane — the
    brightness-metric path) must equal the full conversion's L channel
    bit-for-bit, on both impls, plain and vmapped, at odd shapes."""
    import jax
    import jax.numpy as jnp

    for img in [rgb_u8, (underwater_img * 255).astype(np.uint8),
                rgb_u8[: rgb_u8.shape[0] - 3, : rgb_u8.shape[1] - 5]]:
        u8 = jnp.asarray(img.astype(np.int32))
        want = np.asarray(cs.rgb_to_lab_u8_exact(u8)[..., 0])
        for impl in ("xla", "pallas"):
            got = np.asarray(cs.rgb_to_lab_l_u8_exact(u8, impl=impl))
            np.testing.assert_array_equal(got, want, err_msg=impl)
    # vmapped (the label program's batch path)
    batch = jnp.stack([jnp.asarray(rgb_u8.astype(np.int32))] * 3)
    got_b = np.asarray(jax.vmap(cs.rgb_to_lab_l_u8_exact)(batch))
    want_b = np.asarray(jax.vmap(lambda x: cs.rgb_to_lab_u8_exact(x)[..., 0])(batch))
    np.testing.assert_array_equal(got_b, want_b)


def test_surrogate_lookups_full_domain():
    """The f32 surrogate + device-probed correction must reproduce every
    static table entry on this backend, evaluated INSIDE a composed jit (the
    correction set is probed from a standalone compile; this guards against
    context-dependent fusion changing the f32 results)."""
    import jax
    import jax.numpy as jnp

    from underwater_image_enhancement_tpu.ops import colorspace as cs
    from underwater_image_enhancement_tpu.ops import lab_tables as lt

    cases = [
        (lt.GAMMA_TAB, cs._g_gamma_tab, "gamma"),
        (lt.CBRT_TAB, cs._g_cbrt_tab, "cbrt"),
        (lt.INV_GAMMA_TAB, cs._g_inv_gamma_tab, "inv_gamma"),
        (lt.L2YF_TAB[:, 0], cs._g_l2y_tab, "l2y"),
        (lt.L2YF_TAB[:, 1], cs._g_l2ify_tab, "l2ify"),
        (cs._SDIV_TAB, cs._g_sdiv_tab, "sdiv"),
        (cs._HDIV_TAB, cs._g_hdiv_tab, "hdiv"),
    ]
    for tab, g, name in cases:
        tab = np.asarray(tab)
        idx = jnp.arange(tab.shape[0], dtype=jnp.int32)

        @jax.jit
        def composed(i):
            # surround with arithmetic so the lookup sits inside a fusion
            i = (i * 3 + 1) // 3  # == i for i >= 0
            return cs._corrected_lookup(i, tab, g, name) * 2 - 1

        got = np.asarray(composed(idx))
        np.testing.assert_array_equal(got, tab.astype(np.int64) * 2 - 1,
                                      err_msg=name)
