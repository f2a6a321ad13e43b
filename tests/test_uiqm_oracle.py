"""Independent UIQM/UCIQE verification (VERDICT r2 item 6).

Two layers of defense against a self-referential oracle:
1. Closed-form fixtures — images simple enough that every term of the
   published formulas (Panetta et al. 2016; Yang & Sowmya 2015) collapses
   to a literal hand-derivable number, asserted against BOTH the TPU
   implementation and the float64 oracle.
2. The float64 oracle itself (testing/golden_metrics.py) is re-derived
   from the papers with explicit per-block loops and a from-scratch Sobel,
   sharing no code structure with metrics/uiqm.py.
"""

import numpy as np
import pytest

from underwater_image_enhancement_tpu.metrics import uiqm as m
from underwater_image_enhancement_tpu.testing import golden_metrics as gm


def _const_image(rgb, h=32, w=32):
    img = np.zeros((h, w, 3), np.float32)
    img[:] = rgb
    return img


def test_uiqm_constant_image_closed_form():
    """Constant (0.5, 0.3, 0.2): Sobel and Michelson terms vanish, so
    UIQM = 0.0282 * UICM with UICM = -0.0268 * sqrt(rg^2 + yb^2),
    rg = 0.5-0.3 = 0.2, yb = (0.5+0.3)/2 - 0.2 = 0.2 (trim is a no-op on a
    constant sample; variance 0)."""
    img = _const_image((0.5, 0.3, 0.2))
    want = 0.0282 * (-0.0268 * 0.2 * np.sqrt(2.0))
    assert np.isclose(float(m.uiqm(img)), want, rtol=1e-4, atol=1e-7)
    assert np.isclose(gm.uiqm(img.astype(np.float64)), want,
                      rtol=1e-6, atol=1e-12)


def test_uiqm_stripe_image_closed_form():
    """Vertical stripes 0.25/0.75 of period 2, equal channels: chroma terms
    are 0 (gray); Sobel is 0 everywhere (each pixel's left/right neighbors
    are equal, REFLECT_101 keeps that true at the borders; rows constant),
    so UISM = 0; every 8x8 block has Michelson contrast
    m = (0.75-0.25)/(0.75+0.25) = 0.5, so
    UIConM = |0.5 * ln 0.5| = 0.5 ln 2 and UIQM = 3.5753 * 0.5 * ln 2."""
    img = np.zeros((32, 32, 3), np.float32)
    img[:, 0::2, :] = 0.25
    img[:, 1::2, :] = 0.75
    want = 3.5753 * 0.5 * np.log(2.0)
    assert np.isclose(float(m.uiqm(img)), want, rtol=1e-4)
    assert np.isclose(gm.uiqm(img.astype(np.float64)), want, rtol=1e-6)


def test_uciqe_constant_image_closed_form():
    """Constant (0.5, 0.3, 0.2): sigma_c = con_l = 0, so UCIQE =
    0.2576 * mu_s.  OpenCV u8 HSV saturation of (127, 76, 51):
    S = (diff * round((255<<12)/V) + 2^11) >> 12 = (76*8224 + 2048) >> 12
    = 153, i.e. mu_s = 153/255 = 0.6 exactly."""
    img = _const_image((0.5, 0.3, 0.2))
    v, mn = 127, 51
    sdiv = round((255 << 12) / v)
    s_u8 = ((v - mn) * sdiv + (1 << 11)) >> 12
    assert s_u8 == 153
    want = 0.2576 * (s_u8 / 255.0)
    assert np.isclose(float(m.uciqe(img)), want, rtol=5e-5)
    assert np.isclose(gm.uciqe(img.astype(np.float64)), want, rtol=1e-6)


def _srgb_L_star(v_u8: int) -> float:
    """CIE L* of a neutral u8 gray from first principles (IEC sRGB degamma
    + CIE cube root), independent of the fixed-point LAB tables."""
    x = v_u8 / 255.0
    y = x / 12.92 if x <= 0.04045 else ((x + 0.055) / 1.055) ** 2.4
    f = y ** (1.0 / 3.0) if y > 0.008856 else 7.787 * y + 16.0 / 116.0
    return 116.0 * f - 16.0


def test_uciqe_two_tone_gray_closed_form():
    """Half 0.25 gray / half 0.75 gray: neutral grays have a = b = 128 in
    u8 LAB (chroma 0 -> sigma_c = 0) and S = 0 (mu_s = 0), so UCIQE =
    0.2745 * (p99(L) - p1(L)) / 100 with L the u8-encoded L* of gray 63
    and 191 rescaled by 100/255.  The u8 encoding is a fixed-point
    round of L* * 255/100, so the first-principles L* bounds the result
    within one LSB per tone."""
    img = np.zeros((32, 32, 3), np.float32)
    img[:16] = 0.25   # -> u8 63
    img[16:] = 0.75   # -> u8 191
    l_lo = round(_srgb_L_star(63) * 255.0 / 100.0)
    l_hi = round(_srgb_L_star(191) * 255.0 / 100.0)
    want = 0.2745 * (l_hi - l_lo) * (100.0 / 255.0) / 100.0
    tol = 0.2745 * 2.0 * (100.0 / 255.0) / 100.0  # 1 LSB per tone
    assert abs(float(m.uciqe(img)) - want) <= tol
    assert abs(gm.uciqe(img.astype(np.float64)) - want) <= tol
    # and implementation vs oracle agree far tighter than the LSB bound
    assert np.isclose(float(m.uciqe(img)),
                      gm.uciqe(img.astype(np.float64)), rtol=1e-4)


@pytest.mark.parametrize("seed", [0, 1])
def test_uiqm_uciqe_vs_independent_oracle_random(seed):
    """f32 TPU implementation within 1% of the loop-structured float64
    paper re-derivation on textured random images (the BASELINE.json
    parity protocol, now against a non-mirrored oracle)."""
    rng = np.random.default_rng(seed)
    base = rng.uniform(0.05, 0.95, (64, 80, 3)).astype(np.float32)
    # add structure so every term is non-trivially exercised
    yy, xx = np.mgrid[0:64, 0:80]
    base[..., 0] *= (0.6 + 0.4 * np.sin(xx / 7.0)).astype(np.float32)
    base[..., 2] *= (0.6 + 0.4 * np.cos(yy / 9.0)).astype(np.float32)
    base = np.clip(base, 0.0, 1.0)

    got_uiqm = float(m.uiqm(base))
    want_uiqm = gm.uiqm(base.astype(np.float64))
    assert abs(got_uiqm - want_uiqm) <= 0.01 * abs(want_uiqm)

    got_uciqe = float(m.uciqe(base))
    want_uciqe = gm.uciqe(base.astype(np.float64))
    assert abs(got_uciqe - want_uciqe) <= 0.01 * abs(want_uciqe)
