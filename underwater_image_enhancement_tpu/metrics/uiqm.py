"""UIQM and UCIQE underwater quality metrics — batched, jitted.

Not present in the reference code; BASELINE.json names them as parity
metrics, so the framework ships them (SURVEY.md §2.3 note).  Definitions:

UIQM (Panetta, Gao, Agaian 2016): c1*UICM + c2*UISM + c3*UIConM with
c = (0.0282, 0.2953, 3.5753).
  - UICM: asymmetric alpha-trimmed (alpha=0.1) chroma statistics on
    RG = R-G, YB = (R+G)/2 - B:
    -0.0268*sqrt(muRG^2+muYB^2) + 0.1586*sqrt(s2RG+s2YB)
  - UISM: per-channel Sobel edge map multiplied into the channel, EME over
    8x8 blocks, weighted 0.299/0.587/0.114.
  - UIConM: logAMEE (PLIP-free simplification: the common open
    implementation's entropy-weighted Michelson term) over 8x8 blocks of
    the gray intensity.

UCIQE (Yang, Sowmya 2015): 0.4680*sigma_c + 0.2745*con_l + 0.2576*mu_s
with sigma_c the std of LAB chroma, con_l the (p99 - p1) range of L, and
mu_s the mean HSV saturation; L,a,b in CIELAB float scale (L in [0,100]).

The CPU oracle (testing/golden_metrics.py) implements the identical math in
numpy float64; the parity gate is <1% relative difference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from underwater_image_enhancement_tpu.ops import colorspace as cs
from underwater_image_enhancement_tpu.ops.edges import sobel

UIQM_C = (0.0282, 0.2953, 3.5753)
UCIQE_C = (0.4680, 0.2745, 0.2576)
_ALPHA = 0.1
_BLOCK = 8
_EPS = 1e-8
# EME ratio epsilon: near-zero block minima make log(max/min) unstable
# across fp32/fp64; 1e-3 bounds the ratio (part of this metric's spec).
_EME_EPS = 1e-3


def _alpha_trimmed_stats(x: jnp.ndarray, alpha: float = _ALPHA):
    """Mean/variance of x after trimming the alpha fraction from each tail."""
    flat = jnp.sort(x.reshape(-1))
    n = flat.shape[0]
    lo = int(alpha * n)
    hi = n - lo
    window = flat[lo:hi]
    mu = jnp.mean(window)
    s2 = jnp.mean((window - mu) ** 2)
    return mu, s2


def uicm(img: jnp.ndarray) -> jnp.ndarray:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    rg = r - g
    yb = 0.5 * (r + g) - b
    mu_rg, s2_rg = _alpha_trimmed_stats(rg)
    mu_yb, s2_yb = _alpha_trimmed_stats(yb)
    return (-0.0268 * jnp.sqrt(mu_rg**2 + mu_yb**2)
            + 0.1586 * jnp.sqrt(s2_rg + s2_yb))


def _blocks(x: jnp.ndarray, k: int = _BLOCK) -> jnp.ndarray:
    """Crop to a multiple of k and reshape to (nb, k*k) blocks."""
    H, W = x.shape
    Hc, Wc = (H // k) * k, (W // k) * k
    x = x[:Hc, :Wc]
    return (x.reshape(Hc // k, k, Wc // k, k)
             .transpose(0, 2, 1, 3)
             .reshape(-1, k * k))


def _eme(x: jnp.ndarray) -> jnp.ndarray:
    """Enhancement measure estimation: mean of 2*log(max/min) over blocks."""
    b = _blocks(x)
    mx = jnp.max(b, axis=1)
    mn = jnp.min(b, axis=1)
    ratio = (mx + _EME_EPS) / (mn + _EME_EPS)
    return jnp.mean(2.0 * jnp.log(ratio))


def uism(img: jnp.ndarray) -> jnp.ndarray:
    w = (0.299, 0.587, 0.114)
    total = 0.0
    for c, wc in enumerate(w):
        ch = img[..., c]
        gx = sobel(ch, "x")
        gy = sobel(ch, "y")
        mag = jnp.sqrt(gx * gx + gy * gy)
        total = total + wc * _eme(mag * ch)
    return total


def uiconm(img: jnp.ndarray) -> jnp.ndarray:
    """logAMEE of the mean intensity (entropy-weighted Michelson contrast)."""
    gray = jnp.mean(img, axis=-1)
    b = _blocks(gray)
    mx = jnp.max(b, axis=1)
    mn = jnp.min(b, axis=1)
    top = mx - mn
    bot = mx + mn
    m = top / (bot + _EPS)
    term = jnp.where(m > 0, m * jnp.log(jnp.maximum(m, _EPS)), 0.0)
    return jnp.abs(jnp.mean(term))


@jax.jit
def uiqm(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) float [0,1] -> scalar UIQM."""
    c1, c2, c3 = UIQM_C
    return c1 * uicm(img) + c2 * uism(img) + c3 * uiconm(img)


@jax.jit
def uciqe(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) float [0,1] -> scalar UCIQE (float CIELAB scale)."""
    u8 = cs.quantize_u8(img)
    lab = cs.rgb_to_lab_u8_exact(u8).astype(jnp.float32)
    L = lab[..., 0] * (100.0 / 255.0)
    a = lab[..., 1] - 128.0
    b = lab[..., 2] - 128.0
    chroma = jnp.sqrt(a * a + b * b)
    sigma_c = jnp.std(chroma) / 100.0  # normalize to ~[0,1] like L/saturation
    con_l = (jnp.percentile(L, 99.0) - jnp.percentile(L, 1.0)) / 100.0
    sat = cs.rgb_to_hsv_u8(u8)[..., 1].astype(jnp.float32) / 255.0
    mu_s = jnp.mean(sat)
    k1, k2, k3 = UCIQE_C
    return k1 * sigma_c + k2 * con_l + k3 * mu_s


@jax.jit
def uiqm_batch(imgs: jnp.ndarray) -> jnp.ndarray:
    return jax.vmap(uiqm)(imgs)


@jax.jit
def uciqe_batch(imgs: jnp.ndarray) -> jnp.ndarray:
    return jax.vmap(uciqe)(imgs)
