"""Percentile contrast stretch, white balance, gamma — pure JAX, batched.

Reference semantics reproduced:
- ``color_enhancement(img, L_low, L_high)``: per-channel percentile stretch
  (enhancement_strategies.py:251-273, eps 1e-10) and the six_stadigy twin
  ``enhance_contrast`` (six_stadigy.py:190-199, eps 1e-6).
- ``white_balance(img, percentile)``: symmetric percentile stretch
  (six_stadigy.py:210-219).
- ``gamma_correction``: TWO divergent conventions exist in the reference —
  ``img**(1/gamma)`` with clip (enhancement_strategies.py:276-285) and
  ``img**gamma`` without clip (six_stadigy.py:221-224).  Both are exposed.

Percentiles use numpy's linear-interpolation definition (np.percentile), which
``jnp.percentile`` matches exactly.  A histogram-based fast path trades exact
interpolation for O(n) cost; the sort-based path is the parity oracle.

All functions take NHWC (or HWC) float32 and are jittable; percentile
reduction is per-image, per-channel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _perc_pair_sort(channel: jnp.ndarray, l_low, l_high):
    """Exact (p_low, p_high) percentiles of a flattened channel, numpy rules."""
    flat = channel.reshape(-1)
    qs = jnp.stack([jnp.asarray(l_low, jnp.float32), jnp.asarray(l_high, jnp.float32)])
    p = jnp.percentile(flat, qs)
    return p[0], p[1]


def _perc_pair_hist(channel: jnp.ndarray, l_low, l_high, k: int = 32,
                    subsample: int = 1):
    """Approximate percentiles via a two-level hierarchical histogram.

    Level 1 bins values into k coarse buckets (k compares/pixel), locates
    the bucket holding each target rank, then level 2 refines within that
    bucket with a SHARED k-wide compare pass for both quantiles — ~2.5k ops
    per pixel total for k*k = 1024 effective bins.  ~25x faster than a flat
    4096-bin compare-reduce on TPU (the VPU-bound production fast path).
    Error <= (vmax - vmin) / k^2; returns the left edge of the final bin.
    ``subsample`` > 1 histograms every subsample-th ROW (striding the lane
    dim would break TPU vector layout); the quantile rank jitter is
    ~sqrt(p(1-p)/(n/s)) — about 0.06% of a percentile for 1080p at s=8 —
    while min/max stay exact over all pixels.  s-fold compute cut.
    """
    vmin = jnp.min(channel)
    vmax = jnp.max(channel)
    if subsample > 1 and channel.ndim == 2:
        channel = channel[::subsample, :]
    flat = channel.reshape(-1)
    n = flat.shape[0]
    scale = (k * k - 1) / jnp.maximum(vmax - vmin, 1e-12)
    idx = jnp.clip((flat - vmin) * scale, 0, k * k - 1)
    hi = (idx // k).astype(jnp.int32)
    lo = jnp.clip(idx - hi.astype(jnp.float32) * k, 0, k - 1).astype(jnp.int32)
    bins = jnp.arange(k, dtype=jnp.int32)

    h1 = jnp.sum((hi[:, None] == bins[None, :]).astype(jnp.int32), axis=0)
    c1 = jnp.cumsum(h1)

    def rank_of(pct):
        return jnp.asarray(pct, jnp.float32) / 100.0 * (n - 1) + 1.0

    t_lo = rank_of(l_low)
    t_hi = rank_of(l_high)
    b_lo = jnp.clip(jnp.sum((c1 < t_lo).astype(jnp.int32)), 0, k - 1)
    b_hi = jnp.clip(jnp.sum((c1 < t_hi).astype(jnp.int32)), 0, k - 1)
    below_lo = jnp.where(b_lo > 0, c1[jnp.maximum(b_lo - 1, 0)], 0)
    below_hi = jnp.where(b_hi > 0, c1[jnp.maximum(b_hi - 1, 0)], 0)

    lo_onehot = (lo[:, None] == bins[None, :]).astype(jnp.int32)  # shared
    h2_lo = jnp.sum(jnp.where((hi == b_lo)[:, None], lo_onehot, 0), axis=0)
    h2_hi = jnp.sum(jnp.where((hi == b_hi)[:, None], lo_onehot, 0), axis=0)

    def fine(h2, below, b1, target):
        c2 = jnp.cumsum(h2) + below
        b2 = jnp.clip(jnp.sum((c2 < target).astype(jnp.int32)), 0, k - 1)
        return vmin + (b1 * k + b2).astype(jnp.float32) / scale

    return (fine(h2_lo, below_lo, b_lo, t_lo),
            fine(h2_hi, below_hi, b_hi, t_hi))


def stretch_channel(channel: jnp.ndarray, l_low, l_high, eps: float = 1e-10,
                    method: str = "sort") -> jnp.ndarray:
    """(channel - p_low) / (p_high - p_low + eps), clipped to [0,1].

    method: 'sort' (exact, the parity oracle), 'hist' (two-level histogram),
    'hist-fast' (histogram on a stride-2 subsample — the throughput path)."""
    if method == "sort":
        p_low, p_high = _perc_pair_sort(channel, l_low, l_high)
    elif method == "hist-fast":
        p_low, p_high = _perc_pair_hist(channel, l_low, l_high, subsample=8)
    else:
        p_low, p_high = _perc_pair_hist(channel, l_low, l_high)
    out = (channel - p_low) / (p_high - p_low + eps)
    return jnp.clip(out, 0.0, 1.0)


@partial(jax.jit, static_argnames=("eps", "method"))
def color_enhancement(img: jnp.ndarray, l_low=15.0, l_high=95.0,
                      eps: float = 1e-10, method: str = "sort") -> jnp.ndarray:
    """Per-channel percentile stretch (enhancement_strategies.py:251-273).

    img: (..., H, W, C).  Percentiles are computed per leading-batch element
    and per channel.  ``eps=1e-6`` reproduces six_stadigy.enhance_contrast.
    """
    def one_image(im):
        chans = [stretch_channel(im[..., c], l_low, l_high, eps, method)
                 for c in range(im.shape[-1])]
        return jnp.stack(chans, axis=-1)

    if img.ndim == 3:
        return one_image(img)
    batch_shape = img.shape[:-3]
    flat = img.reshape((-1,) + img.shape[-3:])
    out = jax.vmap(one_image)(flat)
    return out.reshape(batch_shape + img.shape[-3:])


def enhance_contrast(img: jnp.ndarray, l_low=15.0, l_high=95.0,
                     method: str = "sort") -> jnp.ndarray:
    """six_stadigy.py:190-199 flavor (eps 1e-6)."""
    return color_enhancement(img, l_low, l_high, eps=1e-6, method=method)


def white_balance(img: jnp.ndarray, percentile=5.0, method: str = "sort") -> jnp.ndarray:
    """Symmetric percentile stretch (six_stadigy.py:210-219, eps 1e-6)."""
    return color_enhancement(img, percentile, 100.0 - percentile, eps=1e-6,
                             method=method)


@jax.jit
def gamma_correction_inv(img: jnp.ndarray, gamma=1.2) -> jnp.ndarray:
    """img ** (1/gamma), clipped — enhancement_strategies.py:276-285."""
    return jnp.clip(jnp.power(jnp.maximum(img, 0.0), 1.0 / gamma), 0.0, 1.0)


@jax.jit
def gamma_correction_pow(img: jnp.ndarray, gamma=1.2) -> jnp.ndarray:
    """img ** gamma, NO clip — six_stadigy.py:221-224."""
    return jnp.power(jnp.maximum(img, 0.0), gamma)
