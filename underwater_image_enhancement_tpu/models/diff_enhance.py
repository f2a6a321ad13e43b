"""Differentiable enhancement modules — the trainable image operators.

Reproduces BOTH divergent reference variants (SURVEY.md O14) on NHWC batches:

- ``enhance_vgg`` (vgg_16_UIE.py:24-128): percentile stretch (sorted-index
  percentiles, truncated int index, clamped) -> simplified DCP dehaze with
  constant A=0.6 -> gamma ``img**gamma`` -> clamp.
- ``enhance_mlp`` (deep_learning_parameters.py:24-90): stretch -> soft-gated
  gamma ``img**(1/gamma)`` blended by use_gamma -> clamp.  No dehaze.

The reference's Python B x C loops with ``.item()`` indices (a genuine perf
bug, SURVEY.md 3.3) become one vmapped sort per channel.  Like the
reference, the "index" percentile gives NO gradient to L_low/L_high; pass
``stretch_mode='quantile'`` for a fully differentiable stretch via
jnp.quantile (linear interpolation — a framework improvement the trainers
use by default).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp


def _stretch_channel_index(channel: jnp.ndarray, l_low, l_high) -> jnp.ndarray:
    """vgg_16_UIE.py:57-92: p = sorted[int(L/100*n)] (clamped), stretch."""
    flat = jnp.sort(channel.reshape(-1))
    n = flat.shape[0]
    low_idx = jnp.clip((l_low / 100.0 * n).astype(jnp.int32), 0, n - 1)
    high_idx = jnp.clip((l_high / 100.0 * n).astype(jnp.int32), 0, n - 1)
    p_low = flat[low_idx]
    p_high = flat[high_idx]
    return jnp.clip((channel - p_low) / (p_high - p_low + 1e-8), 0.0, 1.0)


def _stretch_channel_index_u8(channel: jnp.ndarray, l_low, l_high) -> jnp.ndarray:
    """Same sorted-index spec, O(n): exact 256-bin histogram order statistic
    (bit-equal to _stretch_channel_index for u8-grid inputs — any decoded
    image).  The production enhance() throughput path."""
    from underwater_image_enhancement_tpu.ops.stretch import _perc_pair_index_u8

    p_low, p_high = _perc_pair_index_u8(channel, l_low, l_high)
    return jnp.clip((channel - p_low) / (p_high - p_low + 1e-8), 0.0, 1.0)


def _stretch_channel_quantile(channel: jnp.ndarray, l_low, l_high) -> jnp.ndarray:
    """Differentiable variant: numpy-interpolated quantiles (grads flow to
    the image AND to l_low/l_high)."""
    flat = channel.reshape(-1)
    p_low = jnp.quantile(flat, l_low / 100.0)
    p_high = jnp.quantile(flat, l_high / 100.0)
    return jnp.clip((channel - p_low) / (p_high - p_low + 1e-8), 0.0, 1.0)


_STRETCH_FNS = {
    "index": _stretch_channel_index,
    "index-u8": _stretch_channel_index_u8,
    "quantile": _stretch_channel_quantile,
}


def color_stretch_batch(img: jnp.ndarray, l_low: jnp.ndarray, l_high: jnp.ndarray,
                        mode: str = "index") -> jnp.ndarray:
    """(B, H, W, C), per-sample scalar L_low/L_high of shape (B,) or (B, 1)."""
    fn = _STRETCH_FNS[mode]

    def per_image(im, lo, hi):
        chans = [fn(im[..., c], lo, hi) for c in range(im.shape[-1])]
        return jnp.stack(chans, axis=-1)

    return jax.vmap(per_image)(img, l_low.reshape(-1), l_high.reshape(-1))


def dehaze_batch(img: jnp.ndarray, omega: jnp.ndarray) -> jnp.ndarray:
    """vgg_16_UIE.py:94-117: dark-channel dehaze with constant A=0.6."""
    om = omega.reshape(-1, 1, 1, 1)
    dark = jnp.min(img, axis=-1, keepdims=True)
    A = 0.6
    t = jnp.clip(1.0 - om * dark, 0.1, 1.0)
    return jnp.clip((img - A) / t + A, 0.0, 1.0)


@partial(jax.jit, static_argnames=("stretch_mode",))
def enhance_vgg(img: jnp.ndarray, params: Dict[str, jnp.ndarray],
                stretch_mode: str = "index") -> jnp.ndarray:
    """vgg_16_UIE.py:32-55 forward.  img: (B, H, W, C) in [0,1].

    params: dict with (B,)- or (B,1)-shaped 'L_low', 'L_high', and optional
    'omega' (enables dehaze) and 'gamma' (img**gamma)."""
    out = color_stretch_batch(img, params["L_low"], params["L_high"], stretch_mode)
    if "omega" in params:
        out = dehaze_batch(out, params["omega"])
    if "gamma" in params:
        g = params["gamma"].reshape(-1, 1, 1, 1)
        out = jnp.power(out + 1e-8, g)
    return jnp.clip(out, 0.0, 1.0)


@partial(jax.jit, static_argnames=("stretch_mode",))
def enhance_zoo(img: jnp.ndarray, params: Dict[str, jnp.ndarray],
                stretch_mode: str = "index") -> jnp.ndarray:
    """The six-param composite for the model_architectures.py backbones:
    percentile stretch -> omega dehaze (the vgg-flavor op order,
    vgg_16_UIE.py:32-55) -> use_gamma-gated ``img**gamma`` (the mlp-flavor
    soft gate, deep_learning_parameters.py:43-56).  guided_radius has no
    differentiable consumer (the reference never trains it either).

    params: 'omega', 'gamma', 'L_low', 'L_high', 'use_gamma' shaped (B,) or
    (B, 1); extra keys (guided_radius) are ignored."""
    flat = {k: jnp.asarray(v).reshape(-1)
            for k, v in params.items()
            if k in ("omega", "gamma", "L_low", "L_high", "use_gamma")}
    out = color_stretch_batch(img, flat["L_low"], flat["L_high"], stretch_mode)
    out = dehaze_batch(out, flat["omega"])
    g = flat["gamma"].reshape(-1, 1, 1, 1)
    use_g = flat["use_gamma"].reshape(-1, 1, 1, 1)
    out = use_g * jnp.power(out + 1e-8, g) + (1.0 - use_g) * out
    return jnp.clip(out, 0.0, 1.0)


@partial(jax.jit, static_argnames=("stretch_mode",))
def enhance_mlp(img: jnp.ndarray, params: Dict[str, jnp.ndarray],
                stretch_mode: str = "index") -> jnp.ndarray:
    """deep_learning_parameters.py:32-56 forward (stretch + gated 1/gamma)."""
    out = color_stretch_batch(img, params["L_low"], params["L_high"], stretch_mode)
    use_g = params["use_gamma"].reshape(-1, 1, 1, 1)
    g = params["gamma"].reshape(-1, 1, 1, 1)
    gamma_enhanced = jnp.power(out + 1e-8, 1.0 / g)
    out = use_g * gamma_enhanced + (1.0 - use_g) * out
    return jnp.clip(out, 0.0, 1.0)
