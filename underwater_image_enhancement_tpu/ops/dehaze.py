"""Underwater dark-channel-prior dehazing chain: transmission + recovery.

Reproduces BOTH divergent reference flavors (SURVEY.md O5/O6/O8):

- ``estimate_transmission``  (enhancement_strategies.py:208-234): normalize by
  A (+1e-10), dark channel, t = 1 - omega*dark, guided-filter refine on the
  u8-quantized gray guide, then a SINGLE clip to [0.1, 1].
- ``estimate_transmission_six`` (six_stadigy.py:167-180): eps 1e-6 on A, clip
  BEFORE refinement and again after.
- ``recover_image`` (enhancement_strategies.py:236-249): J=(I-A)/t+A, clip;
  A may be a (3,) vector, scalar, or full (H,W,3) map (the
  enhancement_strategies quadtree tiles A to H x W x 3 — numerically the same).
  six_stadigy.restore_image (182-188) is per-channel identical math.

The whole chain is fused by XLA into a handful of passes; the dark channel
and affine transforms never round-trip through HBM separately.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from underwater_image_enhancement_tpu.ops.colorspace import unit_to_gray_unit
from underwater_image_enhancement_tpu.ops.guided import guided_filter


def dark_channel(img: jnp.ndarray, A: jnp.ndarray, a_eps: float) -> jnp.ndarray:
    """Per-pixel channel-min of img / (A + a_eps).  A broadcasts over (...,3)."""
    return jnp.min(img / (A + a_eps), axis=-1)


@partial(jax.jit, static_argnames=("r",))
def estimate_transmission(img: jnp.ndarray, A: jnp.ndarray, omega=0.95,
                          r: int = 15, eps: float = 0.001) -> jnp.ndarray:
    """enhancement_strategies.py:208-234 flavor (single final clip).

    img: (..., H, W, 3) in [0,1]; A broadcastable to img. Returns (..., H, W).
    """
    dark = dark_channel(img, A, 1e-10)
    t_initial = 1.0 - omega * dark
    gray = unit_to_gray_unit(img)
    t_refined = guided_filter(gray, t_initial, r, eps)
    return jnp.clip(t_refined, 0.1, 1.0)


@partial(jax.jit, static_argnames=("r",))
def estimate_transmission_six(img: jnp.ndarray, A: jnp.ndarray, omega,
                              r: int, eps: float) -> jnp.ndarray:
    """six_stadigy.py:167-180 flavor (clip before AND after refinement)."""
    dark = dark_channel(img, A, 1e-6)
    t = jnp.clip(1.0 - omega * dark, 0.1, 1.0)
    gray = unit_to_gray_unit(img)
    t_refined = guided_filter(gray, t, r, eps)
    return jnp.clip(t_refined, 0.1, 1.0)


@jax.jit
def recover_image(img: jnp.ndarray, t: jnp.ndarray, A: jnp.ndarray) -> jnp.ndarray:
    """Scene radiance J = (I - A)/t + A, clipped to [0,1].

    img: (..., H, W, 3); t: (..., H, W); A broadcastable to img.
    """
    t_e = t[..., None]
    return jnp.clip((img - A) / t_e + A, 0.0, 1.0)


def estimate_transmission_six_planes(planes, A, omega, r: int, eps: float,
                                     guided_subsample: int = 1):
    """Channel-first six_stadigy.py:167-180: (r, g, b) planes, A (3,).

    guided_subsample > 1 refines with the Fast Guided Filter (He et al.,
    row-subsampled linear model) — the throughput mode's approximation."""
    from underwater_image_enhancement_tpu.ops.colorspace import (
        gray_u8_planes,
        quantize_u8,
        u8_to_unit,
    )

    dark = jnp.minimum(
        jnp.minimum(planes[0] / (A[0] + 1e-6), planes[1] / (A[1] + 1e-6)),
        planes[2] / (A[2] + 1e-6),
    )
    t = jnp.clip(1.0 - omega * dark, 0.1, 1.0)
    gray = u8_to_unit(gray_u8_planes(*(quantize_u8(p) for p in planes)))
    if guided_subsample > 1:
        from underwater_image_enhancement_tpu.ops.guided import guided_filter_fast

        t_refined = guided_filter_fast(gray, t, r, eps, guided_subsample)
    else:
        t_refined = guided_filter(gray, t, r, eps)
    return jnp.clip(t_refined, 0.1, 1.0)


def estimate_transmission_planes(planes, A, omega, r: int, eps: float,
                                 guided_subsample: int = 1):
    """Channel-first enhancement_strategies.py:208-234 (single final clip).

    guided_subsample > 1 refines with the Fast Guided Filter — the
    throughput tier's approximation (parity callers keep 1)."""
    from underwater_image_enhancement_tpu.ops.colorspace import (
        gray_u8_planes,
        quantize_u8,
        u8_to_unit,
    )

    dark = jnp.minimum(
        jnp.minimum(planes[0] / (A[0] + 1e-10), planes[1] / (A[1] + 1e-10)),
        planes[2] / (A[2] + 1e-10),
    )
    t_initial = 1.0 - omega * dark
    gray = u8_to_unit(gray_u8_planes(*(quantize_u8(p) for p in planes)))
    if guided_subsample > 1:
        from underwater_image_enhancement_tpu.ops.guided import guided_filter_fast

        t_refined = guided_filter_fast(gray, t_initial, r, eps,
                                       guided_subsample)
    else:
        t_refined = guided_filter(gray, t_initial, r, eps)
    return jnp.clip(t_refined, 0.1, 1.0)


def estimate_transmission_planes_shared(planes, A, omega, r: int, eps: float,
                                        guided_subsample: int = 4):
    """Throughput-tier transmission sharing ONE guided filter across every
    omega (and, by giving callers one fixed ``r``, across strategies).

    The guided filter is LINEAR in its filtered input p for a fixed guide
    (a = cov(I,p)/(var+eps) and b = mean_p - a·mean_I are linear in p, and
    gf(I, const) = const), so for the enhancement_strategies.py flavor —
    which does NOT clip before refinement (:208-234) —

        gf(I, 1 - omega·dark) = 1 - omega·gf(I, dark)      (exactly).

    Refining ``dark`` once therefore serves every omega; when the three
    dehaze strategies inside one program also share the refine radius (the
    fast tier's approximation — radii 15/20/10 collapse to one), the whole
    expression is identical across strategies and XLA CSE runs the guided
    filter ONCE for all three.  Fast-tier only: the exact tier keeps the
    reference's per-strategy radii."""
    from underwater_image_enhancement_tpu.ops.colorspace import (
        gray_u8_planes,
        quantize_u8,
        u8_to_unit,
    )
    from underwater_image_enhancement_tpu.ops.guided import guided_filter_fast

    dark = jnp.minimum(
        jnp.minimum(planes[0] / (A[0] + 1e-10), planes[1] / (A[1] + 1e-10)),
        planes[2] / (A[2] + 1e-10),
    )
    gray = u8_to_unit(gray_u8_planes(*(quantize_u8(p) for p in planes)))
    dark_refined = guided_filter_fast(gray, dark, r, eps, guided_subsample)
    return jnp.clip(1.0 - omega * dark_refined, 0.1, 1.0)


def recover_planes(planes, t, A):
    """Channel-first J = (I - A)/t + A per plane, clipped."""
    return tuple(
        jnp.clip((p - A[c]) / t + A[c], 0.0, 1.0)
        for c, p in enumerate(planes)
    )
