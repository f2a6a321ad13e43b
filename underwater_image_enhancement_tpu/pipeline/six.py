"""The "six_stadigy flavor" strategy compositions (six_stadigy.py:226-285).

Six fixed recipes with their own constants and op variants (eps on A is 1e-6,
transmission clipped before AND after refinement, gamma is img**g with no
clip, stretch eps 1e-6).  Kept separate from pipeline.strategies by design:
the two families diverge in the reference and both are reproduced as-is
(SURVEY.md §7 "Reference divergences").

TPU layout note: each recipe runs CHANNEL-FIRST internally — the input is
split into materialized (H, W) planes at entry and restacked at exit.
Composing channel-minor NHWC tensors with windowed/sliced ops in one XLA
program measured ~7x slower (layout assignment pessimizes the whole
pipeline); the plane form keeps W on the vector lanes throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from underwater_image_enhancement_tpu.ops.layout import split_planes as _split
from underwater_image_enhancement_tpu.ops import dehaze, histeq, stretch
from underwater_image_enhancement_tpu.ops.airlight import (
    quadtree_airlight_exact_planes,
    quadtree_airlight_planes,
)


def _per_image(fn, img):
    if img.ndim == 3:
        return fn(img)
    return jax.vmap(fn)(img)



def _fast(method):
    # the throughput tier opts into the arithmetic-CBRT forward LAB
    # (ops/histeq.clahe_enhancement_planes lab_fast; +-1 LSB on ~1e-4 of
    # a/b pixels — the parity 'sort' tier keeps the exact gather kernel)
    return method == "hist-fast"


def _airlight(p, method):
    # parity ('sort') variants rerun Canny per quadtree block exactly like
    # the reference (six_stadigy.py:115-157); the throughput variants use
    # the canonical global-edge-map descent
    if method == "hist-fast":
        # 4 hysteresis rounds: the edge term only steers the descent;
        # 64/8/4 all pick the same block on the 16-image agreement suite
        # (2 flips first appear at iters=2), and 8 -> 4 saves ~0.12 ms/frame
        # on v5e (the >= 25 dB fast-tier gate in tests/test_strategies.py
        # allows an occasional shift)
        return quadtree_airlight_planes(p, edge_iters=4)
    return quadtree_airlight_exact_planes(p)


def _restore(p, omega, radius, eps, method, A=None):
    # A may be precomputed once per image and shared: strategies 1-3 all
    # estimate it from the SAME corrected input, so the results are
    # identical (six_strategy_single exploits this; the reference recomputes
    # it per strategy, six_stadigy.py:231,242,252)
    if A is None:
        A = _airlight(p, method)
    sub = 4 if method == "hist-fast" else 1  # fast guided filter in fast mode
    t = dehaze.estimate_transmission_six_planes(p, A, omega, radius, eps,
                                                guided_subsample=sub)
    return dehaze.recover_planes(p, t, A)


def _gamma_pow(p, g):
    return tuple(stretch.gamma_correction_pow(c, g) for c in p)


def _strategy1_strong_dehazing(img: jnp.ndarray, method: str, A=None) -> jnp.ndarray:
    """six_stadigy.py:230-239: omega .3 r20 eps .5 -> stretch 5-98 ->
    CLAHE 3.0 -> gamma**1.5."""
    def one(im):
        rec = _restore(_split(im), 0.3, 20, 5e-1, method, A)
        e = stretch.enhance_contrast_planes(rec, 5.0, 98.0, method=method)
        # gamma rides the inverse-LAB kernel epilogue (exact 256-LUT)
        e = histeq.clahe_enhancement_planes(e, 3.0, lab_fast=_fast(method),
                                            gamma=1.5)
        return jnp.stack(e, axis=-1)

    return _per_image(one, img)


def _strategy2_medium_dehazing(img: jnp.ndarray, method: str, A=None) -> jnp.ndarray:
    """six_stadigy.py:241-249: omega .5 r15 eps .5 -> stretch 15-95 -> CLAHE 2.0."""
    def one(im):
        rec = _restore(_split(im), 0.5, 15, 5e-1, method, A)
        e = stretch.enhance_contrast_planes(rec, 15.0, 95.0, method=method)
        return jnp.stack(
            histeq.clahe_enhancement_planes(e, 2.0, lab_fast=_fast(method)),
            axis=-1)

    return _per_image(one, img)


def _strategy3_light_dehazing(img: jnp.ndarray, method: str, A=None) -> jnp.ndarray:
    """six_stadigy.py:251-259: omega .7 r10 eps .1 -> stretch 20-85 -> WB p2."""
    def one(im):
        rec = _restore(_split(im), 0.7, 10, 1e-1, method, A)
        e = stretch.enhance_contrast_planes(rec, 20.0, 85.0, method=method)
        return jnp.stack(
            stretch.white_balance_planes(e, 2.0, method=method), axis=-1
        )

    return _per_image(one, img)


def _strategy4_clahe_enhancement(img: jnp.ndarray, method: str) -> jnp.ndarray:
    """six_stadigy.py:261-268: CLAHE 4.0 -> stretch 10-95 -> WB p3 -> gamma**1.3."""
    def one(im):
        e = histeq.clahe_enhancement_planes(_split(im), 4.0,
                                            lab_fast=_fast(method))
        e = stretch.enhance_contrast_planes(e, 10.0, 95.0, method=method)
        e = stretch.white_balance_planes(e, 3.0, method=method)
        return jnp.stack(_gamma_pow(e, 1.3), axis=-1)

    return _per_image(one, img)


def _strategy5_white_balance(img: jnp.ndarray, method: str) -> jnp.ndarray:
    """six_stadigy.py:270-277: WB p2 -> stretch 15-90 -> CLAHE 1.5 -> gamma**1.2."""
    def one(im):
        e = stretch.white_balance_planes(_split(im), 2.0, method=method)
        e = stretch.enhance_contrast_planes(e, 15.0, 90.0, method=method)
        e = histeq.clahe_enhancement_planes(e, 1.5, lab_fast=_fast(method),
                                            gamma=1.2)
        return jnp.stack(e, axis=-1)

    return _per_image(one, img)


def _strategy6_histogram_eq(img: jnp.ndarray, method: str) -> jnp.ndarray:
    """six_stadigy.py:279-285: stretch 5-98 -> CLAHE 3.5 -> gamma**1.4."""
    def one(im):
        e = stretch.enhance_contrast_planes(_split(im), 5.0, 98.0, method=method)
        e = histeq.clahe_enhancement_planes(e, 3.5, lab_fast=_fast(method),
                                            gamma=1.4)
        return jnp.stack(e, axis=-1)

    return _per_image(one, img)


_BUILDERS = {
    "strong_dehazing": _strategy1_strong_dehazing,
    "medium_dehazing": _strategy2_medium_dehazing,
    "light_dehazing": _strategy3_light_dehazing,
    "clahe_enhancement": _strategy4_clahe_enhancement,
    "white_balance": _strategy5_white_balance,
    "histogram_eq": _strategy6_histogram_eq,
}


def _jit_with_method(fn, method):
    import functools

    jitted = jax.jit(functools.partial(fn, method=method))
    jitted.__doc__ = fn.__doc__
    return jitted


# exact percentiles via the O(n) radix select (bit-equal to the sort
# oracle, ops/stretch.py) — the parity path
SIX_STRATEGIES = {k: _jit_with_method(f, "radix") for k, f in _BUILDERS.items()}
# hierarchical-histogram percentiles — the batch-throughput path
SIX_STRATEGIES_FAST = {k: _jit_with_method(f, "hist-fast")
                       for k, f in _BUILDERS.items()}

# flat aliases matching the reference method names
strategy1_strong_dehazing = SIX_STRATEGIES["strong_dehazing"]
strategy2_medium_dehazing = SIX_STRATEGIES["medium_dehazing"]
strategy3_light_dehazing = SIX_STRATEGIES["light_dehazing"]
strategy4_clahe_enhancement = SIX_STRATEGIES["clahe_enhancement"]
strategy5_white_balance = SIX_STRATEGIES["white_balance"]
strategy6_histogram_eq = SIX_STRATEGIES["histogram_eq"]
