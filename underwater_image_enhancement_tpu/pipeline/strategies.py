"""The "config flavor" strategy compositions + unified dispatch.

Reference: enhancement_strategies.py:349-508 and parameters config.py:28-75.
Each strategy is one jitted NHWC composite; ``apply_strategy`` dispatches by
name against compiled functions (a static dict — no data-dependent dispatch).

Single-image (H, W, 3) and batched (B, H, W, 3) inputs both work; batched
inputs vmap the per-image reductions (quadtree, percentiles, CLAHE).

TPU layout note: recipes run CHANNEL-FIRST internally (materialized (H, W)
planes, restacked at exit) — mixing channel-minor NHWC tensors with
windowed/sliced ops in one program measured ~7x slower (see pipeline/six.py).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp

from underwater_image_enhancement_tpu.ops.layout import split_planes as _split
from underwater_image_enhancement_tpu.ops import dehaze, histeq, stretch
from underwater_image_enhancement_tpu.ops.airlight import (
    quadtree_airlight_exact_planes,
    quadtree_airlight_planes,
)
from underwater_image_enhancement_tpu.utils.config import DEFAULT_STRATEGIES


def _per_image(fn, img):
    """Apply a (H,W,3)->(H,W,3) fn to single or batched input."""
    if img.ndim == 3:
        return fn(img)
    return jax.vmap(fn)(img)


def _per_image_planes(fn, img):
    """Apply a (H,W,3)->(r,g,b)-planes fn to single or batched input."""
    if img.ndim == 3:
        return fn(img)
    return jax.vmap(fn)(img)


def _stacked(fn_planes):
    """NHWC builder from a planes builder (one stack at exit — the
    channel-first layout note above)."""
    def f(img, method):
        return jnp.stack(fn_planes(img, method), axis=-1)
    f.__doc__ = fn_planes.__doc__
    return f


def _dehaze_then_stretch(img, omega, guided_radius, l_low, l_high,
                         apply_gamma, gamma, method="radix"):
    """The shared skeleton of strong/medium/light strategies
    (enhancement_strategies.py:349-444): quadtree A -> transmission ->
    recover -> percentile stretch -> optional gamma img**(1/g).

    method="radix" (parity): the airlight descent reruns Canny per block
    crop exactly like the reference's compute_Q
    (enhancement_strategies.py:180-183) — these strategies label the
    Phase-1 dataset, so their argmax must match — and percentiles are the
    exact O(n) radix select.  method="hist-fast" (throughput tier, mirrors
    pipeline/six.py): canonical global-edge-map descent (edge_iters=4),
    ONE shared Fast Guided Filter (row subsample 4, fixed radius 15: the
    refine is linear in omega, so the three dehaze strategies' transmissions
    all derive from one refined dark channel that XLA CSE dedupes across
    strategies — dehaze.estimate_transmission_planes_shared), histogram
    percentiles.

    Returns the (r, g, b) PLANES tuple; NHWC callers stack at exit."""
    p = _split(img)
    if method == "hist-fast":
        A = quadtree_airlight_planes(p, edge_iters=4)
        t = dehaze.estimate_transmission_planes_shared(p, A, omega, 15,
                                                       0.001,
                                                       guided_subsample=4)
    else:
        A = quadtree_airlight_exact_planes(p)
        t = dehaze.estimate_transmission_planes(p, A, omega, guided_radius,
                                                0.001)
    rec = dehaze.recover_planes(p, t, A)
    out = stretch.color_enhancement_planes(rec, l_low, l_high, method=method)
    if apply_gamma:
        out = tuple(stretch.gamma_correction_inv(c, gamma) for c in out)
    return out


def _fast(method):
    # the throughput tier opts into the arithmetic-CBRT forward LAB
    # (see pipeline/six.py:_fast)
    return method == "hist-fast"


def _strong_dehazing_planes(img: jnp.ndarray, method: str):
    """enhancement_strategies.py:349-374, params config.py:29-37."""
    return _per_image_planes(
        lambda im: _dehaze_then_stretch(im, 0.5, 15, 10.0, 95.0, True, 1.2,
                                        method), img
    )


def _medium_dehazing_planes(img: jnp.ndarray, method: str):
    """enhancement_strategies.py:376-397, params config.py:38-45.

    NOTE the reference quirk: apply_medium_dehazing reads omega/radius from
    params but estimate_atmospheric_light always runs with min_size=1."""
    return _per_image_planes(
        lambda im: _dehaze_then_stretch(im, 0.6, 20, 15.0, 92.0, True, 1.2,
                                        method), img
    )


def _light_enhancement_planes(img: jnp.ndarray, method: str):
    """enhancement_strategies.py:422-444, params config.py:46-53."""
    return _per_image_planes(
        lambda im: _dehaze_then_stretch(im, 0.4, 10, 15.0, 95.0, False, 1.2,
                                        method), img
    )


def _clahe_enhancement_planes(img: jnp.ndarray, method: str):
    """enhancement_strategies.py:399-420: CLAHE then stretch 20-85.

    The L_low/L_high defaults (20/85) come from apply_clahe_enhancement's
    params.get defaults — config.py's clahe entry carries no L keys."""
    def one(im):
        c = histeq.clahe_enhancement_planes(_split(im), 2.0, 8, 8,
                                            lab_fast=_fast(method))
        return stretch.color_enhancement_planes(c, 20.0, 85.0, method=method)

    return _per_image_planes(one, img)


def _histogram_equalization_planes(img: jnp.ndarray, method: str):
    """enhancement_strategies.py:460-474: hist-eq then stretch 10-95."""
    def one(im):
        e = histeq.histogram_equalization_planes(_split(im))
        return stretch.color_enhancement_planes(e, 10.0, 95.0, method=method)

    return _per_image_planes(one, img)


_BUILDERS_PLANES = {
    "strong_dehazing": _strong_dehazing_planes,
    "medium_dehazing": _medium_dehazing_planes,
    "clahe_enhancement": _clahe_enhancement_planes,
    "light_enhancement": _light_enhancement_planes,
    "histogram_equalization": _histogram_equalization_planes,
}
_BUILDERS = {k: _stacked(f) for k, f in _BUILDERS_PLANES.items()}


def _jit_with_method(fn, method):
    jitted = jax.jit(partial(fn, method=method))
    jitted.__doc__ = fn.__doc__
    return jitted


# exact parity tier (per-block-Canny quadtree, exact radix percentiles,
# exact-gather LAB) — Phase-1 labels and apply_strategy dispatch run this
STRATEGY_FNS = {k: _jit_with_method(f, "radix") for k, f in _BUILDERS.items()}
# throughput tier (canonical descent, fast guided filter, histogram
# percentiles, arithmetic LAB) — opt-in for bulk labeling (cli
# build-dataset --fast); near-tie winners may occasionally flip
STRATEGY_FNS_FAST = {k: _jit_with_method(f, "hist-fast")
                     for k, f in _BUILDERS.items()}
# plane-returning twins of the two tiers: the Phase-1 label program keeps
# everything channel-first end to end (strategy -> metric -> winner
# where-chain) and stacks NHWC exactly ONCE at exit — the per-strategy
# stack + the metrics' NHWC re-split cost ~0.9 ms/frame of pure layout
# copies @1080p x batch 4 in the device trace (tools/prof_label_trace)
STRATEGY_FNS_PLANES = {k: _jit_with_method(f, "radix")
                       for k, f in _BUILDERS_PLANES.items()}
STRATEGY_FNS_FAST_PLANES = {k: _jit_with_method(f, "hist-fast")
                            for k, f in _BUILDERS_PLANES.items()}

strong_dehazing = STRATEGY_FNS["strong_dehazing"]
medium_dehazing = STRATEGY_FNS["medium_dehazing"]
light_enhancement = STRATEGY_FNS["light_enhancement"]
clahe_enhancement = STRATEGY_FNS["clahe_enhancement"]
histogram_equalization = STRATEGY_FNS["histogram_equalization"]

# Display names as used in CSVs / dataset labels (config.py 'name' fields).
STRATEGY_DISPLAY = {k: v["name"] for k, v in DEFAULT_STRATEGIES.items()}


def apply_strategy(img: jnp.ndarray, strategy_name: str,
                   params: Dict[str, Any] | None = None) -> jnp.ndarray:
    """Unified dispatch (enhancement_strategies.py:477-508).

    Unlike the reference, unknown strategies raise immediately and failures
    propagate (the reference swallowed exceptions and returned the input —
    silent fallback is not reproduced by design; use a try/except at call
    sites that want it)."""
    if strategy_name not in STRATEGY_FNS:
        raise ValueError(f"unknown strategy: {strategy_name}")
    if params:
        return _apply_custom(img, strategy_name, _freeze(params))
    return STRATEGY_FNS[strategy_name](img)


def _freeze(params: Dict[str, Any]):
    # hashable (jit-static) form; JSON/CLI configs hand in lists, the
    # reference accepts any sequence (e.g. tile_grid_size=[8, 8])
    return tuple(
        (k, tuple(v) if isinstance(v, (list, tuple)) else v)
        for k, v in sorted(params.items())
    )


@partial(jax.jit, static_argnames=("strategy_name", "frozen"))
def _apply_custom(img, strategy_name: str, frozen):
    """Strategy with overridden params (the params.get(...) paths)."""
    p = dict(frozen)
    if strategy_name in ("strong_dehazing", "medium_dehazing", "light_enhancement"):
        defaults = {
            "strong_dehazing": (0.5, 15, 10.0, 95.0, False, 1.2),
            "medium_dehazing": (0.6, 20, 15.0, 92.0, False, 1.2),
            "light_enhancement": (0.4, 10, 15.0, 95.0, False, 1.2),
        }[strategy_name]
        return _per_image(
            lambda im: jnp.stack(_dehaze_then_stretch(
                im,
                p.get("omega", defaults[0]),
                int(p.get("guided_radius", defaults[1])),
                float(p.get("L_low", defaults[2])),
                float(p.get("L_high", defaults[3])),
                bool(p.get("apply_gamma", defaults[4])),
                float(p.get("gamma", defaults[5])),
            ), axis=-1),
            img,
        )
    if strategy_name == "clahe_enhancement":
        def one(im):
            c = histeq.clahe_enhancement_planes(
                _split(im), float(p.get("clip_limit", 2.0)),
                *(p.get("tile_grid_size", (8, 8))),
            )
            out = stretch.color_enhancement_planes(
                c, float(p.get("L_low", 20.0)), float(p.get("L_high", 85.0)),
                method="radix",
            )
            if p.get("apply_gamma", False):
                out = tuple(stretch.gamma_correction_inv(
                    ch, float(p.get("gamma", 1.2))) for ch in out)
            return jnp.stack(out, axis=-1)

        return _per_image(one, img)
    # histogram_equalization
    def one(im):
        e = histeq.histogram_equalization_planes(_split(im))
        out = stretch.color_enhancement_planes(
            e, float(p.get("L_low", 10.0)), float(p.get("L_high", 95.0)),
            method="radix",
        )
        if p.get("apply_gamma", False):
            out = tuple(stretch.gamma_correction_inv(
                ch, float(p.get("gamma", 1.2))) for ch in out)
        return jnp.stack(out, axis=-1)

    return _per_image(one, img)
