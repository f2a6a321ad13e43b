"""Public enhancement APIs — the framework's north-star entry points.

- ``enhance(img, params)``: the reference's trained-model enhance()
  (use_trained_model.py:83-111 -> DifferentiableEnhancement forward):
  percentile stretch + A=0.6 dehaze + gamma at FULL resolution with
  parameters predicted at 224^2 (SURVEY.md §2.7 "key behavior").
- ``enhance_batch``: the same, jitted over an NHWC batch — the benchmark
  path (BASELINE.md: frames/s/chip at 1080p).
- ``six_strategy_batch``: the folder pipeline six_stadigy.py:330-530 —
  color-cast detect/correct then all six strategies per image, returning
  the stack of results + a per-image log (CSV written by the CLI).
- ``auto_enhance``: detect cast, run all strategies, score with the
  comprehensive metric, return the best (main.py Phase-1 per-image logic
  as a single compiled program).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from underwater_image_enhancement_tpu.metrics.quality import comprehensive_batch
from underwater_image_enhancement_tpu.models import diff_enhance
from underwater_image_enhancement_tpu.pipeline import cast as cast_mod
from underwater_image_enhancement_tpu.pipeline.six import SIX_STRATEGIES
from underwater_image_enhancement_tpu.pipeline.strategies import STRATEGY_FNS

DEFAULT_PARAMS = {
    "omega": 0.6,
    "gamma": 1.2,
    "L_low": 10.0,
    "L_high": 90.0,
    "use_gamma": 1.0,
}


def _param_arrays(params: Dict[str, float], batch: int) -> Dict[str, jnp.ndarray]:
    p = dict(DEFAULT_PARAMS)
    p.update(params or {})
    return {k: jnp.full((batch,), float(v), jnp.float32)
            for k, v in p.items() if k in ("omega", "gamma", "L_low", "L_high")}


@partial(jax.jit, static_argnames=("stretch_mode",))
def enhance_batch(imgs: jnp.ndarray, l_low, l_high, omega, gamma,
                  stretch_mode: str = "hist") -> jnp.ndarray:
    """(B, H, W, 3) [0,1] -> enhanced, vgg_16_UIE.py:32-55 semantics.

    stretch_mode: 'index' reproduces the reference's sorted-index
    percentiles via a per-channel sort; 'hist' computes the SAME sorted-index
    percentile through an exact O(n) 256-bin histogram — bit-equal to 'index'
    whenever the input lies on the u8 grid (any decoded image; see
    tests/test_pipeline_api.py), and the production throughput path."""
    B = imgs.shape[0]
    params = {
        "L_low": jnp.broadcast_to(jnp.asarray(l_low, jnp.float32), (B,)),
        "L_high": jnp.broadcast_to(jnp.asarray(l_high, jnp.float32), (B,)),
        "omega": jnp.broadcast_to(jnp.asarray(omega, jnp.float32), (B,)),
        "gamma": jnp.broadcast_to(jnp.asarray(gamma, jnp.float32), (B,)),
    }
    mode = "index-u8" if stretch_mode == "hist" else stretch_mode
    return diff_enhance.enhance_vgg(imgs, params, stretch_mode=mode)


def enhance(img: jnp.ndarray, params: Optional[Dict[str, float]] = None,
            stretch_mode: str = "index") -> jnp.ndarray:
    """Single-image enhance() — use_trained_model.py:83-111 semantics.

    params: scalars among omega/gamma/L_low/L_high (defaults match the
    predictor's safety clamps at use_trained_model.py:69-79)."""
    p = dict(DEFAULT_PARAMS)
    p.update(params or {})
    return enhance_batch(
        img[None], p["L_low"], p["L_high"], p["omega"], p["gamma"],
        stretch_mode=stretch_mode,
    )[0]


SIX_ORDER = tuple(SIX_STRATEGIES)  # strong, medium, light, clahe, wb, hist_eq


@partial(jax.jit, static_argnames=("fast",))
def six_strategy_tuple(img: jnp.ndarray, fast: bool = False):
    """One image -> (tuple of six (H, W, 3) outputs, cast code) — all six
    strategies after cast correction (six_stadigy.py:392-447 per-image
    body).  fast=True uses histogram percentiles (the batch-throughput
    mode).

    Returns a TUPLE so each strategy's final fusion writes its own output
    buffer: the (6, H, W, 3) stack copy costs ~0.3 ms/frame at 1080p, and
    the CLI/bench consume per-strategy frames anyway.

    The atmospheric light is estimated ONCE and shared by the three dehaze
    strategies — they all run the same descent on the same corrected image,
    so the outputs are bit-identical to the per-strategy recomputation the
    reference does (six_stadigy.py:231,242,252), at a third of the cost.
    (Folding the five independent CLAHE-LAB legs into one batched pass —
    histeq.clahe_enhancement_planes_multi — was benched SLOWER here: the
    concat copies plus the barrier before the single pass cost more than
    the five launches they save; the multi API remains for true batch
    workloads.)"""
    from underwater_image_enhancement_tpu.pipeline import six as six_mod

    # exact tier: O(n) radix percentiles, bit-equal to the sort oracle
    method = "hist-fast" if fast else "radix"
    corrected, code = cast_mod.detect_and_correct(img)
    A = six_mod._airlight(six_mod._split(corrected), method)
    outs = []
    for k in SIX_ORDER:
        builder = six_mod._BUILDERS[k]
        if k in ("strong_dehazing", "medium_dehazing", "light_dehazing"):
            outs.append(builder(corrected, method, A=A))
        else:
            outs.append(builder(corrected, method))
    return tuple(outs), code


def six_strategy_single(img: jnp.ndarray, fast: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One image -> (6, H, W, 3) stack of all six strategies + cast code.
    Stacked convenience wrapper over six_strategy_tuple (which avoids the
    stack copy and is what the CLI/bench drive)."""
    outs, code = six_strategy_tuple(img, fast=fast)
    return jnp.stack(outs), code


def six_strategy_batch(imgs: jnp.ndarray):
    """(B, H, W, 3) -> ((B, 6, H, W, 3), (B,) cast codes)."""
    return jax.vmap(six_strategy_single)(imgs)


CONFIG_ORDER = tuple(STRATEGY_FNS)


@jax.jit
def auto_enhance_batch(imgs: jnp.ndarray):
    """main.py Phase-1 inner loop as one program: run all 5 config-flavor
    strategies, score each with the config quality weights, return
    (best_images, best_idx, scores (B, 5))."""
    from underwater_image_enhancement_tpu.utils.config import DEFAULT_QUALITY_WEIGHTS

    # no (B, S, H, W, 3) stack: score per strategy output and select the
    # winner with a fused elementwise where-chain (same rewrite as
    # select/system._label_batch — the stack's concatenate+copy+gather
    # cost ~1 ms/frame @1080p on v5e)
    outs = [STRATEGY_FNS[k](imgs) for k in CONFIG_ORDER]
    scores = jnp.stack(
        [comprehensive_batch(o, DEFAULT_QUALITY_WEIGHTS) for o in outs],
        axis=1)
    best = jnp.argmax(scores, axis=1)
    best_imgs = outs[0]
    for k in range(1, len(outs)):
        best_imgs = jnp.where((best == k)[:, None, None, None],
                              outs[k], best_imgs)
    return best_imgs, best, scores


def enhance_batch_dp(imgs, l_low, l_high, omega, gamma, mesh,
                     stretch_mode: str = "hist"):
    """Data-parallel enhance_batch: shard the batch over a 1-D device mesh
    (each image's percentile reductions are per-image, so XLA partitions the
    whole program along the batch with zero collectives)."""
    from underwater_image_enhancement_tpu.parallel.mesh import shard_batch

    sharded = shard_batch(imgs, mesh)
    return enhance_batch(sharded, l_low, l_high, omega, gamma,
                         stretch_mode=stretch_mode)
