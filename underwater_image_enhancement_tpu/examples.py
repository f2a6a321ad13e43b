"""Runnable examples — the example_usage.py:20-296 surface, TPU-native.

    python -m underwater_image_enhancement_tpu.examples <n|all>

1  single strategy            2  all strategies
3  quality assessment         4  feature extraction
5  strategy comparison        6  real image from a folder
7  config validation
"""

from __future__ import annotations

import sys

import numpy as np


def _test_image(h=128, w=160, seed=0):
    """Synthetic hazy underwater image (example_usage.py:112 analog)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [0.18 + 0.08 * np.sin(xx / 19), 0.42 + 0.18 * (yy / h),
         0.52 + 0.18 * (xx / w)], -1)
    img = np.clip(base + rng.normal(0, 0.04, (h, w, 3)), 0, 1).astype(np.float32)
    return (np.floor(img * 255) / 255).astype(np.float32)


def example_1_single_strategy():
    import jax.numpy as jnp

    from underwater_image_enhancement_tpu.pipeline.strategies import apply_strategy

    img = _test_image()
    out = np.asarray(apply_strategy(jnp.asarray(img), "medium_dehazing"))
    print(f"medium_dehazing: in mean {img.mean():.3f} -> out mean {out.mean():.3f}")


def example_2_all_strategies():
    import jax.numpy as jnp

    from underwater_image_enhancement_tpu.pipeline.strategies import STRATEGY_FNS

    img = jnp.asarray(_test_image())
    for name, fn in STRATEGY_FNS.items():
        out = np.asarray(fn(img))
        print(f"{name:<26} out range [{out.min():.3f}, {out.max():.3f}]")


def example_3_quality_assessment():
    import jax.numpy as jnp

    from underwater_image_enhancement_tpu.metrics.quality import (
        comprehensive_assessment,
    )

    for label, img in [("hazy", _test_image()),
                       ("flat", np.full((128, 160, 3), 0.5, np.float32))]:
        total, scores = comprehensive_assessment(jnp.asarray(img))
        detail = ", ".join(f"{k} {float(v):.1f}" for k, v in scores.items())
        print(f"{label}: total {float(total):.2f}  ({detail})")


def example_4_features():
    import jax.numpy as jnp

    from underwater_image_enhancement_tpu.features.full import extract_all_features

    v = np.asarray(extract_all_features(jnp.asarray(_test_image())))
    print(f"feature dim {v.shape[0]}, range [{v.min():.3f}, {v.max():.3f}], "
          f"finite: {np.isfinite(v).all()}")


def example_5_strategy_comparison():
    import jax.numpy as jnp

    from underwater_image_enhancement_tpu.pipeline.enhance import (
        CONFIG_ORDER,
        auto_enhance_batch,
    )

    img = jnp.asarray(_test_image())[None]
    _, best, scores = auto_enhance_batch(img)
    ranked = sorted(zip(CONFIG_ORDER, np.asarray(scores)[0]), key=lambda kv: -kv[1])
    for name, s in ranked:
        marker = " <- best" if name == CONFIG_ORDER[int(best[0])] else ""
        print(f"{name:<26} {float(s):6.2f}{marker}")


def example_6_real_image():
    import tempfile

    from underwater_image_enhancement_tpu.utils import io as uio

    with tempfile.TemporaryDirectory() as d:
        uio.imwrite_unit(f"{d}/demo.png", _test_image())
        img = uio.imread_unit(f"{d}/demo.png")
        print(f"roundtrip ok: {img.shape}, dtype {img.dtype}")


def example_7_config_validation():
    from underwater_image_enhancement_tpu.utils.config import (
        Config,
        DEFAULT_QUALITY_WEIGHTS,
    )

    cfg = Config()
    print(f"strategies: {list(cfg.strategies)}")
    s = sum(DEFAULT_QUALITY_WEIGHTS.values())
    print(f"quality weights sum: {s:.2f} (reference config sums to 1.0)")
    print(f"input folder exists: {cfg.validate()}")


EXAMPLES = [
    example_1_single_strategy, example_2_all_strategies,
    example_3_quality_assessment, example_4_features,
    example_5_strategy_comparison, example_6_real_image,
    example_7_config_validation,
]


def main(arg: str = "all") -> None:
    picks = EXAMPLES if arg == "all" else [EXAMPLES[int(arg) - 1]]
    for fn in picks:
        print(f"--- {fn.__name__} ---")
        fn()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
