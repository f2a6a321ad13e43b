"""End-to-end strategy parity: pipeline/{strategies,six,cast} vs golden CPU.

All strategies are gated at >=50 dB against the golden cv2/numpy oracle.  The
CLAHE roundtrip (u8 quantize, RGB2LAB, CLAHE core, LAB2RGB) is bit-exact vs
cv2 (OpenCV's integer pipelines are replicated — see test_histeq.py and
docs/lab_bitexact_notes.md), so residuals are only fp32-vs-fp64 float noise
in the stretch/dehaze stages.
"""

import numpy as np
import pytest

from underwater_image_enhancement_tpu.pipeline import cast, six, strategies
from underwater_image_enhancement_tpu.testing import golden
from tests.conftest import psnr

GATE = 50.0


@pytest.mark.parametrize("name", list(strategies.STRATEGY_FNS))
def test_config_strategies(underwater_img, name):
    got = np.asarray(strategies.apply_strategy(underwater_img, name))
    want = golden.strategy_config(underwater_img.astype(np.float64), name)
    assert psnr(got, want) > GATE, f"{name}: {psnr(got, want):.1f} dB"


@pytest.mark.parametrize("name", list(six.SIX_STRATEGIES))
def test_six_strategies(underwater_img, name):
    got = np.asarray(six.SIX_STRATEGIES[name](underwater_img))
    want = golden.strategy_six(underwater_img.astype(np.float64), name)
    assert psnr(got, want) > GATE, f"{name}: {psnr(got, want):.1f} dB"


def test_batched_equals_single(underwater_img):
    batch = np.stack([underwater_img, underwater_img[:, ::-1]])
    got = np.asarray(strategies.medium_dehazing(batch))
    for i in range(2):
        single = np.asarray(strategies.medium_dehazing(batch[i]))
        np.testing.assert_allclose(got[i], single, atol=1e-6)


def test_apply_strategy_unknown_raises(underwater_img):
    with pytest.raises(ValueError):
        strategies.apply_strategy(underwater_img, "nope")


def test_apply_strategy_custom_params(underwater_img):
    got = np.asarray(
        strategies.apply_strategy(
            underwater_img,
            "medium_dehazing",
            {"omega": 0.6, "guided_radius": 20, "L_low": 15, "L_high": 92,
             "apply_gamma": True},
        )
    )
    want = golden.strategy_config(underwater_img.astype(np.float64), "medium_dehazing")
    assert psnr(got, want) > GATE


def test_cast_detection(underwater_img, rng):
    cases = {
        "greenish": np.clip(underwater_img + np.array([0, 0.3, 0]), 0, 1).astype(np.float32),
        "bluish": np.clip(underwater_img * np.array([0.5, 0.8, 1.0]) + np.array([0, 0, 0.2]), 0, 1).astype(np.float32),
        "normal": np.full((32, 32, 3), 0.5, np.float32),
    }
    for want_kind, img in cases.items():
        assert golden.detect_cast(img) == want_kind  # sanity on the fixture
        code = int(cast.detect_cast(img))
        assert cast.CAST_NAMES[code] == want_kind
        got = np.asarray(cast.correct_cast(img, np.int32(code)))
        np.testing.assert_allclose(
            got, golden.correct_cast(img.astype(np.float64), want_kind), atol=1e-6
        )


def test_cast_batched(underwater_img):
    g = np.clip(underwater_img + np.array([0, 0.3, 0]), 0, 1).astype(np.float32)
    batch = np.stack([underwater_img, g])
    corrected, codes = cast.detect_and_correct(batch)
    assert corrected.shape == batch.shape
    assert codes.shape == (2,)


def test_six_fast_mode_close_to_exact(underwater_img):
    """The throughput six variants (hist-fast percentiles, global-edge
    quadtree, 8-round hysteresis, subsampled fast guided filter) must stay
    visually equivalent to the parity variants: >= 25 dB per strategy (the
    approximations can shift the airlight pick on synthetic noise; real
    degradation would land far below this)."""
    import jax.numpy as jnp

    from underwater_image_enhancement_tpu.pipeline.six import (
        SIX_STRATEGIES,
        SIX_STRATEGIES_FAST,
    )

    img = jnp.asarray(underwater_img)
    for name in SIX_STRATEGIES:
        exact = np.asarray(SIX_STRATEGIES[name](img))
        fast = np.asarray(SIX_STRATEGIES_FAST[name](img))
        mse = ((exact - fast) ** 2).mean()
        psnr = 10 * np.log10(1.0 / max(mse, 1e-30))
        assert psnr > 25, (name, psnr)


def test_config_fast_tier_close_to_exact(underwater_img):
    """The Phase-1 throughput tier (STRATEGY_FNS_FAST: global-edge quadtree
    descent, fast guided filter, histogram percentiles, arithmetic LAB)
    must stay visually equivalent to the exact labeling strategies —
    >= 25 dB each, the same bar as the six fast tier."""
    import jax.numpy as jnp

    img = jnp.asarray(underwater_img)
    for name in strategies.STRATEGY_FNS:
        exact = np.asarray(strategies.STRATEGY_FNS[name](img))
        fast = np.asarray(strategies.STRATEGY_FNS_FAST[name](img))
        mse = ((exact - fast) ** 2).mean()
        p = 10 * np.log10(1.0 / max(mse, 1e-30))
        assert p > 25, (name, p)


def test_fast_label_winner_agrees_or_near_tie(underwater_img, rng):
    """fast=True labeling must pick the same winner as the exact tier, or a
    near-tie: the exact-tier score gap between the exact winner and the
    fast-picked strategy stays < 1.0 (scores are 0-100)."""
    from underwater_image_enhancement_tpu.select.system import _label_batch
    from underwater_image_enhancement_tpu.utils.config import (
        DEFAULT_QUALITY_WEIGHTS,
    )

    imgs = np.stack([
        underwater_img,
        underwater_img[::-1],
        np.clip(underwater_img * 0.5, 0, 1),
        (np.floor(np.clip(
            underwater_img + rng.normal(0, 0.05, underwater_img.shape), 0, 1,
        ).astype(np.float32) * 255) / 255).astype(np.float32),
    ])
    weights = tuple(sorted(DEFAULT_QUALITY_WEIGHTS.items()))
    _, scores_e, best_e, _ = _label_batch(imgs, weights, return_all=False)
    _, _, best_f, _ = _label_batch(imgs, weights, return_all=False, fast=True)
    scores_e, best_e, best_f = map(np.asarray, (scores_e, best_e, best_f))
    for i in range(len(imgs)):
        if best_e[i] != best_f[i]:
            gap = scores_e[i, best_e[i]] - scores_e[i, best_f[i]]
            assert gap < 1.0, (i, gap, scores_e[i])
