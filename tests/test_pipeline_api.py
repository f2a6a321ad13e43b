"""Public API tests: enhance(), auto_enhance, six-strategy batch, predictor."""

import numpy as np
import jax.numpy as jnp
import pytest

from underwater_image_enhancement_tpu.pipeline import enhance as E
from underwater_image_enhancement_tpu.testing import golden


def test_enhance_matches_reference_semantics(underwater_img):
    """enhance(stretch_mode='index') must match the torch-semantics oracle."""
    p = {"omega": 0.6, "gamma": 1.2, "L_low": 10.0, "L_high": 90.0}
    got = np.asarray(E.enhance(jnp.asarray(underwater_img), p))
    # oracle (vgg flavor): index stretch -> A=0.6 dehaze -> gamma
    img = underwater_img.astype(np.float64)
    out = np.zeros_like(img)
    n = img.shape[0] * img.shape[1]
    for c in range(3):
        flat = np.sort(img[..., c].reshape(-1))
        lo = flat[min(max(int(0.10 * n), 0), n - 1)]
        hi = flat[min(max(int(0.90 * n), 0), n - 1)]
        out[..., c] = np.clip((img[..., c] - lo) / (hi - lo + 1e-8), 0, 1)
    dark = out.min(-1, keepdims=True)
    t = np.clip(1 - 0.6 * dark, 0.1, 1.0)
    out = np.clip((out - 0.6) / t + 0.6, 0, 1)
    want = np.clip((out + 1e-8) ** 1.2, 0, 1)
    assert np.abs(got - want).max() < 1e-4


def test_enhance_hist_mode_bit_equal_on_u8_grid(underwater_img):
    """The benched 'hist' mode IS the parity-gated mode: on u8-grid inputs
    (any decoded image — the conftest fixture is floor-quantized) the O(n)
    histogram order statistic equals the sort path bit-for-bit."""
    p = {"omega": 0.6, "gamma": 1.2, "L_low": 10.0, "L_high": 90.0}
    exact = np.asarray(E.enhance(jnp.asarray(underwater_img), p, stretch_mode="index"))
    fast = np.asarray(E.enhance(jnp.asarray(underwater_img), p, stretch_mode="hist"))
    np.testing.assert_array_equal(exact, fast)


def test_enhance_hist_mode_close_off_grid(rng):
    """Off the u8 grid the histogram percentile quantizes (<=1/255): still
    >=50 dB against the sort path."""
    img = rng.random((64, 80, 3)).astype(np.float32)  # NOT u8-quantized
    p = {"omega": 0.6, "gamma": 1.2, "L_low": 10.0, "L_high": 90.0}
    exact = np.asarray(E.enhance(jnp.asarray(img), p, stretch_mode="index"))
    fast = np.asarray(E.enhance(jnp.asarray(img), p, stretch_mode="hist"))
    mse = ((exact - fast) ** 2).mean()
    assert 10 * np.log10(1 / max(mse, 1e-30)) > 50


def test_index_u8_percentiles_match_sorted_index(rgb_u8):
    """Channel-level check across many (L_low, L_high) pairs: two-level
    256-bin histogram == sorted[int(L/100*n)] exactly on u8-grid data."""
    from underwater_image_enhancement_tpu.ops.stretch import _perc_pair_index_u8

    chan = (rgb_u8[..., 1].astype(np.float32) / 255.0).astype(np.float32)
    flat = np.sort(chan.reshape(-1))
    n = flat.size
    for lo, hi in [(0.0, 100.0), (10.0, 90.0), (2.0, 98.0), (37.5, 62.5),
                   (50.0, 50.0), (99.0, 99.9)]:
        p_lo, p_hi = _perc_pair_index_u8(jnp.asarray(chan), lo, hi)
        want_lo = flat[min(max(int(lo / 100.0 * n), 0), n - 1)]
        want_hi = flat[min(max(int(hi / 100.0 * n), 0), n - 1)]
        assert float(p_lo) == want_lo, (lo, float(p_lo), want_lo)
        assert float(p_hi) == want_hi, (hi, float(p_hi), want_hi)


def test_six_strategy_single(underwater_img):
    outs, code = E.six_strategy_single(jnp.asarray(underwater_img))
    assert outs.shape == (6,) + underwater_img.shape
    assert np.isfinite(np.asarray(outs)).all()
    # each must match its standalone strategy on the cast-corrected image
    from underwater_image_enhancement_tpu.pipeline import cast as C
    from underwater_image_enhancement_tpu.pipeline.six import SIX_STRATEGIES

    corrected, _ = C.detect_and_correct(jnp.asarray(underwater_img))
    for k, name in enumerate(E.SIX_ORDER):
        want = np.asarray(SIX_STRATEGIES[name](corrected))
        np.testing.assert_allclose(np.asarray(outs[k]), want, atol=1e-6)


def test_auto_enhance_picks_argmax(underwater_img):
    batch = jnp.asarray(underwater_img)[None]
    best_imgs, best, scores = E.auto_enhance_batch(batch)
    assert best_imgs.shape == batch.shape
    assert scores.shape == (1, 5)
    k = int(np.argmax(np.asarray(scores)[0]))
    assert int(best[0]) == k
    # score computed on golden CPU for the chosen strategy should agree
    from underwater_image_enhancement_tpu.testing import golden_metrics as gm
    from underwater_image_enhancement_tpu.utils.config import DEFAULT_QUALITY_WEIGHTS

    name = E.CONFIG_ORDER[k]
    want_img = golden.strategy_config(underwater_img.astype(np.float64), name)
    want_total, _ = gm.comprehensive(want_img, DEFAULT_QUALITY_WEIGHTS)
    assert abs(float(scores[0, k]) - want_total) < 0.5


def test_predictor_end_to_end(tmp_path, underwater_img):
    """Randomly-initialized predictor must run the full pipeline: params in
    clamped ranges, output finite, files written."""
    from underwater_image_enhancement_tpu.models.predictor import (
        CLAMPS,
        EnhancementPredictor,
    )
    from underwater_image_enhancement_tpu.utils import io as uio

    pred = EnhancementPredictor()
    params = pred.predict_parameters(jnp.asarray(underwater_img))
    for k, (lo, hi) in CLAMPS.items():
        assert lo <= params[k] <= hi, k
    out = pred.enhance_image(jnp.asarray(underwater_img), params)
    assert out.shape == underwater_img.shape and np.isfinite(out).all()

    src = tmp_path / "in.png"
    uio.imwrite_unit(str(src), underwater_img)
    pred.process_single_image(str(src), str(tmp_path / "out.png"), log=lambda *_: None)
    assert (tmp_path / "out.png").exists()
