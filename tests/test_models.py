"""Model smoke + parity tests (mirrors model_architectures.py:230-264 style,
plus differentiable-enhancement parity vs a torch-free numpy oracle)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from underwater_image_enhancement_tpu.models import diff_enhance, losses, mlp, vgg, zoo


def _np_stretch_index(img, l_low, l_high):
    """Numpy oracle of vgg_16_UIE.py:57-92 (torch semantics, B x C loops)."""
    out = np.zeros_like(img)
    B, H, W, C = img.shape
    n = H * W
    for b in range(B):
        for c in range(C):
            flat = np.sort(img[b, :, :, c].reshape(-1))
            li = min(max(int(l_low[b] / 100.0 * n), 0), n - 1)
            hi = min(max(int(l_high[b] / 100.0 * n), 0), n - 1)
            p_low, p_high = flat[li], flat[hi]
            out[b, :, :, c] = np.clip(
                (img[b, :, :, c] - p_low) / (p_high - p_low + 1e-8), 0, 1
            )
    return out


def test_enhance_vgg_matches_oracle(rng):
    img = rng.random((2, 32, 48, 3)).astype(np.float32)
    p = {
        "L_low": np.array([5.0, 8.0], np.float32),
        "L_high": np.array([92.0, 95.0], np.float32),
        "omega": np.array([0.6, 0.5], np.float32),
        "gamma": np.array([1.2, 1.3], np.float32),
    }
    got = np.asarray(diff_enhance.enhance_vgg(img, {k: jnp.asarray(v) for k, v in p.items()}))
    # oracle
    e = _np_stretch_index(img.astype(np.float64), p["L_low"], p["L_high"])
    om = p["omega"].reshape(-1, 1, 1, 1)
    dark = e.min(axis=-1, keepdims=True)
    t = np.clip(1 - om * dark, 0.1, 1.0)
    e = np.clip((e - 0.6) / t + 0.6, 0, 1)
    e = np.power(e + 1e-8, p["gamma"].reshape(-1, 1, 1, 1))
    want = np.clip(e, 0, 1)
    assert np.abs(got - want).max() < 1e-5


def test_enhance_mlp_matches_oracle(rng):
    img = rng.random((2, 24, 24, 3)).astype(np.float32)
    p = {
        "L_low": jnp.asarray([6.0, 10.0]),
        "L_high": jnp.asarray([90.0, 97.0]),
        "gamma": jnp.asarray([1.1, 1.4]),
        "use_gamma": jnp.asarray([0.3, 0.9]),
    }
    got = np.asarray(diff_enhance.enhance_mlp(img, p))
    e = _np_stretch_index(img.astype(np.float64), np.array([6.0, 10.0]),
                          np.array([90.0, 97.0]))
    g = np.array([1.1, 1.4]).reshape(-1, 1, 1, 1)
    u = np.array([0.3, 0.9]).reshape(-1, 1, 1, 1)
    ge = np.power(e + 1e-8, 1.0 / g)
    want = np.clip(u * ge + (1 - u) * e, 0, 1)
    assert np.abs(got - want).max() < 1e-5


def test_quantile_stretch_has_param_grads(rng):
    """Framework improvement: quantile mode gives gradients to L_low/L_high."""
    img = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))

    def loss(llow):
        p = {"L_low": llow, "L_high": jnp.asarray([95.0]),
             "gamma": jnp.asarray([1.2]), "use_gamma": jnp.asarray([1.0])}
        return jnp.mean(diff_enhance.enhance_mlp(img, p, stretch_mode="quantile"))

    g = jax.grad(loss)(jnp.asarray([10.0]))
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).max() > 0


def test_mlp_predictor_ranges(rng):
    model = mlp.ParameterPredictor()
    feats = jnp.asarray(rng.random((4, 79)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), feats)
    out = model.apply(params, feats)
    assert set(out) == {"gamma", "L_low", "L_high", "use_gamma"}
    for name, (lo, hi) in mlp.PARAM_RANGES.items():
        v = np.asarray(out[name])
        assert v.shape == (4, 1)
        assert (v >= lo).all() and (v <= hi).all()


def test_vgg_predictor_forward(rng):
    model = vgg.ImprovedVGGParameterNet(hidden_dim=64)
    img = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.random((2, 79)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img, feats)
    out = model.apply(variables, img, feats)
    for name, (lo, hi) in vgg.PARAM_RANGES.items():
        v = np.asarray(out[name])
        assert (v >= lo).all() and (v <= hi).all()


@pytest.mark.parametrize("mtype", ["resnet", "efficientnet"])
def test_zoo_models_forward(rng, mtype):
    model = zoo.create_model(mtype)
    img = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(variables, img)
    assert set(out) == set(zoo.SIX_PARAM_RANGES)
    for name, (lo, hi) in zoo.SIX_PARAM_RANGES.items():
        v = np.asarray(out[name])
        assert (v >= lo).all() and (v <= hi).all(), name


def test_vit_model_forward(rng):
    model = zoo.ViTParameterPredictor(dim=64, depth=2, heads=4)
    img = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(variables, img)
    assert set(out) == set(zoo.SIX_PARAM_RANGES)


def test_losses(rng):
    a = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    b = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    total, comp = losses.reference_loss(a, b)
    want = 0.5 * np.abs(np.asarray(a) - np.asarray(b)).mean() + 0.5 * (
        (np.asarray(a) - np.asarray(b)) ** 2
    ).mean()
    assert abs(float(total) - want) < 1e-6
    vp = losses.init_perceptual_params(jax.random.PRNGKey(0), (1, 32, 32, 3))
    total2, comp2 = losses.combined_loss(vp, a, b)
    assert np.isfinite(float(total2))
    assert set(comp2) == {"l1", "l2", "perceptual"}
    # identical inputs -> zero loss
    t0, _ = losses.combined_loss(vp, a, a)
    assert float(t0) < 1e-10
