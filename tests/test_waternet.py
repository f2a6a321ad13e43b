"""Water-Net / UNet enhancer: oracle parity, one-jit pipeline, sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from underwater_image_enhancement_tpu.models import waternet as wn
from underwater_image_enhancement_tpu.ops import histeq, stretch
from underwater_image_enhancement_tpu.testing import golden_cnn


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def test_waternet_forward_matches_numpy_oracle(rng):
    model = wn.WaterNet(features=16, ftu_features=8)
    variables = wn.init_waternet(jax.random.PRNGKey(0), 16, model)
    raw, wb, he, gc = (rng.random((2, 20, 24, 3)).astype(np.float32)
                       for _ in range(4))
    got = np.asarray(model.apply(variables, raw, wb, he, gc))
    want = golden_cnn.waternet_forward(
        jax.tree.map(np.asarray, variables), raw, wb, he, gc)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_unet_forward_matches_numpy_oracle(rng):
    model = wn.UNetEnhancer(features=8)
    x = rng.random((2, 16, 24, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(x))
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    want = golden_cnn.unet_forward(jax.tree.map(np.asarray, variables), x)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_gray_world_white_balance_matches_numpy(rng):
    img = rng.random((12, 14, 3)).astype(np.float32) * np.array(
        [0.9, 0.5, 0.3], np.float32)  # strong cast
    got = np.asarray(stretch.gray_world_white_balance(jnp.asarray(img)))
    means = img.reshape(-1, 3).mean(0)
    want = np.clip(img * (means.mean() / np.maximum(means, 1e-6)), 0, 1)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # the cast is gone: channel means equalized (up to clipping)
    assert np.std(got.reshape(-1, 3).mean(0)) < np.std(means)


def test_preprocess_views_composition(rng):
    """Views inside the jitted pipeline == the standalone kernels."""
    img = rng.random((2, 16, 16, 3)).astype(np.float32)
    wb, he, gc = wn.preprocess_views(jnp.asarray(img))
    np.testing.assert_array_equal(
        np.asarray(he[0]),
        np.asarray(histeq.histogram_equalization(jnp.asarray(img[0]))))
    np.testing.assert_allclose(
        np.asarray(wb),
        np.asarray(stretch.gray_world_white_balance(jnp.asarray(img))),
        atol=0)
    # pow codegen differs across backends (TPU measured 3.2e-6 abs)
    np.testing.assert_allclose(np.asarray(gc),
                               np.clip(img ** 0.7, 0, 1), atol=1e-5)


def test_waternet_enhance_one_jit_pipeline(rng):
    """Full pipeline + CNN in one call; (H,W,3) and (N,H,W,3) agree."""
    model = wn.WaterNet(features=8, ftu_features=4)
    variables = wn.init_waternet(jax.random.PRNGKey(2), 16, model)
    imgs = rng.random((3, 24, 24, 3)).astype(np.float32)
    batched = np.asarray(wn.waternet_enhance(variables, jnp.asarray(imgs),
                                             model))
    single = np.asarray(wn.waternet_enhance(variables, jnp.asarray(imgs[1]),
                                            model))
    assert batched.shape == imgs.shape
    np.testing.assert_allclose(batched[1], single, atol=1e-6)
    assert batched.min() >= 0.0 and batched.max() <= 1.0


def test_unet_enhance_pads_non_multiple_of_4(rng):
    model = wn.UNetEnhancer(features=4)
    x = rng.random((1, 18, 22, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(3),
                           jnp.zeros((1, 20, 24, 3), jnp.float32))
    out = np.asarray(wn.unet_enhance(variables, jnp.asarray(x), model))
    assert out.shape == x.shape
    assert np.isfinite(out).all()


def test_waternet_bf16_deployment_dtype(rng):
    """bf16 compute path runs and stays close to the f32 program."""
    f32 = wn.WaterNet(features=8, ftu_features=4)
    bf16 = wn.WaterNet(features=8, ftu_features=4, dtype=jnp.bfloat16)
    variables = wn.init_waternet(jax.random.PRNGKey(4), 16, f32)
    imgs = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    wb, he, gc = wn.preprocess_views(imgs)
    a = np.asarray(f32.apply(variables, imgs, wb, he, gc))
    b = np.asarray(bf16.apply(variables, imgs, wb, he, gc))
    assert np.abs(a - b).max() < 0.05


def test_enhance_sharded_matches_single_device(rng, mesh8=None):
    """DP-sharded and row-sharded inference == unsharded (XLA SPMD halos)."""
    from underwater_image_enhancement_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    model = wn.WaterNet(features=8, ftu_features=4)
    variables = wn.init_waternet(jax.random.PRNGKey(5), 16, model)
    imgs = rng.random((8, 16, 16, 3)).astype(np.float32)
    want = np.asarray(wn.waternet_enhance(variables, jnp.asarray(imgs), model))

    got_dp = np.asarray(wn.enhance_sharded(variables, imgs, mesh, model))
    np.testing.assert_allclose(got_dp, want, atol=1e-5)

    # single big frame, rows sharded over the same axis (the 4K-frame path)
    frame = rng.random((1, 128, 32, 3)).astype(np.float32)
    want_f = np.asarray(wn.waternet_enhance(variables, jnp.asarray(frame),
                                            model))
    got_rows = np.asarray(wn.enhance_sharded(variables, frame, mesh, model,
                                             shard_rows=True))
    np.testing.assert_allclose(got_rows, want_f, atol=1e-5)
