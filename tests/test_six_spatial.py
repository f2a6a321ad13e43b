"""Spatially-sharded six-strategy pipeline vs the single-device program.

Run on the 8-virtual-device CPU mesh (conftest).  Gates:
- strategies without a dehaze chain (4, 5, 6) must match the single-device
  fast path almost exactly — their sharded percentile/CLAHE machinery is
  bit-equal by construction, leaving only pow()-codegen ulps;
- the dehaze strategies (1-3) include the psum'd-SAT airlight and the
  halo'd fast guided filter, whose f32 association differs in the last
  bits — gated at high PSNR.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from underwater_image_enhancement_tpu.parallel.mesh import make_mesh
from underwater_image_enhancement_tpu.parallel.six_spatial import (
    six_strategy_spatial)
from underwater_image_enhancement_tpu.pipeline.enhance import (
    SIX_ORDER, six_strategy_single)


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh()


def _psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return 99.0 if mse < 1e-12 else 10.0 * np.log10(1.0 / mse)


def test_six_spatial_matches_single_device(rng, mesh8):
    H, W = 128, 256  # 16 rows/shard (8-aligned), 16x32 CLAHE tiles
    img = jnp.asarray(
        np.floor(rng.random((H, W, 3)) * 0.9 * 255.0) / 255.0 + 0.05,
        jnp.float32)
    img = jnp.floor(jnp.clip(img, 0, 1) * 255.0) / 255.0

    got, code = six_strategy_spatial(img, mesh8)
    want, code_w = six_strategy_single(img, fast=True)
    assert int(code) == int(code_w)
    got = np.asarray(got)
    want = np.asarray(want)
    for k, name in enumerate(SIX_ORDER):
        p = _psnr(got[k], want[k])
        if name in ("clahe_enhancement", "white_balance", "histogram_eq"):
            # sharded percentiles/CLAHE are bit-equal; only pow codegen ulps
            np.testing.assert_allclose(got[k], want[k], rtol=0, atol=1e-5,
                                       err_msg=name)
        else:
            assert p > 55.0, f"{name}: PSNR {p:.1f} dB"


def test_six_spatial_shape_and_cast(rng, mesh8):
    H, W = 64, 128
    # strong green cast -> code 1, scaled channel
    img = np.stack([
        np.full((H, W), 0.2, np.float32),
        np.full((H, W), 0.6, np.float32),
        np.full((H, W), 0.25, np.float32),
    ], axis=-1)
    img += rng.random(img.shape).astype(np.float32) * 0.05
    out, code = six_strategy_spatial(jnp.asarray(np.clip(img, 0, 1)), mesh8)
    assert out.shape == (6, H, W, 3)
    assert int(code) == 1
    assert bool(jnp.isfinite(out).all())


def test_ancuti_fusion_spatial_matches_single(rng, mesh8):
    from underwater_image_enhancement_tpu.parallel.fusion_spatial import (
        ancuti_fusion_spatial)
    from underwater_image_enhancement_tpu.pipeline.fusion import ancuti_fusion

    H, W = 128, 192
    img = jnp.asarray(
        np.floor(rng.random((H, W, 3)) * 0.9 * 255.0) / 255.0, jnp.float32)
    got = np.asarray(ancuti_fusion_spatial(img, mesh8))
    want = np.asarray(ancuti_fusion(img))
    assert got.shape == want.shape == (H, W, 3)
    p = _psnr(got, want)
    # sharded CLAHE/blurs are bit-equal; the psum'd means in the gray-world
    # WB and saliency terms re-associate f32 sums
    assert p > 55.0, f"fusion spatial PSNR {p:.1f} dB"


def test_canny_sharded_bit_equal(rng, mesh8):
    """The halo'd Canny equals the single-device bounded propagation at
    EVERY row, including the global first/last rows (valid_rows zeroes the
    phantom halo gradients that used to flip border NMS)."""
    import jax
    from jax.sharding import PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from underwater_image_enhancement_tpu.ops.edges import canny_u8
    from underwater_image_enhancement_tpu.parallel.mesh import DATA_AXIS
    from underwater_image_enhancement_tpu.parallel.six_spatial import (
        _canny_sharded)

    gray = rng.integers(0, 256, (64, 128)).astype(np.int32)
    got = shard_map(
        lambda g: _canny_sharded(g, 16), mesh=mesh8,
        in_specs=P(DATA_AXIS, None), out_specs=P(DATA_AXIS, None),
        check_rep=False,
    )(jnp.asarray(gray))
    want = canny_u8(jnp.asarray(gray), 50, 150, hysteresis_iters=16,
                    use_pallas=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fusion_spatial_border_rows_exact(rng, mesh8):
    """The pyr_up border fix: bottom rows must sit at float noise, not the
    ~2e-3 a symmetric coarse reflect left them at."""
    from underwater_image_enhancement_tpu.parallel.fusion_spatial import (
        ancuti_fusion_spatial)
    from underwater_image_enhancement_tpu.pipeline.fusion import ancuti_fusion

    H, W = 64, 128
    img = jnp.asarray(
        np.floor(rng.random((H, W, 3)) * 0.9 * 255.0) / 255.0, jnp.float32)
    got = np.asarray(ancuti_fusion_spatial(img, mesh8))
    want = np.asarray(ancuti_fusion(img))
    err = np.abs(got - want)
    assert err[:2].max() < 1e-4 and err[-2:].max() < 1e-4, (
        err[:2].max(), err[-2:].max())
    assert err.max() < 1e-4, err.max()


def test_fusion_spatial_single_level(rng, mesh8):
    """min(H, W) < 32 -> one pyramid level: the blend degenerates to a
    weighted average (the single-device path handles this; the sharded one
    used to crash in reconstruct([]))."""
    from underwater_image_enhancement_tpu.parallel.fusion_spatial import (
        ancuti_fusion_spatial)
    from underwater_image_enhancement_tpu.pipeline.fusion import ancuti_fusion

    img = jnp.asarray(
        np.floor(rng.random((16, 1024, 3)) * 0.9 * 255.0) / 255.0,
        jnp.float32)
    got = np.asarray(ancuti_fusion_spatial(img, mesh8))
    want = np.asarray(ancuti_fusion(img))
    assert np.abs(got - want).max() < 1e-4


def test_six_spatial_misaligned_shard_rows(rng, mesh8):
    """H divisible by the mesh but NOT by the stride-8 percentile grid —
    the exact shape class a 2160-row 4K frame falls in (2160/8 = 270).
    No padding happens; the masked percentile selection and the strip
    guided filter keep parity with the single-device fast path
    (VERDICT r4 #4)."""
    H, W = 144, 128  # 18 rows/shard: 18 % 8 != 0, 18 % 4 != 0
    img = jnp.asarray(
        np.floor((rng.random((H, W, 3)) * 0.9 + 0.05) * 255.0) / 255.0,
        jnp.float32)
    got, code = six_strategy_spatial(img, mesh8)
    want, code_w = six_strategy_single(img, fast=True)
    assert int(code) == int(code_w)
    got, want = np.asarray(got), np.asarray(want)
    for k, name in enumerate(SIX_ORDER):
        if name in ("clahe_enhancement", "white_balance", "histogram_eq"):
            # masked percentiles + CLAHE stay bit-equal; only pow ulps
            np.testing.assert_allclose(got[k], want[k], rtol=0, atol=1e-5,
                                       err_msg=name)
        else:
            p = _psnr(got[k], want[k])
            assert p > 55.0, f"{name}: PSNR {p:.1f} dB"


def test_six_spatial_row_padded(rng, mesh8):
    """H not divisible by the mesh at all: REFLECT_101 pad-to-alignment +
    crop.  Global reductions mask the pad rows exactly; only the windowed
    ops see boundary approximation (>=50 dB gate, VERDICT r4 #4)."""
    H, W = 130, 128  # pads to 136 = cv2's own CLAHE pad target for H=130
    img = jnp.asarray(
        np.floor((rng.random((H, W, 3)) * 0.9 + 0.05) * 255.0) / 255.0,
        jnp.float32)
    got, code = six_strategy_spatial(img, mesh8)
    want, code_w = six_strategy_single(img, fast=True)
    assert int(code) == int(code_w)
    got, want = np.asarray(got), np.asarray(want)
    assert got.shape == want.shape == (6, H, W, 3)
    for k, name in enumerate(SIX_ORDER):
        p = _psnr(got[k], want[k])
        if name in ("clahe_enhancement", "white_balance", "histogram_eq"):
            # the lcm pad target equals cv2's internal CLAHE pad target
            # here, and all pre-CLAHE stages are pointwise: still bit-equal
            np.testing.assert_allclose(got[k], want[k], rtol=0, atol=1e-5,
                                       err_msg=name)
        else:
            assert p > 50.0, f"{name}: PSNR {p:.1f} dB"


def test_fusion_spatial_row_padded(rng, mesh8):
    """Fusion on heights that need pad-to-alignment (H % (2D) != 0).

    Two regimes: when the even-shard pad target (next multiple of
    lcm(2D, tiles)) coincides with cv2's own CLAHE tile pad target
    (tiles * ceil(H / tiles)) — e.g. H=122 -> 128 — the sharded CLAHE
    keeps the single-device tile geometry and the result sits at float
    noise.  When it overshoots — e.g. H=120 is already tile-divisible
    (th=15) but must pad to 128 (th=16) for even shards — the sharded
    fusion legitimately runs a one-row-coarser tile grid over the
    reflected frame: a valid fusion of the same image, gated loosely."""
    from underwater_image_enhancement_tpu.parallel.fusion_spatial import (
        ancuti_fusion_spatial)
    from underwater_image_enhancement_tpu.pipeline.fusion import ancuti_fusion

    for H, gate in ((122, 50.0), (120, 30.0)):
        img = jnp.asarray(
            np.floor(rng.random((H, 192, 3)) * 0.9 * 255.0) / 255.0,
            jnp.float32)
        got = np.asarray(ancuti_fusion_spatial(img, mesh8))
        want = np.asarray(ancuti_fusion(img))
        assert got.shape == want.shape == (H, 192, 3)
        p = _psnr(got, want)
        assert p > gate, f"H={H} padded fusion spatial PSNR {p:.1f} dB"
