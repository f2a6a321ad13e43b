"""Real 4K (2160x3840) frames through the spatial-sharding showcase paths.

VERDICT r4 #4's done-bar: `six_strategy_spatial` and
`ancuti_fusion_spatial` must RUN a standard 4K frame on the 8-device CPU
mesh — 2160/8 = 270 rows/shard, which is exactly the divisible-but-
stride-misaligned shape class the masked percentile selection and the
strip guided filter exist for.  Output correctness on these code paths is
gated against the single-device program at small sizes in
test_six_spatial.py; here the assertion is the full-size program
compiling, executing (no collective-rendezvous aborts, no divisibility
asserts), and producing finite in-range frames.

These are the suite's heaviest tests (a 4K frame x 6 strategies on CPU);
they live in their own file so an xdist worker picks them up early while
other workers run the rest.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from underwater_image_enhancement_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def frame_4k(rng):
    return jnp.asarray(
        np.floor(rng.random((2160, 3840, 3), dtype=np.float32) * 0.9
                 * 255.0) / 255.0)


def test_six_spatial_4k(rng, frame_4k):
    from underwater_image_enhancement_tpu.parallel.six_spatial import (
        six_strategy_spatial,
    )

    outs, code = six_strategy_spatial(frame_4k, make_mesh())
    outs = jax.block_until_ready(outs)
    assert outs.shape == (6, 2160, 3840, 3)
    assert int(code) in (0, 1, 2)
    # spot-check finiteness/range on a stride sample (full-frame reduction
    # of 6 x 4K frames is another multi-minute pass on CPU)
    sample = np.asarray(outs[:, ::64, ::64])
    assert np.isfinite(sample).all()
    assert sample.min() >= 0.0 and sample.max() <= 1.0


def test_fusion_spatial_4k(rng, frame_4k):
    from underwater_image_enhancement_tpu.parallel.fusion_spatial import (
        ancuti_fusion_spatial,
    )

    out = jax.block_until_ready(ancuti_fusion_spatial(frame_4k, make_mesh()))
    assert out.shape == (2160, 3840, 3)
    sample = np.asarray(out[::64, ::64])
    assert np.isfinite(sample).all()
    assert sample.min() >= 0.0 and sample.max() <= 1.0
