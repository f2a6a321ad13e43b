"""Real-TPU hardware gates, run in a subprocess.

The suite forces the CPU backend (tests/conftest.py), so Pallas kernels
normally run in interpret mode — which cannot catch Mosaic-specific
regressions (e.g. a compiler starting to FMA-contract the CLAHE bilinear
chain would shift exact .5 ties in cvRound; the in-kernel
optimization_barrier fix is unavailable because the primitive has no
Mosaic lowering, see ops/pallas_kernels.py:_cv_bilinear_f32).  This test
re-runs the bit-identity gates on the REAL chip via a subprocess with the
axon plugin; it skips cleanly when no TPU is attached (e.g. plain CI).
"""

import os
import subprocess
import sys

import pytest

_AXON_SITE = "/root/.axon_site"

_SCRIPT = r"""
import numpy as np
import jax
import jax.numpy as jnp

assert jax.devices()[0].platform != "cpu", "expected a real TPU device"

from underwater_image_enhancement_tpu.ops.histeq import (
    clahe_enhancement_planes, clahe_u8)

rng = np.random.default_rng(7)
# non-pow2 shapes -> non-dyadic f32 interpolation weights, the regime where
# FMA contraction can shift .5 ties (and where round-2 measured +-1 LSB
# drift on hardware for the XLA surrogate LAB path)
for shape, tiles in [((137, 211), (8, 8)), ((97, 260), (8, 8))]:
    x = jnp.asarray(rng.integers(0, 256, shape).astype(np.int32))
    a = np.asarray(clahe_u8(x, 2.0, tiles[0], tiles[1], impl="pallas"))
    b = np.asarray(clahe_u8(x, 2.0, tiles[0], tiles[1], impl="xla"))
    np.testing.assert_array_equal(a, b)

# fused CLAHE+inverse-LAB kernel == split path, on hardware: u8-identical;
# the float encodings may differ 1 ulp because the final /255 runs in a
# different program instance (XLA u8_to_unit vs in-kernel division)
img = (rng.integers(0, 256, (137, 211, 3)) / 255.0).astype(np.float32)
planes = tuple(jnp.asarray(img[..., c]) for c in range(3))
want = clahe_enhancement_planes(planes, 3.0, impl="split")
got = clahe_enhancement_planes(planes, 3.0, impl="fused")
for w, g in zip(want, got):
    assert np.abs(np.asarray(w) - np.asarray(g)).max() <= 1.3e-7

# arithmetic INV_GAMMA surrogate == XLA surrogate path (bit-exact gate for
# the in-kernel sqrt-chain lookup, ops/pallas_kernels.py probe notes)
from underwater_image_enhancement_tpu.ops import colorspace as cs
from underwater_image_enhancement_tpu.ops import pallas_kernels as pk

L = jnp.asarray(rng.integers(0, 256, (256, 384), np.int32))
a = jnp.asarray(rng.integers(0, 256, (256, 384), np.int32))
b = jnp.asarray(rng.integers(0, 256, (256, 384), np.int32))
got = pk.lab_inverse_planes(L, a, b)
want = cs.lab_to_rgb_u8_exact_planes(L, a, b, impl="xla")
for w, g in zip(want, got):
    np.testing.assert_array_equal(np.asarray(w), np.asarray(g))

# throughput-tier forward LAB: L bit-exact; a/b within +-1 LSB on a tiny
# fraction (the documented instance-instability envelope)
rp = jnp.asarray((rng.integers(0, 256, (256, 384)) / 255.0).astype(np.float32))
gp = jnp.asarray((rng.integers(0, 256, (256, 384)) / 255.0).astype(np.float32))
bp = jnp.asarray((rng.integers(0, 256, (256, 384)) / 255.0).astype(np.float32))
fL, fa, fb = (np.asarray(x) for x in pk.lab_forward_planes_unit_fast(rp, gp, bp))
eL, ea, eb = (np.asarray(x) for x in pk.lab_forward_planes_unit(rp, gp, bp))
np.testing.assert_array_equal(fL, eL)
for f, e in ((fa, ea), (fb, eb)):
    d = np.abs(f.astype(np.int64) - e.astype(np.int64))
    assert d.max() <= 1, d.max()
    assert (d > 0).mean() <= 1e-3, (d > 0).mean()

# six --fast tier approx forward LAB (2-step Newton, no corrections):
# every channel within +-1 u8 LSB of exact
aL, aa, ab_ = (np.asarray(x)
               for x in pk.lab_forward_planes_unit_approx(rp, gp, bp))
for f, e in ((aL, eL), (aa, ea), (ab_, eb)):
    d = np.abs(f.astype(np.int64) - e.astype(np.int64))
    assert d.max() <= 1, d.max()
print("TPU_HW_OK")
"""


_SIX_BATCH_SCRIPT = r"""
import numpy as np
import jax
import jax.numpy as jnp

assert jax.devices()[0].platform != "cpu", "expected a real TPU device"

from underwater_image_enhancement_tpu.pipeline.enhance import (
    six_strategy_single,
)

# Round 2 hit an axon worker 'kernel fault' when 4-6 strategy compositions
# were vmapped together; the round-3 kernels (custom_vmap row folds,
# arithmetic LAB surrogates) removed the trigger.  Gate: vmapped six at
# B=4 RUNS on hardware and is BIT-EQUAL to the single-image program
# (every kernel on the vmapped path carries a batch-folding custom_vmap
# rule, so the math is instance-identical).
rng = np.random.default_rng(0)
imgs = jnp.asarray(
    np.floor(rng.uniform(0.05, 0.95, (4, 256, 320, 3)) * 255)
    .astype(np.float32) / 255.0)
out_b, codes_b = jax.jit(
    jax.vmap(lambda im: six_strategy_single(im, fast=True)))(imgs)
out_b, codes_b = np.asarray(out_b), np.asarray(codes_b)
single = jax.jit(lambda im: six_strategy_single(im, fast=True))
for i in range(4):
    out_s, code_s = single(imgs[i])
    np.testing.assert_array_equal(np.asarray(out_s), out_b[i])
    assert int(code_s) == int(codes_b[i])
print("TPU_HW_OK")
"""


_PREFLIGHT = r"""
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != "cpu"
assert float(jnp.sum(jnp.ones((8, 128)) * 2.0)) == 2048.0
print("TPU_HW_OK")
"""

_hw_alive_cache: dict = {}


def _hw_env():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = f"{repo}:{_AXON_SITE}"
    return env


def _hw_alive() -> bool:
    """One cheap tunnel liveness probe per session: device enumeration can
    succeed while EXECUTION hangs after a remote worker crash, which would
    otherwise wedge each gate for its full 900 s subprocess timeout."""
    if "alive" not in _hw_alive_cache:
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _PREFLIGHT], env=_hw_env(),
                cwd="/tmp", capture_output=True, text=True, timeout=240,
            )
            _hw_alive_cache["alive"] = (proc.returncode == 0
                                        and "TPU_HW_OK" in proc.stdout)
        except subprocess.TimeoutExpired:
            _hw_alive_cache["alive"] = False
    return _hw_alive_cache["alive"]


def _run_on_hw(script: str):
    if not os.path.isdir(_AXON_SITE):
        pytest.skip("no axon TPU plugin on this machine")
    if not _hw_alive():
        pytest.skip("TPU tunnel unresponsive (worker down?) — hw gate "
                    "skipped, not failed")
    try:
        proc = subprocess.run(
            [sys.executable, "-c", script], env=_hw_env(), cwd="/tmp",
            capture_output=True, text=True, timeout=900,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("TPU hardware run exceeded 900 s (tunnel hung mid-run)")
    if proc.returncode != 0 and "Backend 'axon'" in proc.stderr:
        pytest.skip("axon TPU backend not reachable")
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "TPU_HW_OK" in proc.stdout


def test_clahe_tie_inputs_bit_identical_on_hw():
    _run_on_hw(_SCRIPT)


def test_six_vmapped_batch4_stable_and_bit_equal_on_hw():
    _run_on_hw(_SIX_BATCH_SCRIPT)
