"""Test harness configuration.

Tests run on the JAX CPU backend with 8 virtual devices so that multi-chip
sharding logic can be validated without TPU hardware (SURVEY.md §4: the
"fake backend" for shard/mesh logic).  Must be set before jax is imported.
"""

import os

# UIE_TEST_TPU=1 runs the suite on the real chip (slow: remote compiles);
# default is the CPU backend with 8 virtual devices.
_USE_TPU = os.environ.get("UIE_TEST_TPU") == "1"
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # override the env's axon TPU default
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags
        + " --xla_force_host_platform_device_count=8"
        + " --xla_backend_optimization_level=0"  # no FMA contraction: keeps
        # the fp32 op-by-op semantics the OpenCV-parity kernels specify
        # collectives: 8 virtual devices TIMESHARE this host's cores, so on
        # a big frame (the 4K spatial tests) the slowest "device" can reach
        # a psum long after the first — XLA:CPU's default 40 s rendezvous
        # abort kills the process mid-test without these
        + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        + " --xla_cpu_collective_call_terminate_timeout_seconds=1800"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The container's sitecustomize registers the axon TPU backend at interpreter
# startup (before conftest), so env vars alone don't stick — force the CPU
# platform and drop any already-initialized backends.
if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    from jax.extend.backend import clear_backends

    clear_backends()
    assert jax.devices()[0].platform == "cpu" and len(jax.devices()) == 8

# Persistent compilation cache: the suite is compile-dominated; repeated runs
# reuse compiled programs across processes.  The directory is keyed to this
# HOST's CPU feature set (+ jaxlib version): XLA:CPU cache entries are AOT
# machine code, and deserializing one compiled under a different feature set
# is exactly the "could lead to SIGILL" hazard cpu_aot_loader warns about —
# a shared /tmp dir can outlive the container host it was written on.
import hashlib  # noqa: E402

import jaxlib  # noqa: E402

try:
    _flags = next(line for line in open("/proc/cpuinfo")
                  if line.startswith("flags"))
except (OSError, StopIteration):  # pragma: no cover - non-Linux fallback
    _flags = ""
_host = hashlib.sha1(
    (_flags + jaxlib.__version__).encode()).hexdigest()[:10]
jax.config.update("jax_compilation_cache_dir", f"/tmp/uie_jax_cache_{_host}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def rgb_u8(rng):
    """Random uint8 RGB image."""
    return rng.integers(0, 256, (96, 128, 3), dtype=np.uint8)


@pytest.fixture(scope="session")
def img_unit(rgb_u8):
    """Random float32 RGB image in [0,1] on the uint8 grid."""
    return (rgb_u8.astype(np.float32) / 255.0).astype(np.float32)


@pytest.fixture(scope="session")
def underwater_img(rng):
    """Synthetic 'underwater-looking' image: blue-green cast, haze, gradients."""
    h, w = 120, 160
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [
            0.15 + 0.1 * np.sin(xx / 17.0) + 0.05 * (yy / h),
            0.45 + 0.2 * np.cos(yy / 23.0) + 0.1 * (xx / w),
            0.55 + 0.15 * np.sin((xx + yy) / 31.0),
        ],
        axis=-1,
    )
    noise = rng.normal(0, 0.03, (h, w, 3)).astype(np.float32)
    img = np.clip(base + noise, 0.0, 1.0).astype(np.float32)
    # quantize to the u8 grid like a decoded image
    return (np.floor(img * 255.0) / 255.0).astype(np.float32)


def psnr(a, b, peak=1.0):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return np.inf
    return 10.0 * np.log10(peak**2 / mse)
