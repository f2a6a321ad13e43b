"""Multi-device CLI paths produce byte-identical outputs to single-device.

VERDICT r4 #3: the user-facing commands (enhance / auto / build-dataset)
must actually ride the data mesh, not just the library helpers.  Every
program involved is per-image, so sharding the batch over the 8 virtual
CPU devices (conftest) must not change a single byte of any output.

Batch sizes here are >= the mesh size so the sharded path really runs
(run_data_parallel dispatches sub-mesh-size chunks plain); the odd-shape
frame exercises the shape grouping + trailing plain chunk.
"""

import numpy as np
import pytest

from underwater_image_enhancement_tpu.cli import main
from underwater_image_enhancement_tpu.utils import io as uio


@pytest.fixture()
def folder(tmp_path):
    """Nine same-shape frames (one full 8-shard batch + a plain remainder)
    plus one odd-shape frame (exercises the shape grouping)."""
    rng = np.random.default_rng(21)
    src = tmp_path / "in"
    for i in range(9):
        img = np.clip(rng.random((40, 48, 3)) * (0.3 + 0.05 * i), 0, 1)
        uio.imwrite_unit(str(src / f"a{i}.png"), img.astype(np.float32))
    odd = np.clip(rng.random((32, 56, 3)) * 0.6 + 0.2, 0, 1)
    uio.imwrite_unit(str(src / "odd.png"), odd.astype(np.float32))
    return src


def _read_all(d):
    return {p.name: p.read_bytes() for p in sorted(d.iterdir())
            if p.suffix == ".png"}


def test_cli_enhance_dp_matches_single_device(folder, tmp_path, capsys):
    one, eight = tmp_path / "d1", tmp_path / "d8"
    main(["enhance", "--input", str(folder), "--output", str(one),
          "--devices", "1", "--batch-size", "8"])
    main(["enhance", "--input", str(folder), "--output", str(eight),
          "--devices", "8", "--batch-size", "8"])
    a, b = _read_all(one), _read_all(eight)
    assert sorted(a) == sorted(b) and len(a) == 10
    for name in a:
        assert a[name] == b[name], f"{name} differs across device counts"


def test_cli_auto_dp_matches_single_device(folder, tmp_path, capsys):
    one, eight = tmp_path / "d1", tmp_path / "d8"
    main(["auto", "--input", str(folder), "--output", str(one),
          "--devices", "1", "--batch-size", "8"])
    main(["auto", "--input", str(folder), "--output", str(eight),
          "--devices", "8", "--batch-size", "8"])
    a, b = _read_all(one), _read_all(eight)
    # same winner strategy (filename encodes it) and same bytes
    assert sorted(a) == sorted(b) and len(a) == 10
    for name in a:
        assert a[name] == b[name]


def test_cli_build_dataset_dp_matches_single_device(folder, tmp_path, capsys):
    one, eight = tmp_path / "s1", tmp_path / "s8"
    main(["build-dataset", "--input", str(folder), "--output", str(one),
          "--devices", "1", "--batch-size", "8"])
    main(["build-dataset", "--input", str(folder), "--output", str(eight),
          "--devices", "8", "--batch-size", "8"])
    csv1 = (one / "reports" / "dataset_building.csv").read_text()
    csv8 = (eight / "reports" / "dataset_building.csv").read_text()
    assert csv1 == csv8
    a = _read_all(one / "strategy_results")
    b = _read_all(eight / "strategy_results")
    assert sorted(a) == sorted(b) and len(a) == 10
    for name in a:
        assert a[name] == b[name]


def test_run_data_parallel_pads_and_crops():
    """Library-level gate for the pad/crop helper: B=5 on a 4-device mesh
    pads to 8 and crops every output leaf back to 5; B=3 (< mesh) takes
    the plain path with the original shape."""
    import jax.numpy as jnp

    from underwater_image_enhancement_tpu.parallel.mesh import (
        default_mesh,
        run_data_parallel,
    )

    mesh = default_mesh(4)
    x = np.arange(5 * 4 * 4 * 3, dtype=np.float32).reshape(5, 4, 4, 3)

    seen = []

    def fn(b):
        seen.append(int(b.shape[0]))
        return jnp.mean(b, axis=(1, 2, 3)), b * 2.0

    means, doubled = run_data_parallel(fn, x, mesh)
    assert seen == [8]  # padded to the mesh multiple
    assert means.shape == (5,) and doubled.shape == x.shape
    np.testing.assert_allclose(np.asarray(means), x.mean(axis=(1, 2, 3)),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(doubled), x * 2.0)

    seen.clear()
    run_data_parallel(fn, x[:3], mesh)
    assert seen == [3]  # sub-mesh chunk dispatches plain
