"""CLI end-to-end tests on synthetic folders (in-process main())."""

import numpy as np
import pytest

from underwater_image_enhancement_tpu.cli import main
from underwater_image_enhancement_tpu.utils import io as uio


@pytest.fixture()
def img_folder(tmp_path):
    rng = np.random.default_rng(3)
    src = tmp_path / "in"
    for i in range(2):
        img = np.clip(rng.random((40, 48, 3)) * 0.7 + 0.1, 0, 1).astype(np.float32)
        uio.imwrite_unit(str(src / f"p{i}.png"), img)
    return src


def test_cli_enhance_fixed_params(img_folder, tmp_path, capsys):
    out = tmp_path / "out"
    main(["enhance", "--input", str(img_folder), "--output", str(out)])
    assert sorted(p.name for p in out.iterdir()) == [
        "p0_enhanced.png", "p1_enhanced.png"]


def test_cli_six(img_folder, tmp_path, capsys):
    out = tmp_path / "six"
    main(["six", "--input", str(img_folder), "--output", str(out)])
    files = sorted(p.name for p in out.iterdir())
    assert "processing_log.csv" in files
    assert len([f for f in files if f.endswith(".png")]) == 12  # 2 imgs x 6
    log = (out / "processing_log.csv").read_text()
    assert "image_type" in log and "strategy" in log


def test_cli_auto(img_folder, tmp_path, capsys):
    out = tmp_path / "auto"
    main(["auto", "--input", str(img_folder), "--output", str(out)])
    assert len(list(out.iterdir())) == 2


def test_cli_assess(img_folder, capsys):
    main(["assess", "--input", str(img_folder)])
    text = capsys.readouterr().out
    assert "uiqm" in text and "p0.png" in text


def test_cli_build_dataset_and_selector(img_folder, tmp_path, capsys):
    out = tmp_path / "sys"
    # add a few more images so the classifier has data
    rng = np.random.default_rng(9)
    for i in range(4):
        img = np.clip(rng.random((40, 48, 3)) * (0.2 + 0.2 * i), 0, 1)
        uio.imwrite_unit(str(img_folder / f"x{i}.png"), img.astype(np.float32))
    main(["build-dataset", "--input", str(img_folder), "--output", str(out)])
    assert (out / "reports" / "dataset_building.csv").exists()
    main(["train-selector", "--output", str(out)])
    assert (out / "trained_models" / "trained_model.pkl").exists()
    text = capsys.readouterr().out
    assert "labeled 6 images" in text


def test_cli_six_mixed_sizes_and_batching(tmp_path, rng):
    """Same-shape groups batch together; mixed shapes still all process."""
    src = tmp_path / "mixed"
    for i in range(3):
        uio.imwrite_unit(str(src / f"a{i}.png"),
                         rng.random((32, 40, 3)).astype(np.float32))
    uio.imwrite_unit(str(src / "b0.png"),
                     rng.random((48, 40, 3)).astype(np.float32))
    out = tmp_path / "o"
    main(["six", "--input", str(src), "--output", str(out), "--fast",
          "--batch-size", "2"])
    pngs = [f for f in out.iterdir() if f.suffix == ".png"]
    assert len(pngs) == 4 * 6
