"""`cli validate` parity harness on the procedural underwater fixture.

VERDICT r4 #5: one command over a folder produces the PARITY.md tables as
JSON/markdown — when the real UIEB set lands, running it is a one-liner.
"""

import json

import numpy as np
import pytest

from underwater_image_enhancement_tpu.cli import main
from underwater_image_enhancement_tpu.testing.underwater import (
    synth_underwater_set,
)
from underwater_image_enhancement_tpu.utils import io as uio


@pytest.fixture(scope="module")
def uw_folder(tmp_path_factory):
    src = tmp_path_factory.mktemp("uw")
    frames, names = synth_underwater_set(seed=3, n=6, h=64, w=96)
    for i, (f, t) in enumerate(zip(frames, names)):
        uio.imwrite_unit(str(src / f"{t}_{i}.png"), np.asarray(f))
    return src


def test_cli_validate_fixture_report(uw_folder, tmp_path, capsys):
    out = tmp_path / "val"
    main(["validate", "--input", str(uw_folder), "--output", str(out),
          "--oracle-samples", "2", "--batch-size", "3"])
    report = json.loads((out / "validation_report.json").read_text())
    md = (out / "validation_report.md").read_text()

    assert report["n_images"] == 6
    # every strategy parity row present and above the PARITY.md floor
    assert len(report["oracle_psnr"]["config"]) == 5
    assert len(report["oracle_psnr"]["six"]) == 6
    for flavor in ("config", "six"):
        for name, v in report["oracle_psnr"][flavor].items():
            assert v["psnr_db_min"] > 45.0, (flavor, name, v)
    # enhancement improves UIQM on the (mostly degraded) fixture set
    q = report["quality"]
    assert q["uiqm_enhanced_mean"] > q["uiqm_raw_mean"]
    assert np.isfinite(q["uciqe_enhanced_mean"])
    # winner distribution covers all images
    assert sum(v["count"]
               for v in report["winner_distribution"].values()) == 6
    assert "Strategy parity" in md and "UIQM" in md
