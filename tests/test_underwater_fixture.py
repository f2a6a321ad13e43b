"""Real-imagery proxy validation on the procedural underwater fixture.

The reference evaluates on UIEB (config.py:13), absent here; every other
parity gate runs on random frames.  These tests exercise the full system on
seeded Koschmieder-rendered underwater scenes (testing/underwater.py):
cast detection sees the intended green/blue/normal classes, UIQM/UCIQE are
finite and ordered sensibly, the six-strategy pipeline tallies casts, and
the complete Phase1 -> Phase2 -> predict CLI flow trains and predicts.
The observed winner distribution is recorded in docs/PARITY.md
("Real-imagery proxy validation").
"""

import numpy as np
import jax.numpy as jnp
import pytest

from underwater_image_enhancement_tpu.cli import main
from underwater_image_enhancement_tpu.testing.underwater import (
    WATER_TYPES,
    synth_underwater_set,
)
from underwater_image_enhancement_tpu.utils import io as uio


@pytest.fixture(scope="module")
def uw_set():
    return synth_underwater_set(seed=0, n=9, h=96, w=128)


def test_cast_detection_matches_water_type(uw_set):
    """Each rendered water type lands in the reference's matching cast
    class (six_stadigy.py:292-302 mean-RGB heuristic) — the fixture is
    colorimetrically underwater-like, not just noise."""
    from underwater_image_enhancement_tpu.pipeline.cast import (
        CAST_NAMES,
        detect_cast,
    )

    frames, names = uw_set
    codes = np.asarray(detect_cast(jnp.asarray(frames)))
    expect = {"blue": "bluish", "green": "greenish", "clear": "normal"}
    got = [CAST_NAMES[int(c)] for c in codes]
    assert got == [expect[t] for t in names]


def test_uiqm_uciqe_on_underwater_frames(uw_set):
    """UIQM/UCIQE are finite on the fixture, and enhancement IMPROVES the
    mean UIQM of the degraded (blue/green) frames — the direction the
    metric was designed to measure."""
    from underwater_image_enhancement_tpu.metrics.uiqm import uciqe, uiqm
    from underwater_image_enhancement_tpu.pipeline.enhance import (
        auto_enhance_batch,
    )

    frames, names = uw_set
    degraded = jnp.asarray(frames[[i for i, t in enumerate(names)
                                   if t != "clear"]])
    raw_uiqm = np.array([float(uiqm(f)) for f in degraded])
    raw_uciqe = np.array([float(uciqe(f)) for f in degraded])
    assert np.isfinite(raw_uiqm).all() and np.isfinite(raw_uciqe).all()

    best_imgs, _, _ = auto_enhance_batch(degraded)
    enh_uiqm = np.array([float(uiqm(f)) for f in best_imgs])
    assert np.isfinite(enh_uiqm).all()
    assert enh_uiqm.mean() > raw_uiqm.mean(), (raw_uiqm, enh_uiqm)


def test_six_pipeline_tallies_casts(uw_set, tmp_path, capsys):
    """`cli six` on the fixture: all 6 outputs per frame and a cast tally
    covering all three classes (six_stadigy.py:376-384 counters)."""
    frames, names = uw_set
    src = tmp_path / "uw"
    for i, (f, t) in enumerate(zip(frames[:6], names[:6])):
        uio.imwrite_unit(str(src / f"{t}{i}.png"), f)
    out = tmp_path / "six"
    main(["six", "--input", str(src), "--output", str(out), "--fast"])
    text = capsys.readouterr().out
    assert "bluish 2" in text and "greenish 2" in text and "normal 2" in text
    pngs = [p for p in out.iterdir() if p.suffix == ".png"]
    assert len(pngs) == 6 * 6


def test_full_selfsupervised_flow_on_underwater(uw_set, tmp_path, capsys):
    """Phase 1 (label) -> Phase 2 (classifier) -> predict, end-to-end on the
    fixture via the CLI (main.py:436-456 + :398-434)."""
    frames, names = uw_set
    src = tmp_path / "uw"
    paths = []
    for i, (f, t) in enumerate(zip(frames, names)):
        p = src / f"{t}{i}.png"
        uio.imwrite_unit(str(p), f)
        paths.append(p)
    out = tmp_path / "sys"
    main(["run", "--input", str(src), "--output", str(out), "--fast"])
    text = capsys.readouterr().out
    assert f"labeled {len(frames)} images" in text
    csv_path = out / "reports" / "dataset_building.csv"
    assert csv_path.exists()
    rows = csv_path.read_text().strip().splitlines()
    assert len(rows) == len(frames) + 1
    model = out / "trained_models" / "trained_model.pkl"
    assert model.exists()

    main(["predict", "--input", str(paths[0]), "--model", str(model)])
    text = capsys.readouterr().out
    assert "best strategy:" in text


def test_fixture_is_seeded_and_on_u8_grid():
    a, _ = synth_underwater_set(seed=5, n=2, h=32, w=40)
    b, _ = synth_underwater_set(seed=5, n=2, h=32, w=40)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, np.floor(a * 255.0) / 255.0)
    assert set(WATER_TYPES) == {"blue", "green", "clear"}
