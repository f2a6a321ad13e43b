"""Regression gates on the committed trainer-convergence artifacts.

tools/train_fixture_proof.py trains MLP/VGG/zoo predictors for ~30 epochs
on paired fixture frames ON THE CHIP and commits the loss curves under
docs/train_fixture/ (VERDICT r4 #8).  These tests re-validate the
committed artifacts so a regression in the trainers that breaks
convergence shows up as soon as the proof is regenerated.
"""

import json
from pathlib import Path

import pytest

ART = Path(__file__).resolve().parents[1] / "docs" / "train_fixture"


@pytest.mark.skipif(not (ART / "summary.json").exists(),
                    reason="run tools/train_fixture_proof.py on the chip")
def test_fixture_training_converged():
    meta = json.loads((ART / "summary.json").read_text())
    assert meta["epochs"] >= 20
    assert set(meta["models"]) >= {"mlp", "vgg", "zoo"}
    for kind, s in meta["models"].items():
        # training moved: best validation loss well below the first epoch's
        assert s["val_loss_best"] < s["val_loss_first"] * 0.8, (kind, s)
        hist = json.loads((ART / f"{kind}_history.json").read_text())
        assert len(hist["train_loss"]) == s["epochs_run"]
        assert hist["train_loss"][-1] < hist["train_loss"][0], kind
        assert all(v > 0 for v in hist["train_loss"])
