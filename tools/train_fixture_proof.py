"""Trainer convergence proof on the procedural underwater fixture.

VERDICT r4 #8: `train-vgg` / `train-mlp` / `train-zoo` have per-step tests
but no committed multi-epoch convergence evidence.  This tool renders
paired (degraded, clean-albedo) fixture frames (the in-container stand-in
for UIEB raw/reference pairs, vgg_16_UIE.py:306-421), trains each
requested predictor for --epochs epochs through the SAME CLI entry points
a user runs, and copies the resulting training_history.json artifacts
into --out (committed under docs/train_fixture/), plus a summary table.

Run on the chip:
    python tools/train_fixture_proof.py --models mlp,vgg,zoo --epochs 30
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time
from pathlib import Path

import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="mlp,vgg,zoo")
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n", type=int, default=24, help="fixture pairs")
    ap.add_argument("--size", type=int, default=128, help="rendered size")
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--out", default="docs/train_fixture")
    args = ap.parse_args()

    from underwater_image_enhancement_tpu.cli import main as cli_main
    from underwater_image_enhancement_tpu.testing.underwater import (
        synth_underwater_pair_set,
    )
    from underwater_image_enhancement_tpu.utils import io as uio

    deg, clean, _names = synth_underwater_pair_set(
        seed=11, n=args.n, h=args.size, w=args.size)
    tmp = Path(tempfile.mkdtemp(prefix="uie_fixture_train_"))
    raw, ref = tmp / "raw", tmp / "ref"
    for i in range(args.n):
        uio.imwrite_unit(str(raw / f"f{i:03d}.png"), deg[i])
        uio.imwrite_unit(str(ref / f"f{i:03d}.png"), clean[i])

    cmds = {
        "mlp": ["train-mlp"],
        "vgg": ["train-vgg", "--pretrained-vgg", "none"],
        "zoo": ["train-zoo", "--model", "resnet", "--pretrained", "none"],
    }
    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)
    summary = {}
    for kind in args.models.split(","):
        run = tmp / f"run_{kind}"
        t0 = time.time()
        cli_main(cmds[kind] + [
            "--input", str(raw), "--reference", str(ref),
            "--output", str(run), "--epochs", str(args.epochs),
            "--batch-size", str(args.batch_size)])
        hist = json.loads((run / "training_history.json").read_text())
        shutil.copy(run / "training_history.json",
                    outdir / f"{kind}_history.json")
        tr, va = hist["train_loss"], hist["val_loss"]
        summary[kind] = {
            "epochs_run": len(tr),
            "train_loss_first": round(tr[0], 5),
            "train_loss_final": round(tr[-1], 5),
            "val_loss_first": round(va[0], 5),
            "val_loss_best": round(min(va), 5),
            "val_loss_final": round(va[-1], 5),
            "seconds": round(time.time() - t0, 1),
        }
        print(kind, json.dumps(summary[kind]))

    meta = {"n_pairs": args.n, "size": args.size, "epochs": args.epochs,
            "batch_size": args.batch_size, "fixture_seed": 11,
            "models": summary}
    (outdir / "summary.json").write_text(json.dumps(meta, indent=2))
    print(f"artifacts -> {outdir}")


if __name__ == "__main__":
    main()
