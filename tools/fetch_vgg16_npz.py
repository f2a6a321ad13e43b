#!/usr/bin/env python
"""Produce the ``vgg16.npz`` pretrained-trunk artifact (one-time, online box).

The reference downloads ImageNet VGG16 at construction time
(vgg_16_UIE.py:149 ``vgg16(pretrained=True)``); this build keeps TPU
machines air-gapped and instead converts the torch weights ONCE into a
plain .npz that ``models.vgg.load_backbone_npz`` / ``load_perceptual_npz``
consume and that trainers/predictors auto-discover via
``utils.weights.find_vgg16_npz()``.

Run on any machine with torch (and either torchvision or a downloaded
checkpoint), then copy the .npz next to the TPU job:

  # from torchvision (needs network or a populated torch hub cache):
  python tools/fetch_vgg16_npz.py

  # from an already-downloaded torchvision checkpoint file:
  python tools/fetch_vgg16_npz.py --torch-ckpt vgg16-397923af.pth

  # custom destination (otherwise $UIE_TPU_WEIGHTS or ~/.cache/uie_tpu):
  python tools/fetch_vgg16_npz.py --out /weights/vgg16.npz

The official torchvision checkpoint URL (for a manual download) is
https://download.pytorch.org/models/vgg16-397923af.pth
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path


def main() -> int:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from underwater_image_enhancement_tpu.models.vgg import (
        convert_torch_vgg_to_npz,
    )
    from underwater_image_enhancement_tpu.utils.weights import weights_dir

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--torch-ckpt", default=None,
                    help="path to a torchvision vgg16 state_dict checkpoint "
                         "(.pth); omitted -> fetch via torchvision")
    ap.add_argument("--out", default=None,
                    help="output .npz path (default: <weights_dir>/vgg16.npz)")
    args = ap.parse_args()

    out = Path(args.out) if args.out else weights_dir() / "vgg16.npz"
    out.parent.mkdir(parents=True, exist_ok=True)

    ckpt = args.torch_ckpt
    if ckpt is None:
        try:
            import torch
            from torchvision.models import VGG16_Weights, vgg16
        except ImportError as e:
            print(f"torchvision unavailable ({e}); pass --torch-ckpt with a "
                  "downloaded vgg16-397923af.pth instead", file=sys.stderr)
            return 1
        model = vgg16(weights=VGG16_Weights.IMAGENET1K_V1)
        with tempfile.NamedTemporaryFile(suffix=".pth") as tmp:
            torch.save(model.features.state_dict(), tmp.name)
            n = convert_torch_vgg_to_npz(tmp.name, str(out))
    else:
        n = convert_torch_vgg_to_npz(ckpt, str(out))

    print(f"wrote {n} conv layers -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
