#!/usr/bin/env python
"""Produce the zoo-backbone pretrained artifacts (one-time, online box).

The reference builds its alternative predictors on ImageNet-pretrained
torchvision backbones (model_architectures.py:13 resnet18, :80-86
efficientnet_b0/b3, :131 vit_b_16).  This build keeps TPU machines
air-gapped: convert each torch state_dict ONCE into a plain .npz whose
arrays keep their state_dict keys, then load on the TPU box with
``models.zoo.load_{resnet18,efficientnet,vit}_npz``.

  # from torchvision (needs network or a populated torch hub cache):
  python tools/fetch_zoo_npz.py resnet18 efficientnet_b0 vit_b_16

  # from an already-downloaded checkpoint file:
  python tools/fetch_zoo_npz.py resnet18 --torch-ckpt resnet18-f37072fd.pth

Official torchvision checkpoint URLs (for manual download):
  https://download.pytorch.org/models/resnet18-f37072fd.pth
  https://download.pytorch.org/models/efficientnet_b0_rwightman-7f5810bc.pth
  https://download.pytorch.org/models/efficientnet_b3_rwightman-b3899882.pth
  https://download.pytorch.org/models/vit_b_16-c867db91.pth
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

_TV_BUILDERS = {
    "resnet18": ("resnet18", "ResNet18_Weights"),
    "efficientnet_b0": ("efficientnet_b0", "EfficientNet_B0_Weights"),
    "efficientnet_b3": ("efficientnet_b3", "EfficientNet_B3_Weights"),
    "vit_b_16": ("vit_b_16", "ViT_B_16_Weights"),
}


def _state_dict(name: str, ckpt: str | None):
    import torch

    if ckpt is not None:
        return torch.load(ckpt, map_location="cpu")
    import torchvision.models as tvm

    builder, weights_enum = _TV_BUILDERS[name]
    weights = getattr(tvm, weights_enum).IMAGENET1K_V1
    return getattr(tvm, builder)(weights=weights).state_dict()


def main() -> int:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from underwater_image_enhancement_tpu.utils.weights import weights_dir

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("models", nargs="+", choices=sorted(_TV_BUILDERS))
    ap.add_argument("--torch-ckpt", default=None,
                    help="path to a downloaded state_dict .pth (only with a "
                         "single model argument)")
    ap.add_argument("--out-dir", default=None,
                    help="output dir (default: <weights_dir>)")
    args = ap.parse_args()
    if args.torch_ckpt and len(args.models) != 1:
        ap.error("--torch-ckpt requires exactly one model")

    import numpy as np

    out_dir = Path(args.out_dir) if args.out_dir else weights_dir()
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in args.models:
        state = _state_dict(name, args.torch_ckpt)
        arrays = {k: v.detach().cpu().numpy() for k, v in state.items()}
        out = out_dir / f"{name}.npz"
        np.savez(out, **arrays)
        print(f"wrote {len(arrays)} tensors -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
