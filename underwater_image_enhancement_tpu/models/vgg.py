"""VGG16-backbone parameter predictor (Flax).

Reproduces ImprovedVGGParameterNet (vgg_16_UIE.py:135-250):

- VGG16 features up to conv4_3 (torchvision ``features[:23]``: conv blocks
  1-3 complete + conv4_1..conv4_3, three 2x2 maxpools).
- "Dual pooling": the reference declares avg+max pooling but instantiates
  BOTH as AdaptiveAvgPool2d (:157-158) — reproduced: two identical global
  average pools concatenated.
- Optional 79-dim feature concat -> fusion MLP with BatchNorm+Dropout
  (:164-174) -> sigmoid attention gate (:177-181) -> 4 sigmoid-ranged heads
  with ranges omega [0.3,0.9], gamma [1,1.5], L_low [2,15], L_high [60,95]
  (:193-198).

Pretrained ImageNet weights cannot be downloaded in this environment; use
``load_torch_vgg_features`` to map a torchvision ``vgg16().features``
state_dict (NCHW conv weights -> HWIO) when one is available on disk.
Freezing of the first 16 conv parameter tensors (:152-154) is handled by the
trainer's optax mask (train/trainer.py), not inside the module.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

# torchvision vgg16.features[:23] conv channel plan; 'M' = 2x2 maxpool
VGG_PLAN = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512)

# ImageNet statistics the VGG backbone input is normalized with — the
# canonical preprocessing for both training (train/trainer.VGGTrainer) and
# inference (models/predictor.EnhancementPredictor).  The reference applies
# them only at inference (use_trained_model.py:34-46); its training dataset
# declares but never uses them (vgg_16_UIE.py:327-330 is dead code) — see
# docs/PARITY.md "Known divergences".
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

PARAM_RANGES = {
    "omega": (0.3, 0.9),
    "gamma": (1.0, 1.5),
    "L_low": (2.0, 15.0),
    "L_high": (60.0, 95.0),
}


class VGGFeatures(nn.Module):
    """VGG16 conv stack (NHWC).  depth = number of conv layers:
    depth=10 -> conv4_3 (torchvision features[:23]);
    depth=7  -> relu3_3 (features[:16], the perceptual-loss trunk).

    dtype: compute dtype (params stay float32) — ``jnp.bfloat16`` is the
    TPU analog of the reference's AMP autocast (vgg_16_UIE.py:504) and
    keeps the convs on the MXU's native input width."""

    depth: int = 10
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv_i = 0
        x = x.astype(self.dtype)
        for item in VGG_PLAN:
            if conv_i >= self.depth:
                break
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            x = nn.Conv(item, (3, 3), padding=1, dtype=self.dtype,
                        name=f"conv{conv_i}")(x)
            x = nn.relu(x)
            conv_i += 1
        return x


class ImprovedVGGParameterNet(nn.Module):
    hidden_dim: int = 256
    use_features: bool = True
    dtype: object = jnp.float32  # compute dtype; params stay float32

    @nn.compact
    def __call__(self, img, feats: Optional[jnp.ndarray] = None, *,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        B = img.shape[0]
        v = VGGFeatures(depth=10, dtype=self.dtype, name="vgg")(img)
        avg_feat = jnp.mean(v, axis=(1, 2))
        max_feat = jnp.mean(v, axis=(1, 2))  # reference bug reproduced (:158)
        x = jnp.concatenate([avg_feat, max_feat], axis=1)
        if self.use_features and feats is not None:
            x = jnp.concatenate([x, feats.astype(x.dtype)], axis=1)

        h2 = self.hidden_dim * 2
        x = nn.Dense(h2, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.4, deterministic=not train)(x)
        x = nn.Dense(self.hidden_dim, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(0.3, deterministic=not train)(x)

        att = nn.Dense(self.hidden_dim // 4, dtype=self.dtype)(x)
        att = nn.relu(att)
        att = nn.sigmoid(nn.Dense(self.hidden_dim, dtype=self.dtype)(att))
        x = x * att

        params = {}
        for name, (lo, hi) in PARAM_RANGES.items():
            h = nn.Dense(self.hidden_dim // 2, dtype=self.dtype,
                         name=f"head_{name}_0")(x)
            h = nn.relu(h)
            h = nn.Dropout(0.2, deterministic=not train)(h)
            raw = nn.Dense(1, dtype=self.dtype, name=f"head_{name}_1")(h)
            # heads resolve in f32: the sigmoid ranges span ~1e1 and bf16's
            # ~3 decimal digits would quantize the predicted parameters
            params[name] = (nn.sigmoid(raw.astype(jnp.float32))
                            * (hi - lo) + lo)
        return params


# torchvision vgg16 ``features`` module indices of the conv layers
TORCH_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21)


def load_torch_vgg_features(flax_params: dict, torch_state: dict,
                            prefix: str = "vgg", depth: int = 10) -> dict:
    """Copy torchvision vgg16 ``features`` weights into VGGFeatures params.

    torch_state keys: '0.weight', '0.bias', '2.weight', ... (conv layer
    indices in features[:23]); conv weight OIHW -> HWIO.  depth=10 fills the
    conv4_3 backbone trunk, depth=7 the relu3_3 perceptual-loss trunk."""
    out = dict(flax_params)
    tree = out[prefix] if prefix in out else out
    for i, ti in enumerate(TORCH_CONV_IDX[:depth]):
        w = np.asarray(torch_state[f"{ti}.weight"])  # (O, I, H, W)
        b = np.asarray(torch_state[f"{ti}.bias"])
        tree[f"conv{i}"]["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
        tree[f"conv{i}"]["bias"] = jnp.asarray(b)
    return out


def convert_torch_vgg_to_npz(torch_ckpt_path: str, npz_path: str) -> int:
    """Offline conversion: a torch checkpoint holding torchvision vgg16
    weights -> a plain .npz keyed like ``features``'s state_dict.

    Accepts either a ``features``-only state_dict ('0.weight', ...) or a full
    vgg16 state_dict ('features.0.weight', ...).  Returns the number of conv
    layers exported.  This replaces the reference's on-line torchvision
    download (vgg_16_UIE.py:149: ``vgg16(pretrained=True)``) with an
    explicit, air-gapped artifact."""
    import torch

    state = torch.load(torch_ckpt_path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    flat = {}
    for k, v in state.items():
        k = k[len("features."):] if k.startswith("features.") else k
        flat[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    keep = {}
    for ti in TORCH_CONV_IDX:
        keep[f"{ti}.weight"] = flat[f"{ti}.weight"]
        keep[f"{ti}.bias"] = flat[f"{ti}.bias"]
    np.savez(npz_path, **keep)
    return len(TORCH_CONV_IDX)


def load_perceptual_npz(npz_path: str) -> dict:
    """Build VGGFeatures(depth=7) variables (the relu3_3 perceptual trunk,
    vgg_16_UIE.py:257-269) from a converted vgg16 .npz."""
    import jax

    state = dict(np.load(npz_path))
    model = VGGFeatures(depth=7)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    new = load_torch_vgg_features(dict(params["params"]), state,
                                  prefix="", depth=7)
    return {"params": new}


def load_backbone_npz(flax_params: dict, npz_path: str) -> dict:
    """Fill the ImprovedVGGParameterNet 'vgg' trunk (depth 10, conv4_3)
    from a converted vgg16 .npz (vgg_16_UIE.py:149-154)."""
    state = dict(np.load(npz_path))
    return load_torch_vgg_features(dict(flax_params), state,
                                   prefix="vgg", depth=10)
