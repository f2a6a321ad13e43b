"""Alternative parameter-predictor backbones (Flax).

Reproduces model_architectures.py's surface: ResNet18-based
(CNNParameterPredictor, :11-68), EfficientNet-style
(EfficientNetParameterPredictor, :71-125) and ViT-based
(ViTParameterPredictor, :128-181) predictors, each with the same 6 heads:

  omega [0.3,0.7], gamma [1,1.5], L_low [5,20], L_high [85,98],
  guided_radius [10,25], use_gamma [0,1]   (:61-66)

plus the ``create_model`` factory (:188-227 — whose broken 'mlp' import of
``dl_parameter_optimizer`` is fixed here to models.mlp, SURVEY.md §0 known
bugs).  Backbones are idiomatic Flax re-implementations at torchvision's
architecture scale; ImageNet pretraining is unavailable offline (weights can
be loaded from disk via the trainers' checkpoint path).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

SIX_PARAM_RANGES = {
    "omega": (0.3, 0.7),
    "gamma": (1.0, 1.5),
    "L_low": (5.0, 20.0),
    "L_high": (85.0, 98.0),
    "guided_radius": (10.0, 25.0),
    "use_gamma": (0.0, 1.0),
}


def _param_heads(x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    out = {}
    for name, (lo, hi) in SIX_PARAM_RANGES.items():
        raw = nn.Dense(1, name=f"head_{name}")(x)
        out[name] = nn.sigmoid(raw) * (hi - lo) + lo
    return out


def _shared_mlp(x: jnp.ndarray, train: bool) -> jnp.ndarray:
    """model_architectures.py:29-35 / :93-101: 256 -> 128 with dropout."""
    x = nn.Dense(256)(x)
    x = nn.relu(x)
    x = nn.Dropout(0.3, deterministic=not train)(x)
    x = nn.Dense(128)(x)
    return nn.relu(x)


class ResNetBlock(nn.Module):
    filters: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        residual = x
        y = nn.Conv(self.filters, (3, 3), strides=self.strides, padding=1,
                    use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train)(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.filters, (1, 1), strides=self.strides,
                               use_bias=False)(x)
            residual = nn.BatchNorm(use_running_average=not train)(residual)
        return nn.relu(y + residual)


class CNNParameterPredictor(nn.Module):
    """ResNet18-scale image predictor (model_architectures.py:11-68)."""

    @nn.compact
    def __call__(self, img, *, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False)(img)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for filters, strides in [(64, 1), (64, 1), (128, 2), (128, 1),
                                 (256, 2), (256, 1), (512, 2), (512, 1)]:
            x = ResNetBlock(filters, strides)(x, train=train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool -> 512
        x = _shared_mlp(x, train)
        return _param_heads(x)


class MBConv(nn.Module):
    filters: int
    expand: int = 4
    strides: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inp = x.shape[-1]
        h = nn.Conv(inp * self.expand, (1, 1), use_bias=False)(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.swish(h)
        h = nn.Conv(inp * self.expand, (3, 3), strides=self.strides, padding=1,
                    feature_group_count=inp * self.expand, use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.swish(h)
        h = nn.Conv(self.filters, (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        if self.strides == 1 and inp == self.filters:
            h = h + x
        return h


class EfficientNetParameterPredictor(nn.Module):
    """EfficientNet-B0-scale predictor (model_architectures.py:71-125)."""

    @nn.compact
    def __call__(self, img, *, train: bool = False) -> Dict[str, jnp.ndarray]:
        x = nn.Conv(32, (3, 3), strides=2, padding=1, use_bias=False)(img)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.swish(x)
        for filters, strides in [(16, 1), (24, 2), (40, 2), (80, 2),
                                 (112, 1), (192, 2), (320, 1)]:
            x = MBConv(filters, strides=strides)(x, train=train)
        x = nn.Conv(1280, (1, 1), use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.swish(x)
        x = jnp.mean(x, axis=(1, 2))
        x = _shared_mlp(x, train)
        return _param_heads(x)


class ViTParameterPredictor(nn.Module):
    """ViT-B/16-scale predictor (model_architectures.py:128-181)."""

    patch: int = 16
    dim: int = 768
    depth: int = 12
    heads: int = 12

    @nn.compact
    def __call__(self, img, *, train: bool = False) -> Dict[str, jnp.ndarray]:
        B, H, W, _ = img.shape
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch))(img)
        x = x.reshape(B, -1, self.dim)
        cls = self.param("cls", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.tile(cls, (B, 1, 1)), x], axis=1)
        pos = self.param("pos", nn.initializers.normal(0.02),
                         (1, x.shape[1], self.dim))
        x = x + pos
        for _ in range(self.depth):
            y = nn.LayerNorm()(x)
            y = nn.MultiHeadDotProductAttention(num_heads=self.heads)(y, y)
            x = x + y
            y = nn.LayerNorm()(x)
            y = nn.Dense(self.dim * 4)(y)
            y = nn.gelu(y)
            y = nn.Dense(self.dim)(y)
            x = x + y
        x = nn.LayerNorm()(x)[:, 0]  # CLS token
        x = _shared_mlp(x, train)
        return _param_heads(x)


def _bn_from_torch(params_bn, stats_bn, state, key):
    import numpy as np

    params_bn["scale"] = jnp.asarray(np.asarray(state[f"{key}.weight"]))
    params_bn["bias"] = jnp.asarray(np.asarray(state[f"{key}.bias"]))
    stats_bn["mean"] = jnp.asarray(np.asarray(state[f"{key}.running_mean"]))
    stats_bn["var"] = jnp.asarray(np.asarray(state[f"{key}.running_var"]))


def _conv_from_torch(params_conv, state, key):
    import numpy as np

    w = np.asarray(state[f"{key}.weight"])  # (O, I, H, W)
    params_conv["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))


def load_torch_resnet18(variables: Dict[str, Any],
                        torch_state: Dict[str, Any]) -> Dict[str, Any]:
    """Fill CNNParameterPredictor's backbone from a torchvision resnet18
    state_dict (model_architectures.py:13 ``resnet18(pretrained=...)``; the
    reference drops ``fc`` for its own MLP+heads, :26-35, which stay as
    initialized here).

    torch_state keys: ``conv1.weight``, ``bn1.*``, ``layer{1-4}.{0,1}.*``
    (tensors or numpy arrays).  Conv weights transpose OIHW -> HWIO; BN
    weight/bias -> scale/bias params and running stats -> batch_stats.
    Returns new ``{"params", "batch_stats"}`` variables."""
    state = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
             for k, v in torch_state.items()}
    # tree.map rebuilds every container, so in-place fills below cannot
    # alias the caller's variables
    params = jax.tree.map(lambda x: x, dict(variables["params"]))
    stats = jax.tree.map(lambda x: x, dict(variables.get("batch_stats", {})))

    _conv_from_torch(params["Conv_0"], state, "conv1")
    _bn_from_torch(params["BatchNorm_0"], stats["BatchNorm_0"], state, "bn1")
    for layer in range(1, 5):
        for block in range(2):
            i = (layer - 1) * 2 + block
            pb = params[f"ResNetBlock_{i}"]
            sb = stats[f"ResNetBlock_{i}"]
            t = f"layer{layer}.{block}"
            _conv_from_torch(pb["Conv_0"], state, f"{t}.conv1")
            _bn_from_torch(pb["BatchNorm_0"], sb["BatchNorm_0"], state,
                           f"{t}.bn1")
            _conv_from_torch(pb["Conv_1"], state, f"{t}.conv2")
            _bn_from_torch(pb["BatchNorm_1"], sb["BatchNorm_1"], state,
                           f"{t}.bn2")
            if f"{t}.downsample.0.weight" in state:
                _conv_from_torch(pb["Conv_2"], state, f"{t}.downsample.0")
                _bn_from_torch(pb["BatchNorm_2"], sb["BatchNorm_2"], state,
                               f"{t}.downsample.1")
    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = stats
    return out


def load_resnet18_npz(variables: Dict[str, Any], npz_path: str
                      ) -> Dict[str, Any]:
    """load_torch_resnet18 from an offline-converted .npz artifact
    (``tools/fetch_vgg16_npz.py``'s resnet sibling: save the torch
    state_dict arrays under their state_dict keys)."""
    import numpy as np

    return load_torch_resnet18(variables, dict(np.load(npz_path)))


def create_model(model_type: str = "mlp", **kwargs) -> Any:
    """model_architectures.py:188-227 factory (with the 'mlp' import fixed)."""
    if model_type == "mlp":
        from underwater_image_enhancement_tpu.models.mlp import ParameterPredictor

        return ParameterPredictor(feature_dim=79, **kwargs)
    if model_type == "resnet":
        return CNNParameterPredictor(**kwargs)
    if model_type == "efficientnet":
        return EfficientNetParameterPredictor(**kwargs)
    if model_type == "vit":
        return ViTParameterPredictor(**kwargs)
    if model_type == "vgg":
        from underwater_image_enhancement_tpu.models.vgg import ImprovedVGGParameterNet

        return ImprovedVGGParameterNet(**kwargs)
    raise ValueError(f"unknown model type: {model_type}")
