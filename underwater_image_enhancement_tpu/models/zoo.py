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


def _make_divisible(v: float, divisor: int = 8) -> int:
    """torchvision._make_divisible channel rounding (min_value=divisor)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# EfficientNet-B0 base stages: (expand, kernel, stride, out_channels,
# repeats) — torchvision.models.efficientnet._efficientnet_conf; b3 scales
# these with (width_mult, depth_mult) = (1.2, 1.4)
_EFFNET_STAGES = (
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
)
_EFFNET_MULTS = {"b0": (1.0, 1.0), "b3": (1.2, 1.4)}


class MBConv(nn.Module):
    """torchvision MBConv: expand 1x1 (skipped at expand=1) -> depthwise ->
    squeeze-excitation (squeeze = max(1, in//4), on the EXPANDED maps) ->
    project 1x1, residual when stride 1 and in == out (stochastic depth is
    identity in eval, which is how the reference consumes the backbone)."""
    filters: int
    expand: int = 6
    kernel: int = 3
    strides: int = 1

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        inp = x.shape[-1]
        exp = inp * self.expand
        h = x
        if self.expand != 1:
            h = nn.Conv(exp, (1, 1), use_bias=False)(h)
            h = nn.BatchNorm(use_running_average=not train)(h)
            h = nn.swish(h)
        h = nn.Conv(exp, (self.kernel, self.kernel), strides=self.strides,
                    padding=self.kernel // 2, feature_group_count=exp,
                    use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.swish(h)
        # squeeze-excitation (fc1/fc2 are 1x1 convs with bias)
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = nn.Conv(max(1, inp // 4), (1, 1))(s)
        s = nn.swish(s)
        s = nn.Conv(exp, (1, 1))(s)
        h = h * jax.nn.sigmoid(s)
        h = nn.Conv(self.filters, (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        if self.strides == 1 and inp == self.filters:
            h = h + x
        return h


def _effnet_blocks(variant: str):
    """(stem_ch, [(expand, kernel, stride, out_ch) per block], head_ch) for
    a variant, with torchvision's channel/depth rounding."""
    import math

    width, depth = _EFFNET_MULTS[variant]
    stem = _make_divisible(32 * width)
    blocks = []
    for expand, kernel, stride, out, repeats in _EFFNET_STAGES:
        out_ch = _make_divisible(out * width)
        for b in range(int(math.ceil(repeats * depth))):
            blocks.append((expand, kernel, stride if b == 0 else 1, out_ch))
    return stem, blocks, 4 * blocks[-1][-1]


class EfficientNetParameterPredictor(nn.Module):
    """EfficientNet-b0/b3 predictor (model_architectures.py:71-125) — the
    faithful torchvision graph (SE blocks, per-stage expand/kernel/repeat
    schedule, width/depth multipliers) so ImageNet checkpoints import via
    :func:`load_torch_efficientnet`."""

    variant: str = "b0"

    @nn.compact
    def __call__(self, img, *, train: bool = False) -> Dict[str, jnp.ndarray]:
        stem, blocks, head = _effnet_blocks(self.variant)
        x = nn.Conv(stem, (3, 3), strides=2, padding=1, use_bias=False)(img)
        x = nn.BatchNorm(use_running_average=not train)(x)
        x = nn.swish(x)
        for expand, kernel, stride, out_ch in blocks:
            x = MBConv(out_ch, expand, kernel, stride)(x, train=train)
        x = nn.Conv(head, (1, 1), use_bias=False)(x)
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
            # exact (erf) GELU — torchvision's MLPBlock uses nn.GELU()
            # default, and weight import requires matching activations
            y = nn.gelu(y, approximate=False)
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


def _conv_bias_from_torch(params_conv, state, key):
    import numpy as np

    _conv_from_torch(params_conv, state, key)
    params_conv["bias"] = jnp.asarray(np.asarray(state[f"{key}.bias"]))


def load_torch_efficientnet(variables: Dict[str, Any],
                            torch_state: Dict[str, Any],
                            variant: str = "b0") -> Dict[str, Any]:
    """Fill EfficientNetParameterPredictor's backbone from a torchvision
    efficientnet_b0/b3 state_dict (model_architectures.py:80-86; the
    reference drops ``classifier`` for its own MLP+heads, which stay as
    initialized here).

    torchvision layout per block ``features.{s}.{b}.block``: expand
    ConvBNAct (absent at expand=1), depthwise ConvBNAct, SqueezeExcitation
    (fc1/fc2 1x1 convs), project ConvBN.  Conv weights transpose
    OIHW -> HWIO (depthwise (E,1,k,k) -> (k,k,1,E) matches
    feature_group_count=E); BN maps like load_torch_resnet18."""
    import math

    state = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
             for k, v in torch_state.items()}
    params = jax.tree.map(lambda x: x, dict(variables["params"]))
    stats = jax.tree.map(lambda x: x, dict(variables.get("batch_stats", {})))

    _conv_from_torch(params["Conv_0"], state, "features.0.0")
    _bn_from_torch(params["BatchNorm_0"], stats["BatchNorm_0"], state,
                   "features.0.1")
    _, depth_mult = _EFFNET_MULTS[variant]
    i = 0
    for si, (expand, _k, _s, _out, repeats) in enumerate(_EFFNET_STAGES, 1):
        for b in range(int(math.ceil(repeats * depth_mult))):
            t = f"features.{si}.{b}.block"
            pb, sb = params[f"MBConv_{i}"], stats[f"MBConv_{i}"]
            if expand != 1:
                _conv_from_torch(pb["Conv_0"], state, f"{t}.0.0")
                _bn_from_torch(pb["BatchNorm_0"], sb["BatchNorm_0"], state,
                               f"{t}.0.1")
                dw, se, proj = 1, 2, 3
                names = ("Conv_1", "BatchNorm_1", "Conv_2", "Conv_3",
                         "Conv_4", "BatchNorm_2")
            else:
                dw, se, proj = 0, 1, 2
                names = ("Conv_0", "BatchNorm_0", "Conv_1", "Conv_2",
                         "Conv_3", "BatchNorm_1")
            c_dw, b_dw, fc1, fc2, c_p, b_p = names
            _conv_from_torch(pb[c_dw], state, f"{t}.{dw}.0")
            _bn_from_torch(pb[b_dw], sb[b_dw], state, f"{t}.{dw}.1")
            _conv_bias_from_torch(pb[fc1], state, f"{t}.{se}.fc1")
            _conv_bias_from_torch(pb[fc2], state, f"{t}.{se}.fc2")
            _conv_from_torch(pb[c_p], state, f"{t}.{proj}.0")
            _bn_from_torch(pb[b_p], sb[b_p], state, f"{t}.{proj}.1")
            i += 1
    last = len(_EFFNET_STAGES) + 1
    _conv_from_torch(params["Conv_1"], state, f"features.{last}.0")
    _bn_from_torch(params["BatchNorm_1"], stats["BatchNorm_1"], state,
                   f"features.{last}.1")

    out = dict(variables)
    out["params"] = params
    out["batch_stats"] = stats
    return out


def load_efficientnet_npz(variables: Dict[str, Any], npz_path: str,
                          variant: str = "b0") -> Dict[str, Any]:
    """load_torch_efficientnet from an offline-converted .npz artifact."""
    import numpy as np

    return load_torch_efficientnet(variables, dict(np.load(npz_path)),
                                   variant)


def load_torch_vit(variables: Dict[str, Any],
                   torch_state: Dict[str, Any]) -> Dict[str, Any]:
    """Fill ViTParameterPredictor's backbone from a torchvision
    vit_b_16-format state_dict (model_architectures.py:131
    ``vit_b_16(pretrained=...)``; the reference drops ``heads`` for its own
    MLP+heads, which stay as initialized here).

    Dimension-agnostic: depth/width are read from the state dict, so the
    same loader serves a full vit_b_16 artifact and small test configs.
    Key map (torchvision names):
      conv_proj.{weight,bias}            -> Conv_0 (OIHW -> HWIO)
      class_token                        -> cls
      encoder.pos_embedding              -> pos
      encoder.layers.encoder_layer_i.ln_1          -> LayerNorm_{2i}
      ...self_attention.{in_proj_*,out_proj.*}     -> MultiHeadDotProductAttention_{i}
      ...ln_2                                      -> LayerNorm_{2i+1}
      ...mlp.{0,3} (new) / mlp.linear_{1,2} (old)  -> Dense_{2i}, Dense_{2i+1}
      encoder.ln                         -> LayerNorm_{2*depth}
    The packed in_proj rows split q/k/v; (out, in) Linear weights transpose
    to (in, heads, head_dim) DenseGeneral kernels (head-major order matches
    torch's head concatenation).
    """
    import numpy as np

    state = {k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
                 np.asarray(v))
             for k, v in torch_state.items()}
    params = jax.tree.map(lambda x: x, dict(variables["params"]))

    w = state["conv_proj.weight"]            # (dim, 3, patch, patch)
    dim = w.shape[0]
    params["Conv_0"]["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
    params["Conv_0"]["bias"] = jnp.asarray(state["conv_proj.bias"])
    params["cls"] = jnp.asarray(state["class_token"])
    pos = state["encoder.pos_embedding"]
    if tuple(params["pos"].shape) != tuple(pos.shape):
        raise ValueError(
            f"pos embedding {tuple(pos.shape)} does not match the model's "
            f"{tuple(params['pos'].shape)} — init the ViT at the artifact's "
            f"image size (vit_b_16: 224)")
    params["pos"] = jnp.asarray(pos)

    heads = params["MultiHeadDotProductAttention_0"]["query"]["kernel"].shape[1]
    hdim = dim // heads
    depth = 0
    while f"encoder.layers.encoder_layer_{depth}.ln_1.weight" in state:
        depth += 1

    def ln(name, key):
        params[name]["scale"] = jnp.asarray(state[f"{key}.weight"])
        params[name]["bias"] = jnp.asarray(state[f"{key}.bias"])

    def lin(name, key):
        params[name]["kernel"] = jnp.asarray(state[f"{key}.weight"].T)
        params[name]["bias"] = jnp.asarray(state[f"{key}.bias"])

    for i in range(depth):
        t = f"encoder.layers.encoder_layer_{i}"
        ln(f"LayerNorm_{2 * i}", f"{t}.ln_1")
        ln(f"LayerNorm_{2 * i + 1}", f"{t}.ln_2")
        attn = params[f"MultiHeadDotProductAttention_{i}"]
        ipw = state[f"{t}.self_attention.in_proj_weight"]   # (3*dim, dim)
        ipb = state[f"{t}.self_attention.in_proj_bias"]
        for j, part in enumerate(("query", "key", "value")):
            attn[part]["kernel"] = jnp.asarray(
                ipw[j * dim:(j + 1) * dim].T.reshape(dim, heads, hdim))
            attn[part]["bias"] = jnp.asarray(
                ipb[j * dim:(j + 1) * dim].reshape(heads, hdim))
        attn["out"]["kernel"] = jnp.asarray(
            state[f"{t}.self_attention.out_proj.weight"].T.reshape(
                heads, hdim, dim))
        attn["out"]["bias"] = jnp.asarray(
            state[f"{t}.self_attention.out_proj.bias"])
        # torchvision >= 0.12 names the MLP Sequential 0/3; older linear_1/2
        mk = f"{t}.mlp.0" if f"{t}.mlp.0.weight" in state else f"{t}.mlp.linear_1"
        mk2 = f"{t}.mlp.3" if f"{t}.mlp.3.weight" in state else f"{t}.mlp.linear_2"
        lin(f"Dense_{2 * i}", mk)
        lin(f"Dense_{2 * i + 1}", mk2)
    ln(f"LayerNorm_{2 * depth}", "encoder.ln")

    out = dict(variables)
    out["params"] = params
    return out


def load_vit_npz(variables: Dict[str, Any], npz_path: str) -> Dict[str, Any]:
    """load_torch_vit from an offline-converted .npz artifact (save the
    torchvision state_dict arrays under their state_dict keys)."""
    import numpy as np

    return load_torch_vit(variables, dict(np.load(npz_path)))


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
