"""Independent NumPy oracle for the Water-Net / UNet forward passes.

Implements SAME-padded NHWC convolution, relu, softmax, nearest upsample and
the gated fusion / residual-UNet wiring directly in float64 NumPy (no JAX,
no Flax), so tests/test_waternet.py can gate the Flax modules against a
formulation that shares no code with them.  Weights are read from a Flax
variables pytree (nn.Conv HWIO kernels).
"""

from __future__ import annotations

import numpy as np


def conv2d_same(x: np.ndarray, kernel: np.ndarray, bias: np.ndarray,
                stride: int = 1) -> np.ndarray:
    """NHWC x (Kh, Kw, Cin, Cout) SAME convolution, float64 accumulate.

    Matches XLA's SAME padding: pad_total = (ceil(n/s) - 1) * s + k - n,
    split low = pad_total // 2 (extra on the high side).
    """
    n, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    oh = -(-h // stride)
    ow = -(-w // stride)
    pad_h = max((oh - 1) * stride + kh - h, 0)
    pad_w = max((ow - 1) * stride + kw - w, 0)
    lo_h, lo_w = pad_h // 2, pad_w // 2
    xp = np.zeros((n, h + pad_h, w + pad_w, cin), np.float64)
    xp[:, lo_h:lo_h + h, lo_w:lo_w + w, :] = x
    out = np.zeros((n, oh, ow, cout), np.float64)
    # sum of shifted slices: out += x[.., i::s, j::s, :] @ kernel[i, j]
    for i in range(kh):
        for j in range(kw):
            sl = xp[:, i:i + (oh - 1) * stride + 1:stride,
                    j:j + (ow - 1) * stride + 1:stride, :]
            out += sl @ kernel[i, j]
    return out + bias


def relu(x):
    return np.maximum(x, 0.0)


def softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def upsample2(x):
    return x.repeat(2, axis=1).repeat(2, axis=2)


def _conv_params(params: dict, name: str):
    p = params[name]
    return np.asarray(p["kernel"], np.float64), np.asarray(p["bias"], np.float64)


def _ftu(params: dict, raw, view):
    x = np.concatenate([raw, view], axis=-1)
    for name in ("Conv_0", "Conv_1", "Conv_2"):
        x = relu(conv2d_same(x, *_conv_params(params, name)))
    return x


def waternet_forward(variables, raw, wb, he, gc) -> np.ndarray:
    """Oracle for models/waternet.py:WaterNet.__call__ (f32 dtype)."""
    params = variables["params"]
    t = np.concatenate([raw, wb, he, gc], axis=-1).astype(np.float64)
    for i in range(6):
        t = relu(conv2d_same(t, *_conv_params(params, f"Conv_{i}")))
    conf = softmax(conv2d_same(t, *_conv_params(params, "Conv_6")), axis=-1)
    r = [_ftu(params[n], raw.astype(np.float64), v.astype(np.float64))
         for n, v in (("ftu_wb", wb), ("ftu_he", he), ("ftu_gc", gc))]
    out = sum(conf[..., i:i + 1] * r[i] for i in range(3))
    return np.clip(out, 0.0, 1.0)


def unet_forward(variables, x) -> np.ndarray:
    """Oracle for models/waternet.py:UNetEnhancer.__call__ (f32 dtype).

    Conv order follows Flax's @nn.compact autonaming: Conv_0..Conv_8 in call
    order (e0 x2, down1, e1, down2, bottleneck, up1, up0, head)."""
    params = variables["params"]
    raw = x.astype(np.float64)
    cp = lambda i: _conv_params(params, f"Conv_{i}")
    e0 = relu(conv2d_same(raw, *cp(0)))
    e0 = relu(conv2d_same(e0, *cp(1)))
    d1 = relu(conv2d_same(e0, *cp(2), stride=2))
    e1 = relu(conv2d_same(d1, *cp(3)))
    d2 = relu(conv2d_same(e1, *cp(4), stride=2))
    b = relu(conv2d_same(d2, *cp(5)))
    u1 = relu(conv2d_same(np.concatenate([upsample2(b), e1], -1), *cp(6)))
    u0 = relu(conv2d_same(np.concatenate([upsample2(u1), e0], -1), *cp(7)))
    res = conv2d_same(u0, *cp(8))
    return np.clip(raw + res, 0.0, 1.0)
