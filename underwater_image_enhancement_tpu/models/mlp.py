"""Feature-MLP parameter predictor (Flax).

Reproduces ParameterPredictor (deep_learning_parameters.py:97-163): 79-dim
input projection -> 3 residual blocks -> half-width output projection ->
4 sigmoid-ranged heads:

  gamma     in [1.0, 1.5]   (:158)
  L_low     in [5, 20]      (:159)
  L_high    in [85, 98]     (:160)
  use_gamma in [0, 1]       (:161)

Dropout matches the reference's 0.3 (train-mode only).
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax.numpy as jnp

PARAM_RANGES = {
    "gamma": (1.0, 1.5),
    "L_low": (5.0, 20.0),
    "L_high": (85.0, 98.0),
    "use_gamma": (0.0, 1.0),
}


class ResidualBlock(nn.Module):
    """deep_learning_parameters.py:97-111: relu(dropout(block(x) + x))."""

    dim: int
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.Dense(self.dim)(x)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.dim)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h + x)
        return nn.relu(h)


class ParameterPredictor(nn.Module):
    """Framework note: unlike the reference (which feeds the raw 79-dim
    vector whose DCT/GLCM entries reach ~1e5 and saturate every sigmoid
    head at init, zeroing all gradients), inputs are LayerNorm-normalized
    first.  Set normalize_inputs=False for the raw reference behavior."""

    feature_dim: int = 79
    hidden_dim: int = 256
    num_blocks: int = 3
    normalize_inputs: bool = True

    @nn.compact
    def __call__(self, feats, *, train: bool = False) -> Dict[str, jnp.ndarray]:
        if self.normalize_inputs:
            feats = nn.LayerNorm(name="input_norm")(feats)
        x = nn.Dense(self.hidden_dim)(feats)
        x = nn.relu(x)
        x = nn.Dropout(0.3, deterministic=not train)(x)
        for _ in range(self.num_blocks):
            x = ResidualBlock(self.hidden_dim)(x, train=train)
        x = nn.Dense(self.hidden_dim // 2)(x)
        x = nn.relu(x)
        params = {}
        for name, (lo, hi) in PARAM_RANGES.items():
            raw = nn.Dense(1, name=f"head_{name}")(x)
            params[name] = nn.sigmoid(raw) * (hi - lo) + lo
        return params
