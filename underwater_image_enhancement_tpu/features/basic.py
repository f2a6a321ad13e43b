"""The lightweight 18-dim (zero-padded to 79) feature vector.

Reproduces vgg_16_UIE.py:435-466 (standalone ``extract_all_features`` twin of
ImprovedEnhancementDataset.extract_basic_features at :361-387): per-channel
mean/std/min/max/median (15) + global mean/std/second-moment (3), padded
with zeros to 79.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from underwater_image_enhancement_tpu.ops import stretch

FEATURE_DIM = 79


@jax.jit
def extract_basic_features(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) float [0,1] -> (79,) float32 (18 real dims + zero pad)."""
    feats = []
    for c in range(3):
        ch = img[..., c].reshape(-1)
        feats += [
            jnp.mean(ch), jnp.std(ch), jnp.min(ch), jnp.max(ch),
            stretch.percentiles_radix(ch, (50.0,))[0],
        ]
    flat = img.reshape(-1)
    feats += [jnp.mean(flat), jnp.std(flat), jnp.mean(flat**2)]
    v = jnp.stack(feats).astype(jnp.float32)
    return jnp.concatenate([v, jnp.zeros((FEATURE_DIM - 18,), jnp.float32)])


@jax.jit
def extract_basic_batch(imgs: jnp.ndarray) -> jnp.ndarray:
    return jax.vmap(extract_basic_features)(imgs)
