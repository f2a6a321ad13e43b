"""Loss functions for the parameter-predictor trainers.

- ``reference_loss``: 0.5*L1 + 0.5*L2 (ReferenceLoss,
  deep_learning_parameters.py:170-192).
- ``combined_loss``: 0.3*L1 + 0.5*L2 + 0.2*perceptual (CombinedLoss,
  vgg_16_UIE.py:272-299); perceptual = MSE of frozen VGG16 relu3_3 features
  (PerceptualLoss, :257-269).  The VGG trunk's params are passed in (frozen
  by construction — they are never part of the optimized pytree).

All return (total, components_dict) like the reference.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from underwater_image_enhancement_tpu.models.vgg import VGGFeatures

_PERCEPTUAL_TRUNK = VGGFeatures(depth=7)
# bf16-compute twin for the AMP analog (same params; dtype only affects
# the activation/compute width — vgg_16_UIE.py:504 autocasts the
# perceptual VGG alongside the backbone)
_PERCEPTUAL_TRUNK_BF16 = VGGFeatures(depth=7, dtype=jnp.bfloat16)


def init_perceptual_params(rng, image_shape=(1, 224, 224, 3)):
    """Initialize (or later: load pretrained) perceptual-trunk parameters."""
    return _PERCEPTUAL_TRUNK.init(rng, jnp.zeros(image_shape, jnp.float32))


def reference_loss(enhanced: jnp.ndarray, reference: jnp.ndarray,
                   l1_weight: float = 0.5, l2_weight: float = 0.5
                   ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    l1 = jnp.mean(jnp.abs(enhanced - reference))
    l2 = jnp.mean((enhanced - reference) ** 2)
    return l1_weight * l1 + l2_weight * l2, {"l1": l1, "l2": l2}


def perceptual_loss(vgg_params, pred: jnp.ndarray, target: jnp.ndarray,
                    dtype=jnp.float32) -> jnp.ndarray:
    # normalize dtype spellings ("bfloat16", np.dtype, jnp.bfloat16) so a
    # caller following VGGTrainer's string convention still gets bf16
    import numpy as np

    bf16 = np.dtype(dtype) == np.dtype(jnp.bfloat16)
    trunk = _PERCEPTUAL_TRUNK_BF16 if bf16 else _PERCEPTUAL_TRUNK
    fp = trunk.apply(vgg_params, pred)
    ft = trunk.apply(vgg_params, target)
    # the feature MSE reduces in f32 regardless of the trunk compute dtype
    return jnp.mean((fp.astype(jnp.float32) - ft.astype(jnp.float32)) ** 2)


def combined_loss(vgg_params, enhanced: jnp.ndarray, reference: jnp.ndarray,
                  l1_weight: float = 0.3, l2_weight: float = 0.5,
                  perceptual_weight: float = 0.2, dtype=jnp.float32
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    l1 = jnp.mean(jnp.abs(enhanced - reference))
    l2 = jnp.mean((enhanced - reference) ** 2)
    perc = perceptual_loss(vgg_params, enhanced, reference, dtype=dtype)
    total = l1_weight * l1 + l2_weight * l2 + perceptual_weight * perc
    return total, {"l1": l1, "l2": l2, "perceptual": perc}
