"""Color-cast detection and correction (six_stadigy.py:292-323).

The reference's data-dependent branches become arithmetic selects so the whole
thing stays inside one jitted program.  Type codes: 0=normal, 1=greenish,
2=bluish.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

CAST_NORMAL, CAST_GREENISH, CAST_BLUISH = 0, 1, 2
CAST_NAMES = ("normal", "greenish", "bluish")


@jax.jit
def detect_cast(img: jnp.ndarray) -> jnp.ndarray:
    """Image type from mean RGB (six_stadigy.py:292-302).

    img: (..., H, W, 3) -> int32 code per leading batch element.
    greenish: g is strict max and g - r > 0.05; bluish: b strict max and
    b - r > 0.05 (checked in that order, like the reference's elif chain).
    """
    mean = jnp.mean(img, axis=(-3, -2))  # (..., 3)
    r, g, b = mean[..., 0], mean[..., 1], mean[..., 2]
    greenish = (g > r) & (g > b) & ((g - r) > 0.05)
    bluish = (b > r) & (b > g) & ((b - r) > 0.05)
    return jnp.where(greenish, CAST_GREENISH, jnp.where(bluish, CAST_BLUISH, CAST_NORMAL)).astype(jnp.int32)


@jax.jit
def correct_cast(img: jnp.ndarray, cast_code: jnp.ndarray) -> jnp.ndarray:
    """Scale the offending channel by 0.85 (six_stadigy.py:305-323)."""
    scale = jnp.ones((3,), img.dtype)
    scale = jnp.stack(
        [
            jnp.ones_like(cast_code, jnp.float32),
            jnp.where(cast_code == CAST_GREENISH, 0.85, 1.0),
            jnp.where(cast_code == CAST_BLUISH, 0.85, 1.0),
        ],
        axis=-1,
    )  # (..., 3)
    out = img * scale[..., None, None, :]
    # the reference clips after scaling (a no-op for scaling down, kept anyway)
    return jnp.clip(out, 0.0, 1.0)


@jax.jit
def detect_and_correct(img: jnp.ndarray):
    """Returns (corrected_img, cast_code)."""
    code = detect_cast(img)
    return correct_cast(img, code), code
