"""Layout helpers shared by the channel-first pipelines."""

from __future__ import annotations

import jax
import jax.numpy as jnp  # noqa: F401  (re-exported convention)


def split_planes(img: jnp.ndarray):
    """(..., H, W, 3) -> 3 channel-first planes behind optimization
    barriers.

    The barriers force XLA to materialize each plane in its own layout
    instead of fusing every downstream windowed op into channel-minor NHWC
    gathers — measured ~7x slower when composed (see pipeline/six.py's
    module docstring).  One definition serves the strategy, six, and fusion
    pipelines so the barrier policy changes in one place."""
    return tuple(jax.lax.optimization_barrier(img[..., c]) for c in range(3))
