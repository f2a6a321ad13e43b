"""Pallas TPU kernels for the hot ops XLA can't schedule optimally.

``hysteresis_propagate``: the Canny hysteresis flood (edges.canny_u8 runs it
as 64 sequential whole-image dilate-and-mask passes — 64 HBM round trips).
Here each grid step loads one row band + a 64-row halo into VMEM and runs
all 64 dilations locally, so the image crosses HBM once.  With halo >= the
iteration count, a band's result is EXACTLY the 64-step global dilation
restricted to the band (an 8-connected path of length L moves at most L rows
from its origin), so outputs are bit-identical to the XLA path.

Kernels fall back to interpret mode automatically on non-TPU backends so the
CPU test suite exercises the same code path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 64          # must match edges.canny_u8's hysteresis_iters default
TILE_H = 128        # rows per grid step
HALO = ITERS        # halo rows >= iteration count => exact equivalence


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _dilate8_local(e: jnp.ndarray) -> jnp.ndarray:
    """8-connected dilation inside a VMEM block (zero border)."""
    H, W = e.shape
    z_row = jnp.zeros((1, W), e.dtype)
    up = jnp.concatenate([e[1:], z_row], axis=0)
    down = jnp.concatenate([z_row, e[:-1]], axis=0)
    out = e | up | down
    z_col = jnp.zeros((H, 1), e.dtype)
    left = jnp.concatenate([out[:, 1:], z_col], axis=1)
    right = jnp.concatenate([z_col, out[:, :-1]], axis=1)
    return out | left | right


def _hyst_kernel(strong_ref, weak_ref, out_ref):
    e = strong_ref[0]
    w = weak_ref[0]

    def body(_, e):
        return e | (w & _dilate8_local(e))

    e = jax.lax.fori_loop(0, ITERS, body, e)
    out_ref[0] = e[HALO:HALO + TILE_H, :]


@jax.jit
def hysteresis_propagate(strong: jnp.ndarray, weak: jnp.ndarray) -> jnp.ndarray:
    """edges = strong | (weak reachable from strong in <= 64 dilations).

    strong/weak: (H, W) int32 {0,1}.  Bit-identical to 64 global
    dilate-and-mask iterations (see module docstring).
    """
    H, W = strong.shape
    n_bands = -(-H // TILE_H)
    pad_h = n_bands * TILE_H - H
    # zero-pad: HALO rows on top, HALO + band remainder on the bottom
    sp = jnp.pad(strong, ((HALO, HALO + pad_h), (0, 0)))
    wp = jnp.pad(weak, ((HALO, HALO + pad_h), (0, 0)))
    bh = TILE_H + 2 * HALO

    # overlapping band windows (stride TILE_H, height TILE_H + 2*HALO) are
    # materialized by an XLA pre-gather: band b = rows [b*TILE_H, +bh)
    starts = jnp.arange(n_bands) * TILE_H
    s_bands = jax.vmap(
        lambda s: jax.lax.dynamic_slice(sp, (s, 0), (bh, W)))(starts)
    w_bands = jax.vmap(
        lambda s: jax.lax.dynamic_slice(wp, (s, 0), (bh, W)))(starts)

    out = pl.pallas_call(
        _hyst_kernel,
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec((1, bh, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_H, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_bands, TILE_H, W), strong.dtype),
        interpret=_interpret(),
    )(s_bands, w_bands)
    return out.reshape(n_bands * TILE_H, W)[:H]
