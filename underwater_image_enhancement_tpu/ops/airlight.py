"""Quadtree atmospheric-light estimation — TPU-native formulation.

Reference (six_stadigy.py:48-113, enhancement_strategies.py:75-144): starting
from the full image, split into 4 blocks, score each with
Q = mean_brightness + (B+G-2R)/n - mean_channel_variance - canny_edge_density
(compute_Q, six_stadigy.py:115-157), descend into the best block until
<= min_size, return the brightest pixel's RGB there.  (The reference's
"stack" only ever holds one block, so it is a pure descent; the tiled-A
variant at enhancement_strategies.py:142 is numerically identical.)

Recursive slicing with shrinking dynamic shapes is hostile to XLA, so this
implements the SURVEY.md §7 plan: ONE pass builds summed-area tables for
(r, g, b), (r^2, g^2, b^2) and a global Canny edge map; each quadtree level
then scores its 4 children with O(1) SAT corner lookups inside a
``lax.while_loop`` over index boxes (constant shapes throughout).

Approximation (documented): the reference runs cv2.Canny on each BLOCK crop,
so block-border gradient reflection and hysteresis truncation differ slightly
from a global edge map.  The edge term only steers the descent (it never
reaches pixels); tests/test_airlight.py quantifies the agreement.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from underwater_image_enhancement_tpu.ops.colorspace import quantize_u8, rgb_to_gray_u8
from underwater_image_enhancement_tpu.ops.edges import canny_u8


def _sat(x: jnp.ndarray) -> jnp.ndarray:
    """Summed-area table with a leading zero row/col: (..., H, W) -> (..., H+1, W+1)."""
    c = jnp.cumsum(jnp.cumsum(x, axis=-2), axis=-1)
    c = jnp.pad(c, [(0, 0)] * (x.ndim - 2) + [(1, 0), (1, 0)])
    return c


def _box_sum(sat: jnp.ndarray, r0, c0, h, w):
    """Sum of sat's source over rows [r0, r0+h), cols [c0, c0+w).  Leading
    axes of ``sat`` are batch (e.g. the 7 SAT planes)."""

    def corner(dr, dc):
        idx = (0,) * (sat.ndim - 2) + (r0 + dr, c0 + dc)
        sizes = sat.shape[:-2] + (1, 1)
        return jax.lax.dynamic_slice(sat, idx, sizes).reshape(sat.shape[:-2])

    return corner(h, w) - corner(0, w) - corner(h, 0) + corner(0, 0)


@partial(jax.jit, static_argnames=("min_size",))
def quadtree_airlight(img: jnp.ndarray, min_size: int = 1) -> jnp.ndarray:
    """Atmospheric light RGB (3,) for one (H, W, 3) image in [0,1]."""
    H, W = img.shape[0], img.shape[1]
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    gray = rgb_to_gray_u8(quantize_u8(img))
    edgemap = canny_u8(gray, 50, 150).astype(jnp.float32)
    planes = jnp.stack([r, g, b, r * r, g * g, b * b, edgemap], axis=0)
    sats = _sat(planes)  # (7, H+1, W+1)

    def q_of(r0, c0, h, w):
        s = _box_sum(sats, r0, c0, h, w)  # (7,)
        n = (h * w).astype(jnp.float32)
        sr, sg, sb, s2r, s2g, s2b, se = s[0], s[1], s[2], s[3], s[4], s[5], s[6]
        t1 = (sr + sg + sb) / (3.0 * n)
        t2 = (sb + sg - 2.0 * sr) / n
        var = lambda s1, s2: s2 / n - (s1 / n) ** 2
        t3 = (var(sr, s2r) + var(sg, s2g) + var(sb, s2b)) / 3.0
        t4 = se / n
        return t1 + t2 - t3 - t4

    def cond(state):
        _, _, h, w = state
        return (h > min_size) & (w > min_size)

    def body(state):
        r0, c0, h, w = state
        mh, mw = h // 2, w // 2
        boxes = (
            (r0, c0, mh, mw),
            (r0, c0 + mw, mh, w - mw),
            (r0 + mh, c0, h - mh, mw),
            (r0 + mh, c0 + mw, h - mh, w - mw),
        )
        qs = jnp.stack([q_of(*bx) for bx in boxes])
        k = jnp.argmax(qs)  # first max wins, like np.argmax
        cand = jnp.array([[bx[0], bx[1], bx[2], bx[3]] for bx in boxes]).T
        sel = cand[:, k]
        return sel[0], sel[1], sel[2], sel[3]

    z = jnp.int32(0)
    r0, c0, h, w = jax.lax.while_loop(
        cond, body, (z, z, jnp.int32(H), jnp.int32(W))
    )

    # brightest pixel (max R+G+B, first index on ties — np.argmax order)
    rows = jnp.arange(H, dtype=jnp.int32)[:, None]
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    inside = (rows >= r0) & (rows < r0 + h) & (cols >= c0) & (cols < c0 + w)
    score = jnp.where(inside, r + g + b, -jnp.inf)
    flat_idx = jnp.argmax(score)
    return img.reshape(-1, 3)[flat_idx]


def quadtree_airlight_batch(imgs: jnp.ndarray, min_size: int = 1) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, 3)."""
    return jax.vmap(lambda im: quadtree_airlight(im, min_size))(imgs)
