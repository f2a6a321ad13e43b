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

from underwater_image_enhancement_tpu.ops.colorspace import gray_u8_planes, quantize_u8
from underwater_image_enhancement_tpu.ops.edges import canny_u8


def _sat_rows(x: jnp.ndarray, fast: bool = False) -> jnp.ndarray:
    """Row-prefix table with a leading zero row: (..., H, W) -> (..., H+1, W).

    Only the ROW prefix is precomputed (sublane-axis scan, cheap).  The
    expensive full-image lane-axis scan is avoided: each quadtree level only
    queries 3 row indices, so the column prefix runs on a (P, 3, W) strip
    extracted per level (_corner_grid) — ~30x cheaper than a 2-D SAT.

    fast=True routes TPU stacks through the one-VMEM-pass Pallas scan
    (pallas_kernels.sat_rows, ~4x less HBM traffic than the XLA cumsum;
    vmap-safe — its custom_vmap rule folds the batch into the plane axis).
    Its Hillis-Steele f32 association differs from XLA's in the last
    bits, which can flip near-tie quadtree descents — so only the
    throughput path opts in; the parity paths keep XLA's association."""
    from underwater_image_enhancement_tpu.ops import pallas_kernels as pk

    if fast and x.ndim == 3 and jax.default_backend() == "tpu":
        return pk.sat_rows(x)
    c = jnp.cumsum(x, axis=-2)
    return jnp.pad(c, [(0, 0)] * (x.ndim - 2) + [(1, 0), (0, 0)])


def _corner_grid(sat_rows: jnp.ndarray, rows: jnp.ndarray,
                 cols: jnp.ndarray, fast: bool = False) -> jnp.ndarray:
    """(P, H+1, W) row-prefix + 3 row/col indices -> (P, 3, 3) SAT corners:
    grid[p, t, s] = sum of plane p over [0, rows[t]) x [0, cols[s]).

    fast=True replaces the strip's lane-axis cumsum + gather with three
    masked reductions (lane scans measured ~30x slower than sublane ones;
    inside the descent's dependent chain the scan dominated each level).
    The tree-reduction f32 association differs from the cumsum's in the
    last bits, so only the throughput path opts in."""
    strip = sat_rows[:, rows, :]                      # (P, 3, W) row gather
    if fast:
        lanes = jnp.arange(strip.shape[-1], dtype=jnp.int32)
        mask = (lanes[None, :] < cols[:, None]).astype(strip.dtype)  # (3, W)
        return jnp.sum(strip[:, :, None, :] * mask[None, None, :, :],
                       axis=-1)
    c = jnp.cumsum(strip, axis=-1)                    # tiny lane scan
    c = jnp.pad(c, [(0, 0), (0, 0), (1, 0)])
    return c[:, :, cols]


@partial(jax.jit, static_argnames=("min_size",))
def quadtree_airlight(img: jnp.ndarray, min_size: int = 1) -> jnp.ndarray:
    """Atmospheric light RGB (3,) for one (H, W, 3) image in [0,1]."""
    return quadtree_airlight_planes(
        tuple(img[..., c] for c in range(3)), min_size
    )


def quadtree_descend(corners_fn, H: int, W: int, min_size: int = 1):
    """The quadtree descent shared by the local and the sharded airlight:
    score 4 children per level from 9 SAT corners, take the argmax child
    (first max wins, like np.argmax), repeat down to ``min_size``.

    corners_fn(rows (3,), cols (3,)) -> (7, 3, 3) SAT corners of the
    [r, g, b, r^2, g^2, b^2, edges] stack over [0, rows[t]) x [0, cols[s])
    — local SAT lookups single-device, psum'd partial prefixes when the
    frame is row-sharded (parallel/six_spatial.py).  Unrolled to the
    statically-bounded level count with masking (the lax.while_loop's
    per-iteration machinery measured ~54 us/level on v5e).

    Returns the final (r0, c0, h, w) box as traced int32 scalars."""

    def cond(state):
        _, _, h, w = state
        return (h > min_size) & (w > min_size)

    def body(state):
        r0, c0, h, w = state
        mh, mw = h // 2, w // 2
        rows = jnp.stack([r0, r0 + mh, r0 + h])
        cols = jnp.stack([c0, c0 + mw, c0 + w])
        grid = corners_fn(rows, cols)  # (7, 3, 3)

        def box(ri, ci, rj, cj):
            return (grid[:, rj, cj] - grid[:, ri, cj]
                    - grid[:, rj, ci] + grid[:, ri, ci])  # (7,)

        sums = jnp.stack([box(0, 0, 1, 1), box(0, 1, 1, 2),
                          box(1, 0, 2, 1), box(1, 1, 2, 2)])  # (4, 7)
        ns = jnp.stack([mh * mw, mh * (w - mw), (h - mh) * mw,
                        (h - mh) * (w - mw)]).astype(jnp.float32)
        sr, sg, sb = sums[:, 0], sums[:, 1], sums[:, 2]
        s2r, s2g, s2b, se = sums[:, 3], sums[:, 4], sums[:, 5], sums[:, 6]
        t1 = (sr + sg + sb) / (3.0 * ns)
        t2 = (sb + sg - 2.0 * sr) / ns
        var = lambda s1, s2: s2 / ns - (s1 / ns) ** 2
        t3 = (var(sr, s2r) + var(sg, s2g) + var(sb, s2b)) / 3.0
        qs = t1 + t2 - t3 - se / ns  # (4,)
        k = jnp.argmax(qs)  # first max wins, like np.argmax
        cand = jnp.stack([
            jnp.stack([r0, c0, mh, mw]),
            jnp.stack([r0, c0 + mw, mh, w - mw]),
            jnp.stack([r0 + mh, c0, h - mh, mw]),
            jnp.stack([r0 + mh, c0 + mw, h - mh, w - mw]),
        ])
        sel = cand[k]
        return sel[0], sel[1], sel[2], sel[3]

    z = jnp.int32(0)
    state = (z, z, jnp.int32(H), jnp.int32(W))
    for _ in range(len(_level_plan(H, W, min_size))):
        nxt = body(state)
        active = cond(state)
        state = tuple(jnp.where(active, n, s) for n, s in zip(nxt, state))
    return state


_BAND = 8  # banded-SAT row stride (see quadtree_airlight_planes)


@partial(jax.jit, static_argnames=("min_size", "edge_iters"))
def quadtree_airlight_planes(planes, min_size: int = 1,
                             edge_iters: int = 64) -> jnp.ndarray:
    """Channel-first core: (r, g, b) planes -> A (3,).

    Banded SAT: the old full (7, H+1, W) row-prefix table cost ~55 MB per
    1080p frame to write, and in the batched label program XLA inserted
    TWO further full-size layout copies for the descent's gathers (the
    profiler showed ~0.5 ms/frame of pure copy).  The descent only ever
    reads 3 row strips per level, so instead only per-band sums at stride
    ``_BAND`` are prefix-summed — (7, H/8+1, W), 8x smaller — and a corner
    at row r re-derives the exact row prefix as band_prefix[r // 8] plus a
    masked sum of the <8 remaining rows gathered straight from the input
    planes.  The f32 summation order changes (exact band partials instead
    of a Hillis-Steele scan) but the canonical-golden airlight test still
    bounds the result at 1e-6 vs the float64 oracle.

    edge_iters bounds the Canny hysteresis propagation; 64 matches the
    parity-tested global edge map, throughput callers may lower it (the
    edge term only steers the descent)."""
    r, g, b = planes
    H, W = r.shape[0], r.shape[1]
    gray = gray_u8_planes(*(quantize_u8(p) for p in planes))
    edge = canny_u8(gray, 50, 150,
                    hysteresis_iters=edge_iters).astype(jnp.float32)

    S = _BAND
    nb = -(-H // S)
    pad = nb * S - H

    def stats7(rr, gg, bb, ee):
        # plane order quadtree_descend expects: [r, g, b, r^2, g^2, b^2, e]
        return (rr, gg, bb, rr * rr, gg * gg, bb * bb, ee)

    def banded(x):
        xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
        return xp.reshape(nb, S, W)

    segs = tuple(banded(x) for x in (r, g, b, edge))
    band = jnp.stack([jnp.sum(s, axis=1) for s in stats7(*segs)],
                     axis=0)                             # (7, nb, W)
    band_prefix = jnp.pad(jnp.cumsum(band, axis=1),
                          ((0, 0), (1, 0), (0, 0)))      # (7, nb+1, W)

    lanes = jnp.arange(W, dtype=jnp.int32)
    offs = jnp.arange(S, dtype=jnp.int32)

    def corners(rows, cols):
        # The 4 children share a 3x3 grid of SAT corners; rebuild the
        # 3-row strip of exact row prefixes from the band table + in-band
        # remainders, then the tiny masked column reduction (lane scans
        # measured ~30x slower than sublane ones on TPU).
        bidx = rows // S                                  # (3,)
        base = band_prefix[:, bidx, :]                    # (7, 3, W)
        ids = jnp.clip(bidx[:, None] * S + offs[None, :], 0, H - 1)
        seg = tuple(x[ids] for x in (r, g, b, edge))      # (3, S, W) each
        m = (offs[None, :, None]
             < (rows - bidx * S)[:, None, None]).astype(r.dtype)
        part = jnp.stack([jnp.sum(s * m, axis=1) for s in stats7(*seg)],
                         axis=0)                          # (7, 3, W)
        strip = base + part
        cmask = (lanes[None, :] < cols[:, None]).astype(strip.dtype)
        return jnp.sum(strip[:, :, None, :] * cmask[None, None], axis=-1)

    r0, c0, h, w = quadtree_descend(corners, H, W, min_size)

    # brightest pixel (max R+G+B, first index on ties — np.argmax order)
    return _brightest_pixel(planes, r0, c0, h, w)


def _brightest_pixel(planes, r0, c0, h, w) -> jnp.ndarray:
    r, g, b = planes
    H, W = r.shape[0], r.shape[1]
    rows = jnp.arange(H, dtype=jnp.int32)[:, None]
    cols = jnp.arange(W, dtype=jnp.int32)[None, :]
    inside = (rows >= r0) & (rows < r0 + h) & (cols >= c0) & (cols < c0 + w)
    score = jnp.where(inside, r + g + b, -jnp.inf)
    flat_idx = jnp.argmax(score)
    return jnp.stack([p.reshape(-1)[flat_idx] for p in planes])


def quadtree_airlight_batch(imgs: jnp.ndarray, min_size: int = 1) -> jnp.ndarray:
    """(B, H, W, 3) -> (B, 3)."""
    return jax.vmap(lambda im: quadtree_airlight(im, min_size))(imgs)


def _level_plan(H: int, W: int, min_size: int):
    """Host-computed per-level max child sizes.  Repeated floor/ceil halving
    keeps each level's possible sizes within {a, a+1}, so a fixed buffer of
    the level maximum holds any child reachable at that depth."""
    h_set, w_set = {H}, {W}
    plan = []
    while max(h_set) > min_size and max(w_set) > min_size:
        h_set = {s for h in h_set for s in (h // 2, h - h // 2)}
        w_set = {s for w in w_set for s in (w // 2, w - w // 2)}
        plan.append((max(h_set), max(w_set)))
    return plan


@partial(jax.jit, static_argnames=("min_size",))
def quadtree_airlight_exact(img: jnp.ndarray, min_size: int = 1) -> jnp.ndarray:
    """EXACT reference descent: cv2-style Canny recomputed on every child
    block crop (enhancement_strategies.py:75-188, compute_Q runs cv2.Canny
    per block at :180-183) — unlike ``quadtree_airlight``'s global edge map.

    TPU formulation: brightness/cast/variance terms still come from O(1)
    SAT lookups; the per-block edge term is computed per level on a FIXED
    max-size buffer (host-computed level plan) holding the child crop with
    its last valid row/col replicated outward, so Canny's replicate-border
    Sobel + magnitude masking reproduce the crop-local result exactly with
    static shapes (see canny_u8's valid_hw).  Levels where the descent has
    already stopped are skipped via lax.cond."""
    return quadtree_airlight_exact_planes(
        tuple(img[..., c] for c in range(3)), min_size
    )


@partial(jax.jit, static_argnames=("min_size",))
def quadtree_airlight_exact_planes(planes, min_size: int = 1) -> jnp.ndarray:
    """Channel-first core of the exact per-block-Canny descent."""
    r, g, b = planes
    H, W = r.shape[0], r.shape[1]
    gray = gray_u8_planes(*(quantize_u8(p) for p in planes)).astype(jnp.int32)
    plan = _level_plan(H, W, min_size)
    pad_h = plan[0][0] if plan else 1
    pad_w = plan[0][1] if plan else 1
    gray_pad = jnp.pad(gray, ((0, pad_h), (0, pad_w)))
    stat_planes = jnp.stack([r, g, b, r * r, g * g, b * b], axis=0)
    sats = _sat_rows(stat_planes)  # (6, H+1, W)

    def edge_count(rr, cc, hh, ww, bh, bw):
        """cv2.Canny edge count of the (hh, ww) crop at (rr, cc), computed
        on a static (bh, bw) buffer."""
        buf = jax.lax.dynamic_slice(gray_pad, (rr, cc), (bh, bw))
        row_rep = jax.lax.dynamic_slice(buf, (jnp.maximum(hh - 1, 0), 0),
                                        (1, bw))
        rows = jnp.arange(bh, dtype=jnp.int32)[:, None]
        cols = jnp.arange(bw, dtype=jnp.int32)[None, :]
        buf = jnp.where(rows < hh, buf, row_rep)
        col_rep = jax.lax.dynamic_slice(buf, (0, jnp.maximum(ww - 1, 0)),
                                        (bh, 1))
        buf = jnp.where(cols < ww, buf, col_rep)
        edges = canny_u8(buf, 50, 150, valid_hw=(hh, ww))
        return jnp.sum(edges).astype(jnp.float32)

    def level_step(state, bh, bw):
        r0, c0, h, w = state
        mh, mw = h // 2, w // 2
        rows = jnp.stack([r0, r0 + mh, r0 + h])
        cols = jnp.stack([c0, c0 + mw, c0 + w])
        grid = _corner_grid(sats, rows, cols)  # (6, 3, 3)

        def box(ri, ci, rj, cj):
            return (grid[:, rj, cj] - grid[:, ri, cj]
                    - grid[:, rj, ci] + grid[:, ri, ci])  # (6,)

        sums = jnp.stack([box(0, 0, 1, 1), box(0, 1, 1, 2),
                          box(1, 0, 2, 1), box(1, 1, 2, 2)])  # (4, 6)
        cand = jnp.stack([
            jnp.stack([r0, c0, mh, mw]),
            jnp.stack([r0, c0 + mw, mh, w - mw]),
            jnp.stack([r0 + mh, c0, h - mh, mw]),
            jnp.stack([r0 + mh, c0 + mw, h - mh, w - mw]),
        ])  # (4, 4) child boxes
        ns = (cand[:, 2] * cand[:, 3]).astype(jnp.float32)
        ec = jnp.stack([edge_count(cand[k, 0], cand[k, 1],
                                   cand[k, 2], cand[k, 3], bh, bw)
                        for k in range(4)])
        sr, sg, sb = sums[:, 0], sums[:, 1], sums[:, 2]
        s2r, s2g, s2b = sums[:, 3], sums[:, 4], sums[:, 5]
        t1 = (sr + sg + sb) / (3.0 * ns)
        t2 = (sb + sg - 2.0 * sr) / ns
        var = lambda s1, s2: s2 / ns - (s1 / ns) ** 2
        t3 = (var(sr, s2r) + var(sg, s2g) + var(sb, s2b)) / 3.0
        qs = t1 + t2 - t3 - ec / ns
        sel = cand[jnp.argmax(qs)]
        return sel[0], sel[1], sel[2], sel[3]

    state = (jnp.int32(0), jnp.int32(0), jnp.int32(H), jnp.int32(W))
    for bh, bw in plan:
        active = (state[2] > min_size) & (state[3] > min_size)
        state = jax.lax.cond(
            active, lambda s: level_step(s, bh, bw), lambda s: s, state
        )
    r0, c0, h, w = state
    return _brightest_pixel(planes, r0, c0, h, w)
