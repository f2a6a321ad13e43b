"""The full six-strategy pipeline for ONE huge frame sharded across chips.

Single-frame spatial parallelism is this domain's long-context analog
(SURVEY.md §5): a 4K/8K frame is row-sharded over a `jax.sharding.Mesh`
and the whole `six_stadigy.py` workload — cast detect/correct, quadtree
airlight, three dehaze chains, percentile stretches, white balance, five
CLAHE-LAB roundtrips, gammas — runs as ONE `shard_map` program whose only
cross-chip traffic is:

- `psum` of integer histograms (percentile stretch / white balance — the
  hierarchical-histogram fast path of ops.stretch reproduced exactly, so
  sharded percentiles are BIT-EQUAL to single-device `hist-fast`),
- `psum` of 9 summed-area-table corners per quadtree level (airlight),
- `pmax`/`pmin` for the brightest-pixel argmax (first-index tie rule),
- one tiny `all_gather` of the per-tile CLAHE LUTs (64 x 256 ints),
- `ppermute` halo exchanges for Canny (halo = hysteresis reach + sobel/NMS
  reach, which makes the banded result EXACTLY the bounded global
  propagation) and for the fast guided filter's subsampled box windows.

Everything else is local to the shard.  Strategy recipes and constants
mirror pipeline/six.py's fast mode (six_stadigy.py:226-285); see
tests/test_six_spatial.py for the equality/PSNR gates vs the single-device
program.

Shape requirements: W % tiles == 0 and tiles % D == 0 (whole CLAHE tile
rows per shard).  ANY height works: H is REFLECT_101-row-padded to the
next multiple of lcm(D, tiles) and cropped after (global reductions mask
the pad rows exactly); heights that divide but land off the stride-8
percentile grid (e.g. 2160/8 devices = 270 rows/shard) switch the
percentile subsample to a masked global-grid selection that stays
bit-equal to the single-device fast path with no padding at all.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from underwater_image_enhancement_tpu.ops import colorspace as cs
from underwater_image_enhancement_tpu.ops.airlight import quadtree_descend
from underwater_image_enhancement_tpu.ops.boxfilter import _window_sum
from underwater_image_enhancement_tpu.ops.edges import canny_u8
from underwater_image_enhancement_tpu.ops.histeq import _clahe_luts
from underwater_image_enhancement_tpu.ops.stretch import gamma_correction_pow
from underwater_image_enhancement_tpu.parallel.mesh import DATA_AXIS
from underwater_image_enhancement_tpu.parallel.spatial import _exchange_halo

AX = DATA_AXIS


def _halo(block: jnp.ndarray, h: int, edge: str = "reflect101"):
    return _exchange_halo(block, h, AX, edge)


# ---------------------------------------------------------------------------
# Percentiles: ops.stretch._perc_pair_hist reproduced with psum'd histograms.
# All cross-shard reductions are integer counts or min/max, so the selected
# bin edges are BIT-EQUAL to the single-device fast path.
# ---------------------------------------------------------------------------


def _perc_pair_hist_sharded(ch: jnp.ndarray, l_low, l_high, n_global: int,
                            k: int = 32, subsample: int = 8,
                            valid_to: int | None = None):
    # min/max run on the SAME row subsample as the histogram (matching
    # ops.stretch._perc_pair_hist, which drops the full-frame min/max pass
    # for HBM traffic).  Two row-selection modes, both BIT-EQUAL to the
    # single-device path (histogramming is order-independent, so only the
    # SET of selected rows matters):
    # - aligned (rows-per-shard % subsample == 0, no pad rows): local
    #   stride-`subsample` slicing IS the global stride grid — cheapest.
    # - masked (misaligned shard heights, e.g. 2160/8 = 270 rows, or a
    #   row-padded frame): keep all rows and weight each by whether its
    #   GLOBAL index is on the stride grid (and below valid_to when the
    #   frame was pad-to-aligned) — 8x the one-hot work, exact selection.
    Hl = ch.shape[0]
    aligned = subsample <= 1 or (Hl % subsample == 0 and valid_to is None)
    if aligned:
        sub = ch[::subsample, :] if subsample > 1 else ch
        vmin = lax.pmin(jnp.min(sub), AX)
        vmax = lax.pmax(jnp.max(sub), AX)
        flat = sub.reshape(-1)
        fmask = None
    else:
        gr = lax.axis_index(AX) * Hl + jnp.arange(Hl, dtype=jnp.int32)
        valid = gr % subsample == 0
        if valid_to is not None:
            valid = valid & (gr < valid_to)
        vmask = valid[:, None]
        vmin = lax.pmin(jnp.min(jnp.where(vmask, ch, jnp.inf)), AX)
        vmax = lax.pmax(jnp.max(jnp.where(vmask, ch, -jnp.inf)), AX)
        flat = ch.reshape(-1)
        fmask = jnp.broadcast_to(vmask, ch.shape).reshape(-1)
    scale = (k * k - 1) / jnp.maximum(vmax - vmin, 1e-12)
    idx = jnp.clip((flat - vmin) * scale, 0, k * k - 1)
    hi = (idx // k).astype(jnp.int32)
    lo = jnp.clip(idx - hi.astype(jnp.float32) * k, 0, k - 1).astype(jnp.int32)
    bins = jnp.arange(k, dtype=jnp.int32)

    hi_onehot = (hi[:, None] == bins[None, :]).astype(jnp.int32)
    if fmask is not None:
        hi_onehot = jnp.where(fmask[:, None], hi_onehot, 0)
    h1 = lax.psum(jnp.sum(hi_onehot, axis=0), AX)
    c1 = jnp.cumsum(h1)

    def rank_of(pct):
        return jnp.asarray(pct, jnp.float32) / 100.0 * (n_global - 1) + 1.0

    t_lo = rank_of(l_low)
    t_hi = rank_of(l_high)
    b_lo = jnp.clip(jnp.sum((c1 < t_lo).astype(jnp.int32)), 0, k - 1)
    b_hi = jnp.clip(jnp.sum((c1 < t_hi).astype(jnp.int32)), 0, k - 1)
    below_lo = jnp.where(b_lo > 0, c1[jnp.maximum(b_lo - 1, 0)], 0)
    below_hi = jnp.where(b_hi > 0, c1[jnp.maximum(b_hi - 1, 0)], 0)

    lo_onehot = (lo[:, None] == bins[None, :]).astype(jnp.int32)
    if fmask is not None:
        lo_onehot = jnp.where(fmask[:, None], lo_onehot, 0)
    h2_lo = lax.psum(
        jnp.sum(jnp.where((hi == b_lo)[:, None], lo_onehot, 0), axis=0), AX)
    h2_hi = lax.psum(
        jnp.sum(jnp.where((hi == b_hi)[:, None], lo_onehot, 0), axis=0), AX)

    def fine(h2, below, b1, target):
        c2 = jnp.cumsum(h2) + below
        b2 = jnp.clip(jnp.sum((c2 < target).astype(jnp.int32)), 0, k - 1)
        return vmin + (b1 * k + b2).astype(jnp.float32) / scale

    return (fine(h2_lo, below_lo, b_lo, t_lo),
            fine(h2_hi, below_hi, b_hi, t_hi))


def _stretch_planes(planes, l_low, l_high, n_sub, valid_to=None):
    # eps 1e-6: six's strategies stretch through enhance_contrast_planes
    out = []
    for ch in planes:
        p_lo, p_hi = _perc_pair_hist_sharded(ch, l_low, l_high, n_sub,
                                             valid_to=valid_to)
        out.append(jnp.clip((ch - p_lo) / (p_hi - p_lo + 1e-6), 0.0, 1.0))
    return tuple(out)


def _wb_planes(planes, percentile, n_sub, valid_to=None):
    return _stretch_planes(planes, percentile, 100.0 - percentile, n_sub,
                           valid_to=valid_to)


# ---------------------------------------------------------------------------
# Canny + quadtree airlight
# ---------------------------------------------------------------------------


def _canny_sharded(gray_u8: jnp.ndarray, iters: int,
                   valid_to: int | None = None) -> jnp.ndarray:
    """Bounded-hysteresis Canny of a row-sharded u8 plane, bit-equal to the
    global `iters`-round propagation: halo = iters + 2 covers the sobel/NMS
    reach (2 rows) plus the longest strong->pixel chain (iters rows), so
    every kept row sees exactly the context the global computation uses.
    valid_rows zeroes the gradient magnitude on the replicate rows BEYOND
    the globe (edge shards), so border-row NMS reads magnitude 0 and
    hysteresis cannot seed from phantom halo gradients — without it the
    first/last global rows diverged from the single-device op."""
    h = iters + 2
    Hl = gray_u8.shape[0]
    n = lax.axis_size(AX)
    s0 = lax.axis_index(AX) * Hl
    ext = _halo(gray_u8, h, edge="edge")
    # ext row t <-> global row s0 - h + t; valid: 0 <= global < globe end
    # (the TRUE frame height when the frame was row-padded to alignment —
    # pad rows then read magnitude 0 exactly like out-of-globe halo rows)
    globe = Hl * n if valid_to is None else valid_to
    r0 = jnp.maximum(h - s0, 0)
    r1 = jnp.minimum(globe - s0 + h, Hl + 2 * h)
    e = canny_u8(ext, 50, 150, hysteresis_iters=iters, use_pallas=False,
                 valid_rows=(r0, r1))
    return e[h:-h]


def _airlight_sharded(planes, H: int, W: int, edge_iters: int = 4,
                      valid_to: int | None = None):
    # edge_iters must track pipeline.six._airlight's fast-tier value
    """quadtree_airlight_planes with psum'd SAT corners.

    Each shard keeps only its local row-prefix table; a corner at global
    (r, c) is the psum of every shard's clipped local prefix masked to
    columns < c.  The descent itself is replicated scalar state.  H is the
    TRUE frame height: the descent and the brightest-pixel box never touch
    rows >= H, so pad rows on a row-padded frame are naturally excluded
    from the SAT prefixes the descent reads."""
    Hl = planes[0].shape[0]
    s0 = lax.axis_index(AX) * Hl
    r, g, b = planes
    gray = cs.gray_u8_planes(*(cs.quantize_u8(p) for p in planes))
    edgemap = _canny_sharded(gray, edge_iters,
                             valid_to=valid_to).astype(jnp.float32)
    stats = jnp.stack([r, g, b, r * r, g * g, b * b, edgemap], axis=0)
    lsat = jnp.pad(jnp.cumsum(stats, axis=1), ((0, 0), (1, 0), (0, 0)))
    lanes = jnp.arange(W, dtype=jnp.int32)

    def corners(rows, cols):
        loc = jnp.clip(rows - s0, 0, Hl)                 # (3,)
        strip = lsat[:, loc, :]                          # (7, 3, W)
        mask = (lanes[None, :] < cols[:, None]).astype(strip.dtype)
        part = jnp.sum(strip[:, :, None, :] * mask[None, None], axis=-1)
        return lax.psum(part, AX)                        # (7, 3, 3)

    r0, c0, h, w = quadtree_descend(corners, H, W, 1)

    # brightest pixel in the final box: global argmax of r+g+b with the
    # flattened first-index tie rule (np.argmax order)
    rows_l = s0 + jnp.arange(Hl, dtype=jnp.int32)[:, None]
    cols_l = jnp.arange(W, dtype=jnp.int32)[None, :]
    inside = ((rows_l >= r0) & (rows_l < r0 + h)
              & (cols_l >= c0) & (cols_l < c0 + w))
    score = jnp.where(inside, r + g + b, -jnp.inf)
    li = jnp.argmax(score)
    lmax = score.reshape(-1)[li]
    gmax = lax.pmax(lmax, AX)
    gidx_cand = jnp.where(lmax == gmax,
                          s0 * W + li.astype(jnp.int32), jnp.int32(2**31 - 1))
    gidx = lax.pmin(gidx_cand, AX)
    own = (gidx >= s0 * W) & (gidx < (s0 + Hl) * W)
    lflat = jnp.clip(gidx - s0 * W, 0, Hl * W - 1)
    vals = jnp.stack([jnp.where(own, p.reshape(-1)[lflat], 0.0)
                      for p in planes])
    return lax.psum(vals, AX)


# ---------------------------------------------------------------------------
# Fast guided filter + dehaze chain
# ---------------------------------------------------------------------------


def _box_rows_sharded(stack, ry: int, rx: int, rows_out: int):
    """Mean over a (ry rows x rx cols) window of (rows, C, W) row-sharded
    planes, cv2 REFLECT_101 borders — the box_filter kernel with the row
    pad coming from a halo exchange."""
    h = ry
    ext = _halo(stack, h)                       # (rows + 2h, C, W)
    pxl, pxh = rx // 2, rx - 1 - rx // 2
    ext = jnp.pad(ext, ((0, 0), (0, 0), (pxl, pxh)), mode="reflect")
    s = _window_sum(_window_sum(ext, ry, 0), rx, 2)
    start = h - ry // 2
    return lax.dynamic_slice_in_dim(s, start, rows_out, axis=0) / float(ry * rx)


def _guided_fast_sharded_strip(I, p, r: int, eps: float, s: int = 4,
                               valid_to: int | None = None):
    """ops.guided.guided_filter_fast on row shards whose height is NOT a
    multiple of the subsample stride (e.g. 2160 rows / 8 devices = 270).

    Local stride-s slicing would put each shard on a different grid than
    the global one the single-device filter uses; instead each shard
    REBUILDS its span of the global coarse grid (plus the two box-pass
    margins) by gathering fine halo rows at traced offsets, runs the two
    valid-window box passes locally, and gathers the REFLECT_101-remapped
    coarse rows between passes — exactly the rows the single-device
    box_filter's reflect pad reads.  Every window therefore sees the same
    values in the same summation order as ops.guided.guided_filter_fast:
    the result is BIT-EQUAL for any shard height (test_six_spatial)."""
    Hl, W = I.shape
    n = lax.axis_size(AX)
    # coarse grid of the TRUE frame: on a pad-aligned frame (valid_to set)
    # this makes every window read exactly the rows the single-device
    # filter reads — pad rows never enter the linear model
    H = Hl * n if valid_to is None else valid_to
    Hc = -(-H // s)                     # global coarse rows
    rs = max(r // s, 2)
    Kc = (Hl - 1) // s + 2              # coarse rows spanning one shard
    M1 = rs                             # a/b margin beyond the span
    K1 = Kc + 2 * M1                    # pass-1 output rows
    K0 = K1 + rs - 1                    # strip input rows
    hf = (M1 + rs + 1) * s              # fine halo reach

    s0 = lax.axis_index(AX) * Hl
    c_lo = s0 // s
    base1 = c_lo - M1                   # coarse row of pass-1 output 0
    base0 = base1 - (rs // 2)           # coarse row of strip input 0

    def remap(c):                       # REFLECT_101 on the coarse grid
        c = jnp.abs(c)
        return jnp.where(c > Hc - 1, 2 * (Hc - 1) - c, c)

    pxl, pxh = r // 2, r - 1 - r // 2

    ext = _halo(jnp.stack([I, p], axis=1), hf)          # (Hl + 2hf, 2, W)
    gfine = remap(base0 + jnp.arange(K0, dtype=jnp.int32)) * s
    strip = ext[jnp.clip(gfine - (s0 - hf), 0, Hl + 2 * hf - 1)]
    Is, ps = strip[:, 0], strip[:, 1]
    st = jnp.stack([Is, ps, Is * ps, Is * Is], axis=1)  # (K0, 4, W)
    stp = jnp.pad(st, ((0, 0), (0, 0), (pxl, pxh)), mode="reflect")
    m1 = _window_sum(_window_sum(stp, rs, 0), r, 2) / float(rs * r)
    mean_i, mean_p = m1[:, 0], m1[:, 1]
    cov = m1[:, 2] - mean_i * mean_p
    var = m1[:, 3] - mean_i * mean_i
    a = cov / (var + eps)
    b = mean_p - a * mean_i             # rows j ↔ coarse base1 + j

    K2 = Kc + rs - 1
    gc2 = (c_lo - rs // 2) + jnp.arange(K2, dtype=jnp.int32)
    ab = jnp.stack([a, b], axis=1)
    strip2 = ab[jnp.clip(remap(gc2) - base1, 0, K1 - 1)]
    s2p = jnp.pad(strip2, ((0, 0), (0, 0), (pxl, pxh)), mode="reflect")
    m2 = _window_sum(_window_sum(s2p, rs, 0), r, 2) / float(rs * r)

    # pad rows (global row >= H) clip onto the last true coarse row; their
    # values are cropped away by the caller
    ci = jnp.clip((s0 + jnp.arange(Hl, dtype=jnp.int32)) // s - c_lo,
                  0, Kc - 1)
    up = m2[ci]                          # (Hl, 2, W)
    return up[:, 0] * I + up[:, 1]


def _guided_fast_sharded(I, p, r: int, eps: float, s: int = 4,
                         valid_to: int | None = None):
    """ops.guided.guided_filter_fast on row shards: subsample rows locally
    (global stride alignment guaranteed when Hl % s == 0; otherwise — or
    on a pad-aligned frame — the strip variant rebuilds the TRUE frame's
    global grid, still bit-equal), box the linear model on the subsampled
    grid with halo'd windows, repeat-upsample locally."""
    Hl = I.shape[0]
    if Hl % s != 0 or valid_to is not None:
        return _guided_fast_sharded_strip(I, p, r, eps, s, valid_to)
    Is, ps = I[::s], p[::s]
    rs = max(r // s, 2)
    st = jnp.stack([Is, ps, Is * ps, Is * Is], axis=1)  # (hs, 4, W)
    m = _box_rows_sharded(st, rs, r, Is.shape[0])
    mean_i, mean_p = m[:, 0], m[:, 1]
    cov = m[:, 2] - mean_i * mean_p
    var = m[:, 3] - mean_i * mean_i
    a = cov / (var + eps)
    b = mean_p - a * mean_i
    mab = _box_rows_sharded(jnp.stack([a, b], axis=1), rs, r, a.shape[0])
    up = jnp.repeat(mab, s, axis=0)[:Hl]
    return up[:, 0] * I + up[:, 1]


def _restore_sharded(planes, A, omega, r: int, eps: float,
                     valid_to: int | None = None):
    dark = jnp.minimum(
        jnp.minimum(planes[0] / (A[0] + 1e-6), planes[1] / (A[1] + 1e-6)),
        planes[2] / (A[2] + 1e-6))
    t = jnp.clip(1.0 - omega * dark, 0.1, 1.0)
    gray = cs.u8_to_unit(cs.gray_u8_planes(*(cs.quantize_u8(p)
                                             for p in planes)))
    t = jnp.clip(_guided_fast_sharded(gray, t, r, eps, valid_to=valid_to),
                 0.1, 1.0)
    return tuple(jnp.clip((p - A[c]) / t + A[c], 0.0, 1.0)
                 for c, p in enumerate(planes))


# ---------------------------------------------------------------------------
# CLAHE-LAB roundtrip (tile rows per shard; LUT all_gather)
# ---------------------------------------------------------------------------


def _clahe_rows_sharded(xb, clip_limit: float, tiles: int, D: int,
                        H: int, W: int):
    """ops.histeq.clahe_u8 on whole-tile-row shards: local tile LUTs, one
    all_gather, local bilinear interpolation — bit-identical to the
    single-device op (same construction as parallel.spatial.clahe_spatial)."""
    th, tw = H // tiles, W // tiles
    ty_local = tiles // D
    pt, plf = th // 2, tw // 2
    f32 = np.float32
    tyf = (np.arange(H, dtype=f32) * f32(1.0 / th) - f32(0.5)).astype(f32)
    txf = (np.arange(W, dtype=f32) * f32(1.0 / tw) - f32(0.5)).astype(f32)
    ya_np = (tyf - np.floor(tyf)).astype(f32)
    xa_np = (txf - np.floor(txf)).astype(f32)

    Hl = xb.shape[0]
    dev = lax.axis_index(AX)
    ya_b = lax.dynamic_slice_in_dim(jnp.asarray(ya_np), dev * Hl, Hl)
    ya1_b = lax.dynamic_slice_in_dim(
        jnp.asarray((f32(1.0) - ya_np).astype(f32)), dev * Hl, Hl)
    xa_r = jnp.asarray(xa_np)
    xa1_r = jnp.asarray((f32(1.0) - xa_np).astype(f32))

    tiles_loc = (
        xb.reshape(ty_local, th, tiles, tw)
        .transpose(0, 2, 1, 3)
        .reshape(ty_local * tiles, th * tw)
    )
    luts_loc = _clahe_luts(tiles_loc, th * tw, clip_limit)
    luts_full = lax.all_gather(luts_loc, AX).reshape(tiles * tiles, 256)

    row_sizes = [th - pt] + [th] * (ty_local - 1) + [pt]
    col_sizes = [tw - plf] + [tw] * (tiles - 1) + [plf]
    bins = jnp.arange(256, dtype=jnp.int32)
    bar = jax.lax.optimization_barrier

    out_rows = []
    row0 = 0
    for si, sz in enumerate(row_sizes):
        band = dev * ty_local + si
        r1 = jnp.clip(band - 1, 0, tiles - 1)
        r2 = jnp.clip(band, 0, tiles - 1)
        seg = lax.slice_in_dim(xb, row0, row0 + sz, axis=0)
        cols = []
        col0 = 0
        for csi, csz in enumerate(col_sizes):
            c1 = min(max(csi - 1, 0), tiles - 1)
            c2 = min(csi, tiles - 1)
            vals = lax.slice_in_dim(seg, col0, col0 + csz, axis=1)
            flat = vals.reshape(-1)
            ids4 = jnp.stack([r1 * tiles + c1, r1 * tiles + c2,
                              r2 * tiles + c1, r2 * tiles + c2])
            l4 = luts_full[ids4]
            oh = (flat[:, None] == bins[None, :]).astype(jnp.bfloat16)
            mapped = jax.lax.dot_general(
                oh, l4.astype(jnp.bfloat16).T,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            cols.append(mapped.reshape(sz, csz, 4))
            col0 += csz
        out_rows.append(jnp.concatenate(cols, axis=1))
        row0 += sz
    mapped = jnp.concatenate(out_rows, axis=0)

    xa = xa_r[None, :]
    xa1 = xa1_r[None, :]
    ya = ya_b[:, None]
    ya1 = ya1_b[:, None]
    top = bar(bar(mapped[..., 0] * xa1) + bar(mapped[..., 1] * xa))
    bot = bar(bar(mapped[..., 2] * xa1) + bar(mapped[..., 3] * xa))
    v = bar(top * ya1) + bar(bot * ya)
    return jnp.clip(jnp.rint(v), 0, 255).astype(jnp.int32)


def _clahe_lab_sharded(planes, clip_limit: float, tiles: int, D: int,
                       H: int, W: int):
    L, a, b = cs.rgb_to_lab_u8_exact_planes(
        *(cs.quantize_u8(p) for p in planes))
    L = _clahe_rows_sharded(L, clip_limit, tiles, D, H, W)
    rgb = cs.lab_to_rgb_u8_exact_planes(L, a, b)
    return tuple(cs.u8_to_unit(c) for c in rgb)


# ---------------------------------------------------------------------------
# The six strategies + public entry
# ---------------------------------------------------------------------------


def _pad_rows_reflect101(img: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Append `pad` REFLECT_101 rows (cv2 BORDER_DEFAULT — also what cv2's
    CLAHE uses internally to reach tile multiples) at the bottom."""
    if pad == 0:
        return img
    H = img.shape[0]
    assert pad < H, f"row pad {pad} >= frame height {H}"
    return jnp.concatenate([img, img[H - 1 - pad:H - 1][::-1]], axis=0)


def six_strategy_spatial(img: jnp.ndarray, mesh: Mesh, tiles: int = 8):
    """All six strategies of one (H, W, 3) frame row-sharded over `mesh`.

    Returns ((6, H, W, 3) sharded on rows, cast code) matching
    pipeline/enhance.six_strategy_single(img, fast=True) semantics
    (six_stadigy.py:330-530's per-image body).

    Any H works (VERDICT r4 #4): when H isn't divisible by lcm(mesh, tiles)
    the frame is REFLECT_101-row-padded to the next multiple, computed, and
    cropped — global reductions (percentiles, cast means, Canny hysteresis,
    the airlight SAT/argmax) mask the pad rows out exactly, so only the
    windowed ops (guided filter, CLAHE tile histograms when H % tiles != 0)
    see boundary approximation, gated >=50 dB in tests/test_six_spatial.py.
    On divisible-but-misaligned shapes (e.g. 2160 rows / 8 devices = 270,
    not a multiple of the stride-8 percentile grid) no padding happens at
    all: the percentile subsample switches to the masked global-grid
    selection, which is still BIT-EQUAL to the single-device fast path.

    W must be divisible by `tiles` and `tiles` by the mesh size."""
    import math

    H, W, _ = img.shape
    D = mesh.devices.size
    assert W % tiles == 0 and tiles % D == 0, (
        "needs W % tiles == 0 and whole CLAHE tile rows per device")
    align = math.lcm(D, tiles)
    Hp = -(-H // align) * align
    img = _pad_rows_reflect101(img, Hp - H)
    outs, code = _six_spatial_padded(img, mesh, tiles,
                                     H if Hp != H else None)
    if Hp != H:
        outs = outs[:, :H]
    return outs, code


@partial(jax.jit, static_argnames=("mesh", "tiles", "valid_h"))
def _six_spatial_padded(img: jnp.ndarray, mesh: Mesh, tiles: int,
                        valid_h: int | None):
    """The sharded six program on an alignment-padded frame; valid_h is the
    TRUE height (None = no padding).  Percentiles/CLAHE are bit-equal to
    the single-device fast path on unpadded frames; Canny is bit-equal by
    the halo + valid-rows argument; airlight SAT corners and the cast
    means psum partial f32 sums, whose last-bit association may differ."""
    H, W, _ = img.shape
    D = mesh.devices.size
    Ht = H if valid_h is None else valid_h  # true (unpadded) height
    # stride-8 row subsample count for percentiles: rows on the global
    # stride grid BELOW the true height (matches ops.stretch's ch[::8])
    n_sub = (-(-Ht // 8)) * W

    def local(block):
        planes = tuple(block[..., c] for c in range(3))
        # cast detect/correct (six_stadigy.py:292-323): global channel means
        # over the TRUE rows only (pad rows masked)
        if valid_h is None:
            sums = [jnp.sum(p) for p in planes]
        else:
            Hl = block.shape[0]
            gr = lax.axis_index(AX) * Hl + jnp.arange(Hl, dtype=jnp.int32)
            vmask = (gr < valid_h)[:, None]
            sums = [jnp.sum(jnp.where(vmask, p, 0.0)) for p in planes]
        means = jnp.stack([lax.psum(s, AX) / float(Ht * W) for s in sums])
        r_m, g_m, b_m = means[0], means[1], means[2]
        greenish = (g_m > r_m) & (g_m > b_m) & ((g_m - r_m) > 0.05)
        bluish = (b_m > r_m) & (b_m > g_m) & ((b_m - r_m) > 0.05)
        code = jnp.where(greenish, 1, jnp.where(bluish, 2, 0)).astype(
            jnp.int32)
        scale = jnp.stack([
            jnp.float32(1.0),
            jnp.where(code == 1, 0.85, 1.0),
            jnp.where(code == 2, 0.85, 1.0),
        ])
        planes = tuple(jnp.clip(p * scale[c], 0.0, 1.0)
                       for c, p in enumerate(planes))

        A = _airlight_sharded(planes, Ht, W, valid_to=valid_h)

        def st(p, lo, hi):
            return _stretch_planes(p, lo, hi, n_sub, valid_to=valid_h)

        def wb(p, pct):
            return _wb_planes(p, pct, n_sub, valid_to=valid_h)

        def cl(p, c):
            return _clahe_lab_sharded(p, c, tiles, D, H, W)

        def gm(p, g):
            return tuple(gamma_correction_pow(c, g) for c in p)

        def rst(omega, r, eps):
            return _restore_sharded(planes, A, omega, r, eps,
                                    valid_to=valid_h)

        s1 = gm(cl(st(rst(0.3, 20, 5e-1), 5.0, 98.0), 3.0), 1.5)
        s2 = cl(st(rst(0.5, 15, 5e-1), 15.0, 95.0), 2.0)
        s3 = wb(st(rst(0.7, 10, 1e-1), 20.0, 85.0), 2.0)
        s4 = gm(wb(st(cl(planes, 4.0), 10.0, 95.0), 3.0), 1.3)
        s5 = gm(cl(st(wb(planes, 2.0), 15.0, 90.0), 1.5), 1.2)
        s6 = gm(cl(st(planes, 5.0, 98.0), 3.5), 1.4)

        outs = jnp.stack([jnp.stack(s, axis=-1)
                          for s in (s1, s2, s3, s4, s5, s6)])
        return outs, code

    return shard_map(
        local, mesh=mesh,
        in_specs=P(AX, None, None),
        out_specs=(P(None, AX, None, None), P()),
        check_rep=False,
    )(img)
