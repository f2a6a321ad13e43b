"""Spatial (single-frame) sharding — the "long-context" analog.

The reference handles big frames only by downscaling (SURVEY.md §5); here a
single large frame is sharded across chips on the row axis via shard_map:

- ``box_filter_spatial``: windowed mean with HALO EXCHANGE — each shard
  ppermutes its boundary rows to neighbors, filters locally, crops.  This is
  the CLAHE/guided-filter neighborhood pattern on a mesh.
- ``stretch_spatial``: global per-channel percentile stretch where each
  shard histograms its rows and a ``psum`` over the mesh axis yields the
  global CDF — no full-frame gather ever happens.
- ``enhance_spatial``: the predictor-style enhance() (stretch -> A=0.6
  dehaze -> gamma) for a frame too large for one chip's HBM.

All collectives ride the mesh axis (ICI when the mesh maps to it).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from underwater_image_enhancement_tpu.parallel.mesh import DATA_AXIS


def _exchange_halo(block: jnp.ndarray, halo: int, axis_name: str,
                   edge: str = "reflect101") -> jnp.ndarray:
    """Concatenate `halo` rows from neighboring shards onto this one,
    multi-hop when the halo exceeds the shard height (each hop ppermutes a
    full block from a farther neighbor).  Global edges synthesize their
    rows locally via a uniform row remap after assembly: 'reflect101'
    mirrors rows [1..halo] (numpy reflect / cv2 BORDER_DEFAULT), 'edge'
    replicates row 0 / row -1 (cv2 REPLICATE)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    Hl = block.shape[0]
    hops = -(-halo // Hl)
    parts = [lax.ppermute(block, axis_name,
                          [(i, (i + k) % n) for i in range(n)])
             for k in range(hops, 0, -1)]
    parts.append(block)
    parts += [lax.ppermute(block, axis_name,
                           [(i, (i - k) % n) for i in range(n)])
              for k in range(1, hops + 1)]
    ext = jnp.concatenate(parts, axis=0)
    start = hops * Hl - halo
    ext = lax.slice_in_dim(ext, start, start + Hl + 2 * halo, axis=0)
    # rows beyond [0, H) hold ring-wrapped data; remap them to their
    # reflected/replicated in-globe source (always inside this extension)
    Hg = Hl * n
    s0 = idx * Hl
    grow = s0 - halo + jnp.arange(Hl + 2 * halo, dtype=jnp.int32)
    if edge == "edge":
        src_g = jnp.clip(grow, 0, Hg - 1)
    else:
        src_g = jnp.where(grow < 0, -grow,
                          jnp.where(grow > Hg - 1, 2 * (Hg - 1) - grow,
                                    grow))
    src_p = jnp.clip(src_g - s0 + halo, 0, Hl + 2 * halo - 1)
    return ext[src_p]


def box_filter_spatial(x: jnp.ndarray, r: int, mesh: Mesh) -> jnp.ndarray:
    """cv2-compatible box filter of a (H, W) frame sharded on rows.

    Requires H divisible by the mesh size and shard height > r."""
    from underwater_image_enhancement_tpu.ops.boxfilter import _window_sum

    halo = r  # covers the r//2 + (r-1-r//2) window reach with margin

    def local(block):
        withhalo = _exchange_halo(block, halo, DATA_AXIS)
        # columns: pad locally (full width present)
        pad_lo = r // 2
        pad_hi = r - 1 - r // 2
        wp = jnp.pad(withhalo, ((0, 0), (pad_lo, pad_hi)), mode="reflect")
        s = _window_sum(_window_sum(wp, r, 0), r, 1) / float(r * r)
        # window_sum over rows consumed (rows_in - r + 1); recover our span
        start = halo - pad_lo
        return lax.dynamic_slice_in_dim(s, start, block.shape[0], axis=0)

    return shard_map(
        local, mesh=mesh,
        in_specs=P(DATA_AXIS, None),
        out_specs=P(DATA_AXIS, None),
    )(x)


_BINS = 4096


def _quantile_from_hist(hist: jnp.ndarray, vmin, vmax, q, n):
    cdf = jnp.cumsum(hist)
    target = q / 100.0 * (n - 1) + 1.0
    b = jnp.clip(jnp.searchsorted(cdf, target), 0, _BINS - 1)
    return vmin + b.astype(jnp.float32) * (vmax - vmin) / (_BINS - 1)


def stretch_spatial(img: jnp.ndarray, l_low: float, l_high: float,
                    mesh: Mesh) -> jnp.ndarray:
    """Percentile stretch of a (H, W, 3) frame sharded on rows; global
    percentiles via psum'd histograms (approximate to 1/4096 of the range,
    same fast path as ops.stretch method='hist')."""
    H = img.shape[0]

    def local(block):
        out = []
        for c in range(3):
            ch = block[..., c]
            lo_all = lax.pmin(jnp.min(ch), DATA_AXIS)
            hi_all = lax.pmax(jnp.max(ch), DATA_AXIS)
            scale = jnp.where(hi_all > lo_all, (_BINS - 1) / (hi_all - lo_all), 0.0)
            idx = jnp.clip((ch - lo_all) * scale, 0, _BINS - 1).astype(jnp.int32)
            bins = jnp.arange(_BINS, dtype=jnp.int32)
            hist = jnp.sum(idx.reshape(-1)[None, :] == bins[:, None], axis=1
                           ).astype(jnp.float32)
            hist = lax.psum(hist, DATA_AXIS)
            n = H * img.shape[1]
            p_lo = _quantile_from_hist(hist, lo_all, hi_all, l_low, n)
            p_hi = _quantile_from_hist(hist, lo_all, hi_all, l_high, n)
            out.append(jnp.clip((ch - p_lo) / (p_hi - p_lo + 1e-8), 0.0, 1.0))
        return jnp.stack(out, axis=-1)

    return shard_map(
        local, mesh=mesh,
        in_specs=P(DATA_AXIS, None, None),
        out_specs=P(DATA_AXIS, None, None),
    )(img)


def enhance_spatial(img: jnp.ndarray, params: Dict[str, float],
                    mesh: Mesh) -> jnp.ndarray:
    """Predictor-style enhance() for one huge frame sharded across chips:
    global-percentile stretch + A=0.6 dehaze + gamma (vgg_16_UIE.py:32-55
    semantics with the histogram percentile fast path)."""
    out = stretch_spatial(img, float(params["L_low"]), float(params["L_high"]),
                          mesh)

    def local(block):
        dark = jnp.min(block, axis=-1, keepdims=True)
        t = jnp.clip(1.0 - params["omega"] * dark, 0.1, 1.0)
        dehazed = jnp.clip((block - 0.6) / t + 0.6, 0.0, 1.0)
        return jnp.clip(jnp.power(dehazed + 1e-8, params["gamma"]), 0.0, 1.0)

    return shard_map(
        local, mesh=mesh,
        in_specs=P(DATA_AXIS, None, None),
        out_specs=P(DATA_AXIS, None, None),
    )(out)


def guided_filter_spatial(guide: jnp.ndarray, src: jnp.ndarray, r: int,
                          eps: float, mesh: Mesh) -> jnp.ndarray:
    """He et al. guided filter of one (H, W) frame sharded on rows.

    Two halo exchanges (one per box-filter stage); matches the single-device
    ops.guided.guided_filter numerically.  Requires shard height > 2r."""
    from underwater_image_enhancement_tpu.ops.boxfilter import _window_sum

    halo = r

    def _box_local(stack, h_rows):
        # stack: (C, rows_with_halo, W); mean filter valid over the halo'd rows
        pad_lo = r // 2
        pad_hi = r - 1 - r // 2
        wp = jnp.pad(stack, ((0, 0), (0, 0), (pad_lo, pad_hi)), mode="reflect")
        s = _window_sum(_window_sum(wp, r, 1), r, 2) / float(r * r)
        start = halo - pad_lo
        return lax.dynamic_slice_in_dim(s, start, h_rows, axis=1)

    def local(g_blk, p_blk):
        h_rows = g_blk.shape[0]
        gh = _exchange_halo(g_blk, halo, DATA_AXIS)
        ph = _exchange_halo(p_blk, halo, DATA_AXIS)
        m = _box_local(jnp.stack([gh, ph, gh * ph, gh * gh]), h_rows)
        mean_i, mean_p, mean_ip, mean_ii = m[0], m[1], m[2], m[3]
        cov = mean_ip - mean_i * mean_p
        var = mean_ii - mean_i * mean_i
        a = cov / (var + eps)
        b = mean_p - a * mean_i
        ah = _exchange_halo(a, halo, DATA_AXIS)
        bh = _exchange_halo(b, halo, DATA_AXIS)
        mab = _box_local(jnp.stack([ah, bh]), h_rows)
        return mab[0] * g_blk + mab[1]

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        out_specs=P(DATA_AXIS, None),
    )(guide, src)


def clahe_spatial(channel_u8: jnp.ndarray, clip_limit: float,
                  mesh: Mesh, tiles: int = 8) -> jnp.ndarray:
    """CLAHE of one (H, W) uint8-valued plane sharded on tile rows.

    The CLAHE tile structure maps naturally onto a row mesh (SURVEY.md §5):
    each device histograms and clips its OWN tile rows, one tiny
    ``all_gather`` shares the (tiles x tiles, 256) LUT set, and the bilinear
    LUT interpolation is then fully local (a pixel only ever reads LUTs of
    its 4 surrounding tiles).  Interpolation weights come in as host-exact
    fp32 rows sharded with the image, so the result is BIT-IDENTICAL to the
    single-device ops.histeq.clahe_u8.

    Requires H, W divisible by ``tiles`` and ``tiles`` divisible by the mesh
    size (shard = whole tile rows).
    """
    import numpy as _np

    from underwater_image_enhancement_tpu.ops.histeq import _clahe_luts

    H, W = channel_u8.shape
    D = mesh.devices.size
    assert H % tiles == 0 and W % tiles == 0 and tiles % D == 0, (
        "clahe_spatial needs tile-aligned sharding")
    th, tw = H // tiles, W // tiles
    ty_local = tiles // D
    pt, plf = th // 2, tw // 2

    f32 = _np.float32
    tyf = (_np.arange(H, dtype=f32) * f32(1.0 / th) - f32(0.5)).astype(f32)
    txf = (_np.arange(W, dtype=f32) * f32(1.0 / tw) - f32(0.5)).astype(f32)
    ya_np = (tyf - _np.floor(tyf)).astype(f32)
    xa_np = (txf - _np.floor(txf)).astype(f32)
    ya1_np = (f32(1.0) - ya_np).astype(f32)
    xa1_np = (f32(1.0) - xa_np).astype(f32)

    row_sizes = [th - pt] + [th] * (ty_local - 1) + [pt]
    col_sizes = [tw - plf] + [tw] * (tiles - 1) + [plf]
    bins = jnp.arange(256, dtype=jnp.int32)
    bar = jax.lax.optimization_barrier

    def local(xb, ya_b, ya1_b, xa_r, xa1_r):
        tiles_loc = (
            xb.reshape(ty_local, th, tiles, tw)
            .transpose(0, 2, 1, 3)
            .reshape(ty_local * tiles, th * tw)
        )
        luts_loc = _clahe_luts(tiles_loc, th * tw, clip_limit)
        luts_full = lax.all_gather(luts_loc, DATA_AXIS).reshape(
            tiles * tiles, 256)
        dev = lax.axis_index(DATA_AXIS)

        out_rows = []
        row0 = 0
        for s, sz in enumerate(row_sizes):
            band = dev * ty_local + s
            r1 = jnp.clip(band - 1, 0, tiles - 1)
            r2 = jnp.clip(band, 0, tiles - 1)
            seg = lax.slice_in_dim(xb, row0, row0 + sz, axis=0)
            cols = []
            col0 = 0
            for cs, csz in enumerate(col_sizes):
                c1 = min(max(cs - 1, 0), tiles - 1)
                c2 = min(cs, tiles - 1)
                vals = lax.slice_in_dim(seg, col0, col0 + csz, axis=1)
                flat = vals.reshape(-1)
                ids4 = jnp.stack([r1 * tiles + c1, r1 * tiles + c2,
                                  r2 * tiles + c1, r2 * tiles + c2])
                l4 = luts_full[ids4]  # (4, 256), tiny dynamic row gather
                oh = (flat[:, None] == bins[None, :]).astype(jnp.bfloat16)
                mapped = jax.lax.dot_general(
                    oh, l4.astype(jnp.bfloat16).T,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                cols.append(mapped.reshape(sz, csz, 4))
                col0 += csz
            out_rows.append(jnp.concatenate(cols, axis=1))
            row0 += sz
        mapped = jnp.concatenate(out_rows, axis=0)  # (Hl, W, 4)

        xa = xa_r[None, :]
        xa1 = xa1_r[None, :]
        ya = ya_b[:, None]
        ya1 = ya1_b[:, None]
        top = bar(bar(mapped[..., 0] * xa1) + bar(mapped[..., 1] * xa))
        bot = bar(bar(mapped[..., 2] * xa1) + bar(mapped[..., 3] * xa))
        v = bar(top * ya1) + bar(bot * ya)
        return jnp.clip(jnp.rint(v), 0, 255).astype(jnp.int32)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(DATA_AXIS, None), P(DATA_AXIS), P(DATA_AXIS),
                  P(None), P(None)),
        out_specs=P(DATA_AXIS, None),
    )(channel_u8,
      jnp.asarray(ya_np), jnp.asarray(ya1_np),
      jnp.asarray(xa_np), jnp.asarray(xa1_np))
