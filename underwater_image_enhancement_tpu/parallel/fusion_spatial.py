"""Ancuti multi-scale fusion for ONE huge frame sharded across chips.

Completes the spatial story (with six_spatial.py): the pyramid blend's
compute is dominated by the FINE level (3/4 of all pixels live in G0/L0),
so that level runs row-sharded with 2-row `ppermute` halos for the 5-tap
binomial blur, while everything from the half-resolution level down is
`all_gather`'d once and computed replicated (G1 of 2 inputs x 3 channels
+ 2 weight maps = 8 half-res planes — the only bulk collective).  The
final collapse upsamples the replicated half-res reconstruction back into
each shard with a 1-coarse-row halo sliced straight from the replicated
array; reflecting that halo at the COARSE level then zero-interleaving
reproduces pyr_up's fine-level REFLECT_101 border exactly (fine pad rows
(-1, -2) are (zero, coarse row 1) in both constructions).

Pipeline mirrors pipeline/fusion.ancuti_fusion: gray-world WB (psum
channel means) + sharded CLAHE-LAB roundtrip as the two fusion inputs,
Laplacian-contrast + saturation + saliency weight maps (psum means),
normalized blend over Gaussian/Laplacian pyramids.  Gated vs the
single-device program in tests/test_six_spatial.py.

Shape requirements: W % tiles == 0, tiles % D == 0 (the CLAHE input).
Any height works — frames are REFLECT_101-row-padded to the next multiple
of lcm(2*D, tiles) and cropped after, with the global means masking the
pad rows exactly (see ancuti_fusion_spatial).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from underwater_image_enhancement_tpu.ops import pyramid
from underwater_image_enhancement_tpu.ops.edges import laplacian
from underwater_image_enhancement_tpu.parallel.mesh import DATA_AXIS
from underwater_image_enhancement_tpu.parallel.six_spatial import (
    _clahe_lab_sharded, _halo)
from underwater_image_enhancement_tpu.pipeline.fusion import (
    _W_EPS, _fusion_levels, _lab_float)

AX = DATA_AXIS


def _psum_mean(x: jnp.ndarray, n: int, vmask=None):
    """Global mean over n TRUE pixels; vmask masks alignment-pad rows."""
    s = jnp.sum(x) if vmask is None else jnp.sum(jnp.where(vmask, x, 0.0))
    return lax.psum(s, AX) / float(n)


def _blur5_sharded(x: jnp.ndarray) -> jnp.ndarray:
    """5x5 binomial blur of row-sharded (rows, ..., W) planes; identical
    term order to ops.pyramid.blur5, REFLECT_101 at the globe edges via
    the halo remap."""
    ext = _halo(x, 2)
    b = pyramid._blur5_axis(ext, 0)
    b = pyramid._blur5_axis(b, x.ndim - 1)
    return b[2:-2]


def _pyr_down_sharded(x: jnp.ndarray) -> jnp.ndarray:
    """pyr_down keeping local rows aligned to the global even grid (shard
    heights are even, so local row 0 is globally even)."""
    b = _blur5_sharded(x)
    return pyramid._even_cols(b[::2])


def _pyr_up_rows(coarse_rows: jnp.ndarray, dst_h: int, dst_w: int):
    """pyr_up of a (hc + 2, Wc) coarse block carrying a 1-row halo on each
    side -> the (dst_h, dst_w) center rows."""
    up = pyramid._interleave_zeros(coarse_rows, 0)     # (dst_h + 4, Wc*2)
    up = pyramid._interleave_zeros(up, 1)[:, :dst_w]
    b = pyramid._blur5_axis(pyramid._blur5_axis(up, 0, 4.0), 1)
    return b[2:-2]


def _coarse_rows_with_halo(rep: jnp.ndarray, c0, hc: int):
    """Rows [c0-1, c0+hc+1) of a REPLICATED coarse plane with the globe
    borders that reproduce pyr_up's FINE-level REFLECT_101 after
    zero-interleaving: the top coarse halo row is the reflect (fine pad
    row -2 = fine row 2 = coarse row 1) but the bottom is the EDGE
    replicate — fine pad row H reflects to fine row H-2 = coarse Hc-1,
    the last coarse row itself, because the skipped fine row H-1 is a
    zero slot.  (A symmetric reflect here left the bottom two output rows
    ~2e-3 off the single-device fusion.)"""
    padded = jnp.concatenate([rep[1:2], rep, rep[-1:]], axis=0)
    return lax.dynamic_slice_in_dim(padded, c0, hc + 2, axis=0)


def _weight_map_sharded(p, H: int, W: int, vmask=None):
    """pipeline.fusion._weight_maps with halo'd blurs and psum'd means.
    H is the TRUE frame height; vmask masks pad rows out of the means."""
    n = H * W
    lum = 0.299 * p[0] + 0.587 * p[1] + 0.114 * p[2]
    w_contrast = jnp.abs(laplacian(_halo(lum, 1), ksize=1))[1:-1]
    w_sat = jnp.sqrt(((p[0] - lum) ** 2 + (p[1] - lum) ** 2
                      + (p[2] - lum) ** 2) / 3.0)
    L, a, b = _lab_float(p)
    Lb = _blur5_sharded(L)
    ab_ = _blur5_sharded(a)
    bb = _blur5_sharded(b)
    w_sal = jnp.sqrt((Lb - _psum_mean(L, n, vmask)) ** 2
                     + (ab_ - _psum_mean(a, n, vmask)) ** 2
                     + (bb - _psum_mean(b, n, vmask)) ** 2)
    return w_contrast + w_sat + w_sal / 100.0


def ancuti_fusion_spatial(img: jnp.ndarray, mesh: Mesh,
                          tiles: int = 8) -> jnp.ndarray:
    """pipeline.fusion.ancuti_fusion of one (H, W, 3) row-sharded frame.

    Any H works (VERDICT r4 #4): frames whose height doesn't divide into
    even whole-tile shard rows are REFLECT_101-row-padded to the next
    multiple of lcm(2*mesh, tiles), computed, and cropped — the WB and
    saliency means mask the pad rows exactly.  When the pad target equals
    cv2's own CLAHE tile pad (tiles * ceil(H / tiles)) the result sits at
    float noise vs single-device (measured 101.9 dB at H=122); when the
    even-shard requirement overshoots it (H already tile-divisible but
    odd shard rows, e.g. 120 -> 128) the sharded CLAHE legitimately runs
    a one-row-coarser tile grid — a valid fusion of the same frame,
    gated loosely (tests/test_six_spatial.py::test_fusion_spatial_row_padded)."""
    import math

    from underwater_image_enhancement_tpu.parallel.six_spatial import (
        _pad_rows_reflect101,
    )

    H, W, _ = img.shape
    D = mesh.devices.size
    assert W % tiles == 0 and tiles % D == 0
    align = math.lcm(2 * D, tiles)
    Hp = -(-H // align) * align
    img = _pad_rows_reflect101(img, Hp - H)
    out = _fusion_spatial_padded(img, mesh, tiles, H if Hp != H else None)
    return out[:H] if Hp != H else out


@partial(jax.jit, static_argnames=("mesh", "tiles", "valid_h"))
def _fusion_spatial_padded(img: jnp.ndarray, mesh: Mesh, tiles: int,
                           valid_h: int | None) -> jnp.ndarray:
    H, W, _ = img.shape
    D = mesh.devices.size
    Ht = H if valid_h is None else valid_h  # true (unpadded) height
    levels = _fusion_levels(Ht, W)          # level count of the TRUE frame
    Hl = H // D

    def local(block):
        p = tuple(block[..., c] for c in range(3))
        if valid_h is None:
            vmask = None
        else:
            gr = lax.axis_index(AX) * Hl + jnp.arange(Hl, dtype=jnp.int32)
            vmask = (gr < valid_h)[:, None]
        # gray-world WB: psum channel means (pipeline/fusion.py:38-52)
        means = [_psum_mean(c, Ht * W, vmask) for c in p]
        gray = (means[0] + means[1] + means[2]) / 3.0
        wb = tuple(jnp.clip(c * gray / jnp.maximum(m, 1e-6), 0.0, 1.0)
                   for c, m in zip(p, means))
        cl = _clahe_lab_sharded(wb, 2.0, tiles, D, H, W)

        w1 = _weight_map_sharded(wb, Ht, W, vmask)
        w2 = _weight_map_sharded(cl, Ht, W, vmask)
        norm = w1 + w2 + 2.0 * _W_EPS
        w1n = (w1 + _W_EPS) / norm
        w2n = (w2 + _W_EPS) / norm

        if levels == 1:
            # single-level blend degenerates to a weighted average (the
            # single-device blend_pyramids with levels=1); no pyramids
            out = jnp.stack(
                [w1n * wb[c] + w2n * cl[c] for c in range(3)], axis=-1)
            return jnp.clip(out, 0.0, 1.0)

        # 8 fine planes rows-first: 2 inputs x 3 channels + 2 weights
        fine = jnp.stack(list(wb) + list(cl) + [w1n, w2n], axis=1)
        g1_loc = _pyr_down_sharded(fine)             # (Hl/2, 8, Wc)
        g1 = lax.all_gather(g1_loc, AX, axis=0, tiled=True)  # (Hc, 8, Wc)

        dev = lax.axis_index(AX)
        hc = Hl // 2
        c0 = dev * hc

        def up0(coarse):                             # (Hc, Wc) replicated
            return _pyr_up_rows(_coarse_rows_with_halo(coarse, c0, hc),
                                Hl, W)

        lap0 = [fine[:, k] - up0(g1[:, k]) for k in range(6)]
        blend0 = [w1n * lap0[c] + w2n * lap0[3 + c] for c in range(3)]

        # coarse levels: replicated single-device math on the gathered G1s
        w_pyrs = [pyramid.gaussian_pyramid(g1[:, 6 + k], levels - 1)
                  for k in range(2)]
        i_pyrs = [
            pyramid.laplacian_pyramid(
                jnp.moveaxis(g1[:, 3 * k:3 * k + 3], 1, 0), levels - 1)
            for k in range(2)
        ]
        fused = [
            sum(w_pyrs[k][lvl][None] * i_pyrs[k][lvl] for k in range(2))
            for lvl in range(levels - 1)
        ]
        rec1 = pyramid.reconstruct(fused)            # (3, Hc, Wc) replicated

        out = jnp.stack(
            [blend0[c] + up0(rec1[c]) for c in range(3)], axis=-1)
        return jnp.clip(out, 0.0, 1.0)

    return shard_map(
        local, mesh=mesh,
        in_specs=P(AX, None, None),
        out_specs=P(AX, None, None),
        check_rep=False,
    )(img)
