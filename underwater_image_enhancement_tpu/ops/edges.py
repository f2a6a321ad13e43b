"""Edge operators: Sobel, Laplacian, Canny — OpenCV-compatible, pure JAX.

Used by compute_Q (enhancement_strategies.py:180-183), the edge features
(feature_extraction.py:160-200) and the edge-density metric
(quality_assessment.py:125-147).

3x3 convolutions are implemented as 9 shifted adds on the VPU (cheaper and
layout-friendlier than lax.conv for single-channel planes).

Canny reproduces cv2.Canny(aperture 3, L1 gradient): Sobel with REPLICATE
border, integer sector-based non-maximum suppression (TG22 = 13573 / 2^15
fixed point, exact OpenCV tie-breaking), double threshold, and hysteresis by
iterated masked dilation.  Hysteresis is the one approximation: OpenCV flood-
fills unboundedly, we run a fixed number of dilation rounds (default 64) —
weak-edge chains longer than that stay unlit.  Canny feeds scores (edge
density), not pixels, so the tolerance is looser (SURVEY.md §7).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _shift(x: jnp.ndarray, dy: int, dx: int, mode: str) -> jnp.ndarray:
    """x shifted so that out[i,j] = x[i+dy, j+dx], border per ``mode``."""
    H, W = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    xp = jnp.pad(x, pad, mode=mode)
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(xp, 1 + dy, 1 + dy + H, axis=x.ndim - 2),
        1 + dx,
        1 + dx + W,
        axis=x.ndim - 1,
    )


def conv3x3(x: jnp.ndarray, kernel, mode: str = "reflect") -> jnp.ndarray:
    """Correlate x with a 3x3 kernel (list of lists), cv2 border semantics.

    mode: 'reflect' == BORDER_REFLECT_101 (cv2 default), 'edge' == REPLICATE.
    """
    out = None
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            k = kernel[dy + 1][dx + 1]
            if k == 0:
                continue
            term = _shift(x, dy, dx, mode) * k
            out = term if out is None else out + term
    return out


_SOBEL_X = [[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]]
_SOBEL_Y = [[-1, -2, -1], [0, 0, 0], [1, 2, 1]]
_LAP_K1 = [[0, 1, 0], [1, -4, 1], [0, 1, 0]]
_LAP_K3 = [[2, 0, 2], [0, -8, 0], [2, 0, 2]]


def sobel(x: jnp.ndarray, axis: str, mode: str = "reflect") -> jnp.ndarray:
    """cv2.Sobel(ksize=3) derivative along 'x' (cols) or 'y' (rows)."""
    return conv3x3(x, _SOBEL_X if axis == "x" else _SOBEL_Y, mode)


def laplacian(x: jnp.ndarray, ksize: int = 1) -> jnp.ndarray:
    """cv2.Laplacian: ksize=1 -> 4-neighbor kernel, ksize=3 -> [[2,0,2],...]."""
    return conv3x3(x, _LAP_K1 if ksize == 1 else _LAP_K3, "reflect")


def _dilate8(mask: jnp.ndarray) -> jnp.ndarray:
    """8-connected binary dilation (constant-0 border)."""
    out = mask
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            out = out | _shift_zero(mask, dy, dx)
    return out


def _shift_zero(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    H, W = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    xp = jnp.pad(x, pad, mode="constant")
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(xp, 1 + dy, 1 + dy + H, axis=x.ndim - 2),
        1 + dx,
        1 + dx + W,
        axis=x.ndim - 1,
    )


def _hysteresis_packed(strong: jnp.ndarray, weak: jnp.ndarray,
                       iters: int) -> jnp.ndarray:
    """edges = strong | (weak reachable from strong in <= iters 8-connected
    steps) — bit-identical to ``iters`` rounds of ``e | (weak &
    _dilate8(e))``, but on ROW-PACKED bitmasks: bit j of int32 word
    (b, col) holds row 32*b + j, so one VPU op advances 32 rows at once.
    A 1080p round touches a (34, 1920) i32 array instead of (1080, 1920)
    — ~32x less work than the unpacked loop and ~60x less than the
    banded-VMEM Pallas kernel (which re-dilates halo rows); measured
    ~11 ms/frame of the Phase-1 label program before this.  Pure jnp:
    vmap-safe, identical on CPU/TPU, no band halos."""
    H, W = strong.shape[-2], strong.shape[-1]
    Hw = -(-H // 32)
    pad = [(0, 0)] * (strong.ndim - 2) + [(0, Hw * 32 - H), (0, 0)]
    one = jnp.int32(1)

    def pack(x):
        xp = jnp.pad(x.astype(jnp.int32), pad)
        xp = xp.reshape(x.shape[:-2] + (Hw, 32, W))
        # disjoint bit contributions: int32 wrap-sum == bitwise OR (bit
        # 31's addend is INT32_MIN; the sum wraps mod 2^32)
        pow2 = jnp.int32(1) << jnp.arange(32, dtype=jnp.int32)
        return jnp.sum(xp * pow2[:, None], axis=-2, dtype=jnp.int32)

    def rows_up(e):
        # bit j <- row r-1: same word's bit j-1, word b-1's bit 31 at j=0
        carry = jax.lax.shift_right_logical(_shift_zero(e, -1, 0), 31)
        return (e << one) | carry

    def rows_down(e):
        # bit j <- row r+1: same word's bit j+1, word b+1's bit 0 at j=31
        carry = (_shift_zero(e, 1, 0) & one) << 31
        return jax.lax.shift_right_logical(e, 1) | carry

    e = pack(strong)
    w = pack(weak)

    def body(_, e):
        vd = e | rows_up(e) | rows_down(e)
        # including the center in the 3x3 OR is harmless: (w & e) adds
        # nothing beyond the leading `e |`
        hd = vd | _shift_zero(vd, 0, -1) | _shift_zero(vd, 0, 1)
        return e | (w & hd)

    e = jax.lax.fori_loop(0, iters, body, e)
    # lax.shift_right_logical wants equal ranks — broadcast explicitly
    ee, sh = jnp.broadcast_arrays(
        e[..., :, None, :], jnp.arange(32, dtype=jnp.int32)[:, None])
    bits = jax.lax.shift_right_logical(ee, sh) & one
    return bits.reshape(strong.shape[:-2] + (Hw * 32, W))[..., :H, :]


_TG22 = 13573  # tan(22.5 deg) in Q15, as in OpenCV canny.cpp


@partial(jax.jit, static_argnames=("low", "high", "hysteresis_iters", "use_pallas"))
def canny_u8(gray_u8: jnp.ndarray, low: int = 50, high: int = 150,
             hysteresis_iters: int = 64, use_pallas="auto",
             valid_hw=None, valid_rows=None) -> jnp.ndarray:
    """cv2.Canny(gray, low, high) on a uint8-valued int32 plane -> {0,1} mask.

    L1 gradient (|dx|+|dy|), 3x3 Sobel with REPLICATE border, OpenCV's
    integer NMS sector logic, bounded hysteresis (see module docstring).
    The propagation runs row-packed (32 rows per int32 word,
    _hysteresis_packed) — bit-identical to the unpacked dilation loop for
    any iteration count and ~32x cheaper.  use_pallas=True keeps the
    VMEM-banded Pallas kernel (ops/pallas_kernels.py, also bit-identical:
    halo >= iters) reachable for comparison on 2-D planes.

    valid_hw=(h, w) (traced scalars) restricts the plane to its top-left
    (h, w) region: with rows h-1/cols w-1 REPLICATED beyond the region (see
    ops/airlight.py), zeroing the gradient magnitude outside makes the result
    inside [0:h, 0:w] EXACTLY cv2.Canny of the (h, w) crop — Sobel sees the
    replicate border, NMS border neighbors read magnitude 0 (OpenCV zeroes
    its border map rows), and hysteresis cannot enter the dead zone.

    valid_rows=(r0, r1) (traced scalars) is the row-band analog for halo'd
    shards (parallel/six_spatial.py): with rows r0 / r1-1 replicated beyond
    the band, the result inside [r0:r1] is EXACTLY the corresponding rows
    of the full-plane computation.
    """
    g = gray_u8.astype(jnp.int32)
    dx = conv3x3(g, _SOBEL_X, "edge")
    dy = conv3x3(g, _SOBEL_Y, "edge")
    m = jnp.abs(dx) + jnp.abs(dy)
    if valid_hw is not None:
        h, w = valid_hw
        rows = jnp.arange(m.shape[-2], dtype=jnp.int32)[:, None]
        cols = jnp.arange(m.shape[-1], dtype=jnp.int32)[None, :]
        m = jnp.where((rows < h) & (cols < w), m, 0)
    if valid_rows is not None:
        r0, r1 = valid_rows
        rows = jnp.arange(m.shape[-2], dtype=jnp.int32)[:, None]
        m = jnp.where((rows >= r0) & (rows < r1), m, 0)

    # sector classification, OpenCV integer arithmetic
    ax = jnp.abs(dx)
    ay = jnp.abs(dy) << 15
    tg22x = ax * _TG22
    tg67x = tg22x + (ax << 16)
    horiz = ay < tg22x              # gradient mostly horizontal -> compare L/R
    vert = ay > tg67x               # mostly vertical -> compare U/D
    s_pos = (dx ^ dy) < 0           # opposite signs -> anti-diagonal

    def sh(dy_, dx_):
        return _shift_zero(m, dy_, dx_)

    # OpenCV tie-breaking: strictly greater than one neighbor, >= the other
    nms_h = (m > sh(0, -1)) & (m >= sh(0, 1))
    nms_v = (m > sh(-1, 0)) & (m >= sh(1, 0))
    nms_d1 = (m > sh(-1, -1)) & (m > sh(1, 1))     # main diagonal
    nms_d2 = (m > sh(-1, 1)) & (m > sh(1, -1))     # anti diagonal
    keep = jnp.where(horiz, nms_h,
                     jnp.where(vert, nms_v, jnp.where(s_pos, nms_d2, nms_d1)))

    cand = (m > low) & keep
    strong = cand & (m > high)
    weak = cand & ~strong

    # row-packed propagation (default): bit-identical to the unpacked
    # dilation loop and to the banded Pallas kernel for every iteration
    # count, ~32x less work, vmap-safe (tests/test_edges.py gates all
    # three against each other).  use_pallas=True keeps the banded VMEM
    # kernel reachable for comparison.
    if use_pallas is True and strong.ndim == 2 and strong.shape[1] >= 128:
        from underwater_image_enhancement_tpu.ops import pallas_kernels as pk

        if not pk.is_batched(strong, weak):
            return pk.hysteresis_propagate(strong.astype(jnp.int32),
                                           weak.astype(jnp.int32),
                                           iters=hysteresis_iters)
    return _hysteresis_packed(strong.astype(jnp.int32),
                              weak.astype(jnp.int32),
                              hysteresis_iters).astype(jnp.int32)


def canny_unit(img_gray_unit: jnp.ndarray, low: int = 50, high: int = 150) -> jnp.ndarray:
    """Canny on a [0,1] gray image via the reference's (g*255).u8 quantize."""
    g = jnp.clip(img_gray_unit * 255.0, 0, 255).astype(jnp.int32)
    return canny_u8(g, low, high)
