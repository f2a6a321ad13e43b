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

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ITERS = 64          # must match edges.canny_u8's hysteresis_iters default
TILE_H = 128        # rows per grid step
HALO = ITERS        # halo rows >= iteration count => exact equivalence


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def is_batched(*xs) -> bool:
    """True when any arg is a vmap BatchTracer.  The grid/BlockSpec layouts
    here assume unbatched operands (refs are indexed positionally), so
    dispatchers route batched traces to their XLA formulations instead —
    except the pointwise LAB kernels, which carry a custom_vmap rule."""
    try:
        from jax._src.interpreters.batching import BatchTracer

        return any(isinstance(x, BatchTracer) for x in xs)
    except ImportError:  # private module moved: fall back to the type name
        return any(type(x).__name__ == "BatchTracer" for x in xs)


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


def _make_hyst_kernel(iters: int, halo: int):
    def _hyst_kernel(strong_ref, weak_ref, out_ref):
        e = strong_ref[0]
        w = weak_ref[0]

        def body(_, e):
            return e | (w & _dilate8_local(e))

        e = jax.lax.fori_loop(0, iters, body, e)
        out_ref[0] = e[halo:halo + TILE_H, :]

    return _hyst_kernel


@partial(jax.jit, static_argnames=("iters",))
def hysteresis_propagate(strong: jnp.ndarray, weak: jnp.ndarray,
                         iters: int = ITERS) -> jnp.ndarray:
    """edges = strong | (weak reachable from strong in <= iters dilations).

    strong/weak: (H, W) int32 {0,1}.  Bit-identical to ``iters`` global
    dilate-and-mask iterations (see module docstring; halo >= iters keeps
    the band-local propagation exact for any iteration count)."""
    H, W = strong.shape
    halo = iters
    n_bands = -(-H // TILE_H)
    pad_h = n_bands * TILE_H - H
    # zero-pad: HALO rows on top, HALO + band remainder on the bottom
    sp = jnp.pad(strong, ((halo, halo + pad_h), (0, 0)))
    wp = jnp.pad(weak, ((halo, halo + pad_h), (0, 0)))
    bh = TILE_H + 2 * halo

    # overlapping band windows (stride TILE_H, height TILE_H + 2*HALO) are
    # materialized by an XLA pre-gather: band b = rows [b*TILE_H, +bh)
    starts = jnp.arange(n_bands) * TILE_H
    s_bands = jax.vmap(
        lambda s: jax.lax.dynamic_slice(sp, (s, 0), (bh, W)))(starts)
    w_bands = jax.vmap(
        lambda s: jax.lax.dynamic_slice(wp, (s, 0), (bh, W)))(starts)

    out = pl.pallas_call(
        _make_hyst_kernel(iters, halo),
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
        # two (bh, W) inputs + one (TILE_H, W) output, double-buffered:
        # 17.7 MB at W=1920 — just over the 16 MB default scoped-vmem cap
        # (v5e has 128 MB); hit when the label program vmaps Canny over
        # batch x strategies at 1080p
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(s_bands, w_bands)
    return out.reshape(n_bands * TILE_H, W)[:H]


# ---------------------------------------------------------------------------
# Fused CLAHE apply: per-band-block LUT gather + bilinear interpolation
# ---------------------------------------------------------------------------
#
# The XLA formulation of the CLAHE lookup (ops/histeq.py:clahe_u8) maps each
# band-block through its 4 tile LUTs with two-level one-hot matmuls, then
# page-selects and reduces — materializing (B, A, 4, 4) f32 intermediates in
# HBM (~170 MB per 1080p call) plus the block/unblock transposes.  Profiled
# at ~1.06 ms per CLAHE roundtrip, x5 calls in the six-strategy program.
#
# Here the whole apply stage is ONE VMEM pass: each grid step loads one
# band-block (th x tw_padded i32) plus its 4 LUTs (4 x 256 f32), performs the
# four lookups with lane-dim dynamic gathers (jnp.take_along_axis on
# 128-wide operands — tpu.dynamic_gather; round-1 probe notes in
# docs/ROADMAP.md), and applies OpenCV's bilinear weight arithmetic with the
# SAME host-precomputed float32 weight vectors as the XLA path.  Outputs are
# bit-identical to clahe_u8's XLA path (gated by tests/test_pallas.py).


def _lut_lookup_128(t0: jnp.ndarray, t1: jnp.ndarray, idx: jnp.ndarray):
    """Gather from a 256-entry table split into two (H, 128) broadcast
    segments; idx (H, 128) i32 in [0, 255]."""
    lo = jnp.minimum(idx, 127)
    hi = jnp.maximum(idx - 128, 0)
    g0 = jnp.take_along_axis(t0, lo, axis=1)
    g1 = jnp.take_along_axis(t1, hi, axis=1)
    return jnp.where(idx < 128, g0, g1)


def _cv_bilinear_f32(mapped, xa, ya):
    """OpenCV f32 accumulation order:
    (m0*xa1 + m1*xa)*ya1 + (m2*xa1 + m3*xa)*ya.

    Unlike the XLA path (ops/histeq.py), there is NO optimization_barrier
    here: the primitive has no Pallas/Mosaic TPU lowering (probed round 3 —
    it crashes kernel compilation).  Bit-identity instead rests on Mosaic
    not FMA-contracting separate mul/add ops today, which
    tests/test_pallas.py::test_clahe_tie_inputs_bit_identical pins with
    constructed exact-.5-tie inputs (runs on real TPU under UIE_TEST_TPU=1)
    so a future compiler change is caught, not silently wrong."""
    xa1 = jnp.float32(1.0) - xa
    ya1 = jnp.float32(1.0) - ya
    top = mapped[0] * xa1 + mapped[1] * xa
    bot = mapped[2] * xa1 + mapped[3] * xa
    return top * ya1 + bot * ya


def _clahe_apply_kernel(vals_ref, luts_ref, ya_ref, xa_ref, out_ref):
    vals = jnp.clip(vals_ref[0], 0, 255)  # (th, twp) i32; pad lanes -> 0
    th, twp = vals.shape
    mapped = []
    for k in range(4):
        t0 = jnp.broadcast_to(luts_ref[0, k, :128][None, :], (th, 128))
        t1 = jnp.broadcast_to(luts_ref[0, k, 128:][None, :], (th, 128))
        cols = [
            _lut_lookup_128(t0, t1, vals[:, c:c + 128])
            for c in range(0, twp, 128)
        ]
        mapped.append(jnp.concatenate(cols, axis=1) if len(cols) > 1
                      else cols[0])
    v = _cv_bilinear_f32(mapped, xa_ref[0], ya_ref[0])
    out_ref[0] = jnp.clip(jnp.rint(v), 0, 255).astype(jnp.int32)


def clahe_apply(xp2: jnp.ndarray, luts4: jnp.ndarray, ya_np, xa_np,
                th: int, tw: int, by: int, bx: int) -> jnp.ndarray:
    """Map + interpolate half-tile-padded image(s) through band-block LUTs.

    xp2: (B, by*th, bx*tw) i32 padded images (histeq.clahe_u8's layout; B
    may be 1); luts4: (B*by*bx, 4, 256) f32 — the TL/TR/BL/BR tile LUT per
    band-block; ya_np/xa_np: host numpy f32 interpolation fractions in the
    BAND-BLOCK frame, shapes (by*th,) and (bx*tw,) — i.e. the crop-frame
    OpenCV weights shifted by the half-tile offsets so index 0 is the first
    padded row/col (shared across the batch: tiling depends only on H, W).
    Returns (B, by*th, bx*tw) i32 mapped+interpolated (caller crops).
    """
    import numpy as _np

    twp = -(-tw // 128) * 128
    B = xp2.shape[0]
    NB = by * bx
    blocks = (
        xp2.reshape(B, by, th, bx, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B * NB, th, tw)
    )
    if twp != tw:
        blocks = jnp.pad(blocks, ((0, 0), (0, 0), (0, twp - tw)))
    ya_b = jnp.asarray(
        _np.asarray(ya_np, _np.float32).reshape(by, th, 1))
    xa_b = _np.asarray(xa_np, _np.float32).reshape(bx, 1, tw)
    if twp != tw:
        xa_b = _np.pad(xa_b, ((0, 0), (0, 0), (0, twp - tw)))
    xa_b = jnp.asarray(xa_b)

    out = pl.pallas_call(
        _clahe_apply_kernel,
        grid=(B, by, bx),
        in_specs=[
            pl.BlockSpec((1, th, twp),
                         lambda b, i, j: (b * (by * bx) + i * bx + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 256),
                         lambda b, i, j: (b * (by * bx) + i * bx + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, 1), lambda b, i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, twp), lambda b, i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, twp), lambda b, i, j: (b * (by * bx) + i * bx + j, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * NB, th, twp), jnp.int32),
        interpret=_interpret(),
    )(blocks, luts4, ya_b, xa_b)
    return (
        out[:, :, :tw]
        .reshape(B, by, bx, th, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, by * th, bx * tw)
    )


def _make_cumsum_rows_kernel(H: int):
    def kernel(x_ref, o_ref):
        c = x_ref[0]                              # (H, 128)
        # Hillis-Steele doubling: jnp.cumsum has no Mosaic lowering.  The
        # f32 association DIFFERS from XLA's cumsum in the last bits (see
        # _sat_rows/_corner_grid docstrings — this kernel serves only the
        # throughput airlight path); test_sat_rows_kernel_exact gates a
        # ~3e-6 relative agreement vs float64, and exactness on integer
        # inputs.
        shift = 1
        while shift < H:
            z = jnp.zeros((shift, c.shape[1]), c.dtype)
            c = c + jnp.concatenate([z, c[:-shift]], axis=0)
            shift *= 2
        o_ref[0, :1, :] = jnp.zeros((1, c.shape[1]), c.dtype)
        o_ref[0, 1:, :] = c

    return kernel


@jax.custom_batching.custom_vmap
def sat_rows(x: jnp.ndarray) -> jnp.ndarray:
    """Row-prefix table with a leading zero row: (P, H, W) f32 ->
    (P, H+1, W), one VMEM pass per (plane, 128-lane) column block.

    XLA's log-doubling cumsum re-reads the full stack ~log2(H) times from
    HBM (~0.7 ms for the quadtree's (7, 1080, 1920) stats); here each
    block loads once, scans in VMEM, stores once (~0.15 ms).

    vmap-safe: the custom_vmap rule folds the batch dim into the plane
    axis (the grid is independent per plane), so the vmapped quadtree
    airlight keeps this kernel instead of falling back to XLA cumsum."""
    return _sat_rows_call(x)


def _sat_rows_vmap_rule(axis_size, in_batched, x):
    B, P, H, W = x.shape
    out = _sat_rows_call(x.reshape(B * P, H, W)).reshape(B, P, H + 1, W)
    return out, True


sat_rows.def_vmap(_sat_rows_vmap_rule)


def _sat_rows_call(x: jnp.ndarray) -> jnp.ndarray:
    P, H, W = x.shape
    Wp = -(-W // 128) * 128
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, Wp - W))) if Wp != W else x
    out = pl.pallas_call(
        _make_cumsum_rows_kernel(H),
        grid=(P, Wp // 128),
        in_specs=[pl.BlockSpec((1, H, 128), lambda p, j: (p, 0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, H + 1, 128), lambda p, j: (p, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, H + 1, Wp), x.dtype),
        interpret=_interpret(),
    )(xp)
    return out[:, :, :W] if Wp != W else out


def _make_clahe_lab_kernel(ig_corr=None):
    def _clahe_lab_kernel(vals_ref, a_ref, b_ref, luts_ref, ya_ref, xa_ref,
                          l2yf_ref, *rest):
        """CLAHE apply + bilinear interp + inverse LAB in ONE VMEM pass.

        Same arithmetic as _clahe_apply_kernel followed by _lab_inv_kernel
        on the mapped L and the ride-along a/b band-blocks — the fused form
        skips one HBM roundtrip of the L' plane and one kernel launch per
        CLAHE leg."""
        if ig_corr is None:
            ig_ref, r_ref, g_ref, bb_ref = rest
            ig = ig_ref[...]
        else:
            (r_ref, g_ref, bb_ref), ig = rest, None
        vals = jnp.clip(vals_ref[0], 0, 255)
        th, twp = vals.shape
        mapped = []
        for k in range(4):
            t0 = jnp.broadcast_to(luts_ref[0, k, :128][None, :], (th, 128))
            t1 = jnp.broadcast_to(luts_ref[0, k, 128:][None, :], (th, 128))
            cols = [
                _lut_lookup_128(t0, t1, vals[:, c:c + 128])
                for c in range(0, twp, 128)
            ]
            mapped.append(jnp.concatenate(cols, axis=1) if len(cols) > 1
                          else cols[0])
        v = _cv_bilinear_f32(mapped, xa_ref[0], ya_ref[0])
        L = jnp.clip(jnp.rint(v), 0, 255).astype(jnp.int32)

        vals_out = _lab_inv_body(L, a_ref[0], b_ref[0], l2yf_ref[...],
                                 _make_ig_lookup(ig_corr, ig))
        for ref, v8 in zip((r_ref, g_ref, bb_ref), vals_out):
            ref[0] = v8

    return _clahe_lab_kernel


def clahe_lab_apply(Lp2, ap2, bp2, luts4, ya_np, xa_np,
                    th: int, tw: int, by: int, bx: int):
    """Fused band-block CLAHE apply + inverse LAB.

    Lp2/ap2/bp2: (B, by*th, bx*tw) i32 half-tile-padded L/a/b planes in
    clahe's band-block frame (same padding for all three); luts4:
    (B*by*bx, 4, 256) f32.  Returns (r, g, b) planes (B, by*th, bx*tw)
    i32 (caller crops).  Bit-identical to clahe_apply followed by
    lab_inverse_planes (gated by tests/test_pallas.py)."""
    import numpy as _np

    twp = -(-tw // 128) * 128
    B = Lp2.shape[0]
    NB = by * bx

    def block(x):
        blk = (x.reshape(B, by, th, bx, tw)
               .transpose(0, 1, 3, 2, 4)
               .reshape(B * NB, th, tw))
        if twp != tw:
            blk = jnp.pad(blk, ((0, 0), (0, 0), (0, twp - tw)))
        return blk

    Lb, ab, bb = block(Lp2), block(ap2), block(bp2)
    ya_b = jnp.asarray(
        _np.asarray(ya_np, _np.float32).reshape(by, th, 1))
    xa_b = _np.asarray(xa_np, _np.float32).reshape(bx, 1, tw)
    if twp != tw:
        xa_b = _np.pad(xa_b, ((0, 0), (0, 0), (0, twp - tw)))
    xa_b = jnp.asarray(xa_b)
    corr = _corrections("inv_gamma")
    tabs = _lab_inv_tables(with_ig=corr is None)

    blk_spec = pl.BlockSpec(
        (1, th, twp), lambda b, i, j: (b * (by * bx) + i * bx + j, 0, 0),
        memory_space=pltpu.VMEM)
    tab = lambda s: pl.BlockSpec((s, 128), lambda b, i, j: (0, 0),
                                 memory_space=pltpu.VMEM)
    r, g, bb_out = pl.pallas_call(
        _make_clahe_lab_kernel(corr),
        grid=(B, by, bx),
        in_specs=[
            blk_spec, blk_spec, blk_spec,
            pl.BlockSpec((1, 4, 256),
                         lambda b, i, j: (b * (by * bx) + i * bx + j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, 1), lambda b, i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, twp), lambda b, i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [tab(t.shape[0]) for t in tabs],
        out_specs=[blk_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct((B * NB, th, twp), jnp.int32)] * 3,
        interpret=_interpret(),
    )(Lb, ab, bb, luts4, ya_b, xa_b, *(jnp.asarray(t) for t in tabs))

    def unblock(x):
        return (x[:, :, :tw]
                .reshape(B, by, bx, th, tw)
                .transpose(0, 1, 3, 2, 4)
                .reshape(B, by * th, bx * tw))

    return unblock(r), unblock(g), unblock(bb_out)


# ---------------------------------------------------------------------------
# Bit-exact LAB legs as fused VMEM kernels
# ---------------------------------------------------------------------------
#
# The XLA path evaluates OpenCV's fixed-point LAB tables through arithmetic
# surrogates (ops/colorspace.py) whose barrier-isolated transcendentals
# fragment into ~8 full-frame loop fusions per CLAHE roundtrip (~700 us/frame
# profiled across the six-strategy program).  Here each direction is ONE
# VMEM pass: the tables ride along as (segments, 128) operands and every
# lookup is a lane-dim dynamic gather (segment-selected for tables wider
# than 128; 16-bit/8-bit entries are packed 2/4-per-int32).  All integer
# arithmetic is the same OpenCV fixed-point sequence as the XLA path, so
# outputs are bit-identical (gated by tests/test_pallas.py).


def _seg_gather(tab_ref_row, idx: jnp.ndarray, segments: int) -> jnp.ndarray:
    """Gather ``flat_table[idx]`` where the flat table is laid out as
    (segments, 128) rows of ``tab_ref_row`` (a loaded (S, 128) array).
    idx: (H, n*128) i32, pre-clipped to [0, segments*128).  Mosaic's
    lane-gather requires 128-wide indices, so wider blocks chunk over
    columns."""
    if idx.shape[1] != 128:
        cols = [_seg_gather(tab_ref_row, idx[:, c:c + 128], segments)
                for c in range(0, idx.shape[1], 128)]
        return jnp.concatenate(cols, axis=1)
    H = idx.shape[0]
    lane = idx & 127
    if segments == 1:
        t = jnp.broadcast_to(tab_ref_row[0][None, :], (H, 128))
        return jnp.take_along_axis(t, lane, axis=1)
    seg = idx >> 7
    out = None
    for s in range(segments):
        t = jnp.broadcast_to(tab_ref_row[s][None, :], (H, 128))
        g = jnp.take_along_axis(t, lane, axis=1)
        out = g if out is None else jnp.where(seg == s, g, out)
    return out


def _descale(v: jnp.ndarray, n: int) -> jnp.ndarray:
    return (v + (1 << (n - 1))) >> n


# ---------------------------------------------------------------------------
# Arithmetic table surrogates (probe-corrected, exact by construction)
# ---------------------------------------------------------------------------
#
# The CBRT (3072-entry) and INV_GAMMA (4096-entry) tables cost 12- and
# 8-segment lane gathers per lookup — the compute bottleneck of the LAB
# kernels (docs/ROADMAP.md round-2 notes).  Both tables are rounded smooth
# functions, so each lookup can instead be EVALUATED in ~15 deterministic
# f32 ops (bit-trick-seeded Newton cube root + hardware sqrts — no
# transcendental instruction, whose codegen could vary).  A one-time
# per-backend probe runs the surrogate as its own Pallas program over the
# full index range and bakes the sparse mismatch set into the kernels as
# `idx == k` fixups, making the lookup exact by construction (same approach
# as colorspace._corrected_lookup on the XLA side; probed on v5e:
# cbrt = 5 (+1) corrections, inv_gamma = 0).


def _rcbrt(t: jnp.ndarray, steps: int = 4) -> jnp.ndarray:
    """f32 t^(-1/3): exponent bit-trick seed + DIVISION-FREE Newton steps
    r <- r*(4 - t*r^3)/3 (f32 division is a multi-op emulation on the VPU
    — a divide-based Newton measured ~6x slower than the table gather it
    was meant to replace).  Mul/add only, so per-element results are
    independent of block shape; corrections absorb the residual ulps.
    Convergence is quadratic from a ~3% seed: 2 steps reach ~1e-5 relative
    (enough for u8 targets), 3 steps reach f32 roundoff."""
    t = jnp.maximum(t, np.float32(1e-30))
    i = jax.lax.bitcast_convert_type(t, jnp.int32)
    r = jax.lax.bitcast_convert_type(np.int32(0x54A21D2A) - i // 3,
                                     jnp.float32)
    third = np.float32(1.0 / 3.0)
    four = np.float32(4.0)
    for _ in range(steps):
        r = r * ((four - t * (r * r) * r) * third)
    return r


def _newton_cbrt(t: jnp.ndarray, steps: int = 4) -> jnp.ndarray:
    """f32 cube root as t * (t^(-1/3))^2 — division-free."""
    t = jnp.maximum(t, np.float32(1e-30))
    r = _rcbrt(t, steps)
    return t * (r * r)


def _cbrt_tab_surrogate(idx: jnp.ndarray, steps: int = 4) -> jnp.ndarray:
    """lab_tables.CBRT_TAB[idx] candidate: round(labF(i/2040) * 2^15).

    steps=4 diverges from the table on ~7 of 3072 entries (fixed up by the
    probe corrections -> exact); steps=2 diverges by +-1 on ~370 entries —
    the uncorrected throughput tier (<= +-1 u8 LSB in L/a/b)."""
    t = idx.astype(jnp.float32) * np.float32(1.0 / 2040.0)
    f = jnp.where(t < np.float32(0.008856),
                  t * np.float32(7.787) + np.float32(16.0 / 116.0),
                  _newton_cbrt(t, steps))
    return jnp.round(f * np.float32(1 << 15)).astype(jnp.int32)


def _ig_tab_surrogate(idx: jnp.ndarray) -> jnp.ndarray:
    """lab_tables.INV_GAMMA_TAB[idx] candidate:
    clip(round(255 * srgb_gamma(i/4096))) with
    x^(1/2.4) = ((x^(1/3))^(1/4))^5 — Newton cbrt + 2 hardware sqrts.
    3 Newton steps match all 4096 table entries (numpy f32 replay; the
    on-device probe re-validates and would add corrections on divergence)."""
    x = idx.astype(jnp.float32) * np.float32(1.0 / 4096.0)
    s = jnp.sqrt(jnp.sqrt(_newton_cbrt(x, steps=3)))  # x^(1/12)
    s2 = s * s
    p = s2 * s2 * s                              # x^(5/12) = x^(1/2.4)
    g = np.float32(1.055) * p - np.float32(0.055)
    g = jnp.where(x <= np.float32(0.0031308), x * np.float32(12.92), g)
    return jnp.clip(jnp.round(np.float32(255.0) * g), 0, 255).astype(
        jnp.int32)


_ARITH_CORR: dict = {}
# per-table kill switches (experiments/tests): False forces the gather path
_ARITH_ENABLE = {"cbrt": True, "inv_gamma": True}


def _corrections(name: str):
    """Sparse (idx, delta) fixes making the surrogate equal the int table,
    probed once per backend by running the surrogate as its own Pallas
    program (same interpret setting and arithmetic sequence as the consuming
    kernels).  Returns None — meaning use the gather path — if the
    surrogate diverges on > 32 entries on this backend."""
    import numpy as _np

    from underwater_image_enhancement_tpu.ops import lab_tables as lt

    if not _ARITH_ENABLE.get(name, True):
        return None
    key = (name, jax.default_backend(), _interpret())
    if key not in _ARITH_CORR:
        surrogate, table = {
            "cbrt": (_cbrt_tab_surrogate, lt.CBRT_TAB),
            "inv_gamma": (_ig_tab_surrogate, lt.INV_GAMMA_TAB),
        }[name]
        tab = _np.asarray(table, _np.int64)
        n = tab.shape[0]

        def probe_kernel(i_ref, o_ref):
            o_ref[...] = surrogate(i_ref[...])

        rows = n // 128
        with jax.ensure_compile_time_eval():
            got = pl.pallas_call(
                probe_kernel,
                in_specs=[pl.BlockSpec((rows, 128), lambda: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((rows, 128), lambda: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
                interpret=_interpret(),
            )(jnp.arange(n, dtype=jnp.int32).reshape(rows, 128))
            got = _np.asarray(got).reshape(-1).astype(_np.int64)
        delta = tab - got
        nz = _np.nonzero(delta)[0]
        _ARITH_CORR[key] = None if len(nz) > 32 else (
            tuple(int(i) for i in nz), tuple(int(d) for d in delta[nz]))
    return _ARITH_CORR[key]


def _apply_corrections(v: jnp.ndarray, idx: jnp.ndarray, corr):
    for i, d in zip(*corr):
        v = v + jnp.where(idx == np.int32(i), np.int32(d), np.int32(0))
    return v


# Probe-transfer caveat (measured on v5e, round 3): the INV_GAMMA surrogate
# is bit-exact in every tested kernel context (standalone inverse, fused
# CLAHE+inverse), but the CBRT surrogate's last-ulp rounding varies with the
# kernel instance (Mosaic may contract/reassociate differently per call
# site), flipping ~1e-4 of a/b pixels by +-1 LSB vs the table.  The forward
# kernels therefore keep the 12-segment gather on the EXACT tier and use
# the arithmetic cbrt only on the explicitly-approximate fast tier (the six
# --fast throughput path, whose airlight/percentile stages are already
# approximate; gate is >= 50 dB, and +-1 LSB on 0.01% of a/b pixels sits
# around 90 dB).  tests/test_tpu_hw.py pins both behaviors on hardware.


def _make_lab_fwd_kernel(unit_in: bool, cbrt_corr=None, l_only: bool = False):
    def _lab_fwd_kernel(r_ref, g_ref, b_ref, gam_ref, *rest):
        from underwater_image_enhancement_tpu.ops import lab_tables as lt

        if cbrt_corr is None:
            cbrt_ref, L_ref, *ab_refs = rest
            cbrt = cbrt_ref[...]  # (12, 128) i32, two 16-bit entries/word
        else:
            L_ref, *ab_refs = rest
        if unit_in:
            # colorspace.quantize_u8 semantics in-kernel: clip + TRUNCATE
            q = lambda v: jnp.clip(v * jnp.float32(255.0),
                                   0.0, 255.0).astype(jnp.int32)
        else:
            q = lambda v: jnp.clip(v, 0, 255)
        gam = gam_ref[...]     # (2, 128) i32
        R = _seg_gather(gam, q(r_ref[...]), 2)
        G = _seg_gather(gam, q(g_ref[...]), 2)
        B = _seg_gather(gam, q(b_ref[...]), 2)
        C = lt.COEFFS

        def cbrt_lookup(row):
            acc = (R * int(C[row, 0]) + G * int(C[row, 1])
                   + B * int(C[row, 2]))
            idx = jnp.clip(_descale(acc, lt.LAB_SHIFT), 0, lt.NCBRT - 1)
            if cbrt_corr == "approx2":
                # throughput tier: 2-step Newton, NO corrections — +-1
                # table LSB on ~12% of entries => <= +-1 u8 LSB in L/a/b
                return _cbrt_tab_surrogate(idx, steps=2)
            if cbrt_corr is not None:
                # arithmetic CBRT_TAB (probe-corrected — bit-identical)
                return _apply_corrections(_cbrt_tab_surrogate(idx), idx,
                                          cbrt_corr)
            word = _seg_gather(cbrt, idx >> 1, 12)
            return (word >> ((idx & 1) << 4)) & 0xFFFF

        fY = cbrt_lookup(1)
        clip = lambda v: jnp.clip(v, 0, 255)
        L_ref[...] = clip(_descale(lt.L_SCALE * fY + lt.L_SHIFT,
                                   lt.LAB_SHIFT2))
        if l_only:
            return  # brightness-metric tier: skip fX/fZ and the a/b planes
        a_ref, bb_ref = ab_refs
        fX = cbrt_lookup(0)
        fZ = cbrt_lookup(2)
        a_ref[...] = clip(_descale(500 * (fX - fY) + (128 << lt.LAB_SHIFT2),
                                   lt.LAB_SHIFT2))
        bb_ref[...] = clip(_descale(200 * (fY - fZ) + (128 << lt.LAB_SHIFT2),
                                    lt.LAB_SHIFT2))

    return _lab_fwd_kernel


_LAB_TABS: dict = {}


def _pack_u32(*fields):
    """Pack (array, bit_offset) fields into one int32 word array.  Packing
    happens in int64 then reinterprets as int32: entries like 32768 << 16 or
    255 << 24 overflow a direct int32 shift."""
    import numpy as _np

    acc = _np.zeros(fields[0][0].shape, _np.int64)
    for arr, off in fields:
        acc |= _np.asarray(arr, _np.int64) << off
    return (acc & 0xFFFFFFFF).astype(_np.uint32).view(_np.int32)


def _lab_fwd_tables(with_cbrt: bool = True):
    if "fwd" not in _LAB_TABS:
        import numpy as _np

        from underwater_image_enhancement_tpu.ops import lab_tables as lt

        gam = _np.asarray(lt.GAMMA_TAB, _np.int32).reshape(2, 128)
        cb = _np.asarray(lt.CBRT_TAB, _np.int32)  # (3072,), entries <= 2^15
        packed = _pack_u32((cb[0::2], 0), (cb[1::2], 16))
        _LAB_TABS["fwd"] = (gam, packed.reshape(12, 128))
    gam, cbrt = _LAB_TABS["fwd"]
    return (gam, cbrt) if with_cbrt else (gam,)


def _lab_inv_body(L, a, b, l2yf, ig_lookup):
    """Shared inverse-LAB integer pipeline: (L, a, b) i32 blocks ->
    (r, g, b) u8-valued i32 blocks.  ig_lookup: idx -> INV_GAMMA_TAB[idx]."""
    from underwater_image_enhancement_tpu.ops import lab_tables as lt
    from underwater_image_enhancement_tpu.ops.colorspace import _ctrunc_div

    word = _seg_gather(l2yf, jnp.clip(L, 0, 255), 2)
    y = word & 0xFFFF
    ify = (word >> 16) & 0xFFFF

    adiv = ((5 * a * 53687 + (1 << 7)) >> 13) - 128 * lt.BASE // 500
    bdiv = ((b * 41943 + (1 << 4)) >> 9) - 128 * lt.BASE // 200 + 1

    def ab_to_xz(v):
        v = jnp.clip(v, lt.MIN_AB, lt.BASE * 9 // 4)
        lin = _ctrunc_div(v * 108, 841) - lt.AB_LIN_K
        cub = _ctrunc_div(_ctrunc_div(v * v, lt.BASE) * v, lt.BASE)
        return jnp.where(v <= lt.AB_LIN_THRESH, lin, cub)

    x = ab_to_xz(ify + adiv)
    z = ab_to_xz(ify - bdiv)
    C = lt.COEFFS_INV
    outs = []
    for ch in range(3):
        idx = _descale(
            x * int(C[ch, 0]) + y * int(C[ch, 1]) + z * int(C[ch, 2]), 14)
        idx = jnp.clip(idx, 0, lt.INV_GAMMA_SIZE - 1)
        outs.append(ig_lookup(idx))
    return outs


def _make_ig_lookup(ig_corr, ig=None):
    """INV_GAMMA_TAB lookup: arithmetic surrogate + corrections when the
    probe validated it, else the packed 8-segment lane gather."""
    if ig_corr is not None:
        return lambda idx: _apply_corrections(_ig_tab_surrogate(idx), idx,
                                              ig_corr)

    def lookup(idx):
        w = _seg_gather(ig, idx >> 2, 8)
        return (w >> ((idx & 3) << 3)) & 0xFF

    return lookup


def _make_lab_inv_kernel(unit_out: bool, ig_corr=None, gamma: bool = False):
    def _lab_inv_kernel(L_ref, a_ref, b_ref, l2yf_ref, *rest):
        rest = list(rest)
        ig = rest.pop(0)[...] if ig_corr is None else None  # (8, 128) i32
        glut = rest.pop(0)[...] if gamma else None  # (2, 128) f32-bit words
        r_ref, g_ref, bb_ref = rest
        l2yf = l2yf_ref[...]   # (2, 128) i32: y | (ify << 16), both < 2^15
        vals = _lab_inv_body(L_ref[...], a_ref[...], b_ref[...], l2yf,
                             _make_ig_lookup(ig_corr, ig))
        for ref, v8 in zip((r_ref, g_ref, bb_ref), vals):
            if gamma:
                # fold the six-strategy post-CLAHE gamma into the kernel
                # epilogue: outputs live on the u8 grid, so (k/255)**g is a
                # 256-entry LUT, saving the separate full-frame
                # read+write+pow pass per leg (within 1 ulp of the
                # standalone pass — XLA's pow drifts the last ulp between
                # evaluation shapes; the LUT itself is applied exactly)
                w = _seg_gather(glut, v8, 2)
                ref[...] = jax.lax.bitcast_convert_type(w, jnp.float32)
            elif unit_out:
                # colorspace.u8_to_unit semantics: f32 DIVISION by 255
                ref[...] = v8.astype(jnp.float32) / jnp.float32(255.0)
            else:
                ref[...] = v8

    return _lab_inv_kernel


def _lab_inv_tables(with_ig: bool = True):
    if "inv" not in _LAB_TABS:
        import numpy as _np

        from underwater_image_enhancement_tpu.ops import lab_tables as lt

        yf = _np.asarray(lt.L2YF_TAB, _np.int32)        # (256, 2), <= 2^14
        packed_yf = _pack_u32((yf[:, 0], 0), (yf[:, 1], 16))
        igt = _np.asarray(lt.INV_GAMMA_TAB, _np.int32)   # (4096,) u8 values
        packed_ig = _pack_u32((igt[0::4], 0), (igt[1::4], 8),
                              (igt[2::4], 16), (igt[3::4], 24))
        _LAB_TABS["inv"] = (packed_yf.reshape(2, 128),
                            packed_ig.reshape(8, 128))
    yf, ig = _LAB_TABS["inv"]
    return (yf, ig) if with_ig else (yf,)


TILE_LAB = 128  # rows per grid step for the plane-wise LAB kernels


def _row_tile(H: int) -> int:
    """Largest row-tile in [8, TILE_LAB] (multiple of 8) dividing H — a
    dividing tile skips the pad+crop plane copies around the kernel
    (~0.1 ms/leg at 1080p, where H=1080 is 128-indivisible but 120 | 1080).
    Falls back to TILE_LAB (ceil-pad) when H has no such divisor."""
    for t in range(TILE_LAB, 7, -8):
        if H % t == 0:
            return t
    return TILE_LAB


def _lab_plane_call(kernel, inputs, tables, in_dtype, out_dtype, n_out=3):
    """Shared launch for the plane-wise LAB kernels: pad to (tile, 128)
    tiles (none when the tile divides), run, crop."""
    H, W = inputs[0].shape
    tile = _row_tile(H)
    Hp = -(-H // tile) * tile
    Wp = -(-W // 128) * 128
    pads = ((0, Hp - H), (0, Wp - W))
    if Hp == H and Wp == W:
        padded = tuple(p.astype(in_dtype) for p in inputs)
    else:
        padded = tuple(jnp.pad(p.astype(in_dtype), pads) for p in inputs)
    grid = (Hp // tile, Wp // 128)
    img_spec = pl.BlockSpec((tile, 128), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    tab = lambda s: pl.BlockSpec((s, 128), lambda i, j: (0, 0),
                                 memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[img_spec] * len(padded) + [tab(t.shape[0]) for t in tables],
        out_specs=[img_spec] * n_out,
        out_shape=[jax.ShapeDtypeStruct((Hp, Wp), out_dtype)] * n_out,
        interpret=_interpret(),
    )(*padded, *(jnp.asarray(t) for t in tables))
    return tuple(o[:H, :W] for o in outs)


def _make_lab_forward(unit_in: bool, fast=False, l_only: bool = False):
    """fast=False: exact 12-segment CBRT gather.  fast=True: arithmetic
    surrogate + probe corrections (bit-identical by construction, modulo
    the documented per-instance ulp instability).  fast="approx2":
    2-step-Newton surrogate, no corrections — the six --fast tier.
    l_only: compute/write ONLY the L plane (one CBRT lookup instead of
    three, one output plane's HBM write instead of three) — the
    brightness-metric tier; returns a single plane."""

    @jax.custom_batching.custom_vmap
    def fwd(r, g, b):
        if fast == "approx2":
            corr = "approx2"
        else:
            corr = _corrections("cbrt") if fast else None
        outs = _lab_plane_call(
            _make_lab_fwd_kernel(unit_in, corr, l_only), (r, g, b),
            _lab_fwd_tables(with_cbrt=corr is None),
            jnp.float32 if unit_in else jnp.int32, jnp.int32,
            n_out=1 if l_only else 3)
        return outs[0] if l_only else outs

    _pointwise_flatten_vmap(fwd)
    return jax.jit(fwd)


def _make_lab_inverse(unit_out: bool):
    @jax.custom_batching.custom_vmap
    def inv(L, a, b):
        corr = _corrections("inv_gamma")
        return _lab_plane_call(
            _make_lab_inv_kernel(unit_out, corr), (L, a, b),
            _lab_inv_tables(with_ig=corr is None),
            jnp.int32, jnp.float32 if unit_out else jnp.int32)

    _pointwise_flatten_vmap(inv)
    return jax.jit(inv)


def _make_lab_inverse_gamma():
    @jax.custom_batching.custom_vmap
    def inv(L, a, b, glut):
        corr = _corrections("inv_gamma")
        packed = jax.lax.bitcast_convert_type(
            glut.astype(jnp.float32), jnp.int32).reshape(2, 128)
        return _lab_plane_call(
            _make_lab_inv_kernel(True, corr, gamma=True), (L, a, b),
            _lab_inv_tables(with_ig=corr is None) + (packed,),
            jnp.int32, jnp.float32)

    def rule(axis_size, in_batched, L, a, b, glut):
        if in_batched[3]:
            raise ValueError("gamma LUT cannot carry a batch axis")
        args = tuple(
            x if bt else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            for x, bt in zip((L, a, b), in_batched[:3]))
        shp = args[0].shape
        flat = tuple(x.reshape(-1, shp[-1]) for x in args)
        outs = inv(*flat, glut)
        return tuple(o.reshape(shp) for o in outs), (True,) * 3

    inv.def_vmap(rule)
    return jax.jit(inv)


def _pointwise_flatten_vmap(fn):
    """custom_vmap rule for a pointwise (plane -> plane) kernel: fold the
    batch dim into rows, run the 2-D kernel once, unfold.  Exact for
    pointwise maps; composes under nested vmap (the rule re-enters fn)."""

    def rule(axis_size, in_batched, *args):
        args = tuple(
            a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            for a, b in zip(args, in_batched))
        shp = args[0].shape              # (B, H, W)
        flat = tuple(a.reshape(-1, shp[-1]) for a in args)
        outs = fn(*flat)
        if not isinstance(outs, tuple):
            return outs.reshape(shp), True
        return tuple(o.reshape(shp) for o in outs), (True,) * len(outs)

    fn.def_vmap(rule)
    return fn


lab_forward_planes = _make_lab_forward(False)
lab_forward_planes.__doc__ = (
    """Bit-exact cv2 RGB2LAB on u8-valued int32 planes (H, W) -> (L, a, b).

    Same fixed-point pipeline as colorspace.rgb_to_lab_u8_exact_planes
    (lab_tables.py cites the OpenCV sources), with the GAMMA/CBRT tables as
    in-VMEM lane gathers instead of arithmetic surrogates.  vmap-safe: the
    custom_vmap rule folds the batch dim into rows (pointwise map).""")

lab_forward_l_plane = _make_lab_forward(False, l_only=True)
lab_forward_l_plane.__doc__ = (
    """L plane only of bit-exact cv2 RGB2LAB on u8-valued int32 planes:
    one CBRT lookup (fY) instead of three and one output plane's HBM
    write instead of three — the brightness metric
    (quality_assessment.py:99-123) reads only mean L.  Bit-identical to
    lab_forward_planes[0].""")

lab_forward_planes_unit = _make_lab_forward(True)
lab_forward_planes_unit.__doc__ = (
    """rgb_to_lab on float unit planes: quantize_u8 (clip+truncate) happens
    IN-KERNEL, saving the separate int32 quantize pass's HBM roundtrip.
    Bit-identical to quantize_u8 + lab_forward_planes.""")

lab_forward_planes_unit_fast = _make_lab_forward(True, fast=True)
lab_forward_planes_unit_fast.__doc__ = (
    """Throughput-tier forward LAB: the CBRT table is evaluated as Newton
    arithmetic + probed corrections instead of a 12-segment lane gather —
    ~1.5x faster, but the last-ulp instability across kernel instances can
    flip ~1e-4 of a/b pixels by +-1 LSB (see the probe-transfer note above).
    Exact paths keep the gather.""")

lab_forward_planes_unit_approx = _make_lab_forward(True, fast="approx2")
lab_forward_planes_unit_approx.__doc__ = (
    """six --fast tier forward LAB: 2-step-Newton CBRT surrogate with NO
    corrections — drops ~90 VPU ops/pixel (2 Newton steps + ~6 fixup
    selects per channel) vs the corrected _fast kernel.  +-1 table LSB on
    ~12% of CBRT entries => L/a/b each within +-1 u8 LSB of exact
    (>= ~48 dB), well inside the fast tier's >= 25 dB contract
    (tests/test_strategies.py::test_six_fast_mode_close_to_exact).""")

lab_inverse_planes = _make_lab_inverse(False)
lab_inverse_planes.__doc__ = (
    """Bit-exact cv2 LAB2RGB on u8-valued int32 planes (H, W) -> (r, g, b).

    Same fixed-point pipeline as colorspace.lab_to_rgb_u8_exact_planes
    (OpenCV Lab2RGBinteger; table notes in lab_tables.py).  The L2YF table
    is a packed in-VMEM lane gather; INV_GAMMA is evaluated as sqrt-chain
    arithmetic + probed corrections (bit-exact on hardware in every tested
    context — pinned by tests/test_tpu_hw.py — with a gather fallback when
    the probe finds > 32 divergent entries).  vmap-safe via the same
    row-folding custom_vmap rule as the forward kernel.""")

lab_inverse_planes_unit = _make_lab_inverse(True)
lab_inverse_planes_unit.__doc__ = (
    """lab_to_rgb emitting float unit planes: the u8_to_unit f32 division
    happens IN-KERNEL.  u8 values identical to lab_inverse_planes; the
    /255 conversion may differ 1 ulp from a jitted XLA division (which is
    itself a reciprocal-multiply 1 ulp off IEEE on 126/256 values).""")

lab_inverse_planes_unit_gamma = _make_lab_inverse_gamma()
lab_inverse_planes_unit_gamma.__doc__ = (
    """lab_to_rgb + unit conversion + gamma**g, fused: glut is the (256,)
    f32 table pow(k/255, g) (k/255 by true f32 division — stretch._U8_GRID),
    gathered exactly in-kernel, skipping the standalone gamma pass's
    full-frame HBM roundtrip.  Within 1 ulp of lab_inverse_planes_unit ->
    gamma_correction_pow (XLA's pow drifts the last ulp between evaluation
    shapes).  The six strategies with a post-CLAHE gamma
    (six_stadigy.py:239,277,285) ride this epilogue.""")
