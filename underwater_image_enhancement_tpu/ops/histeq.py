"""Histogram equalization and CLAHE with OpenCV-compatible integer semantics.

Reference behaviors reproduced:
- ``histogram_equalization`` (enhancement_strategies.py:330-345): per-channel
  ``cv2.equalizeHist`` on uint8.
- ``clahe_enhancement`` (enhancement_strategies.py:287-307) and
  ``apply_clahe`` (six_stadigy.py:201-208): cv2.createCLAHE on the LAB L
  channel, 8x8 tiles, bilinear LUT interpolation.

Both are implemented with OpenCV's exact integer arithmetic (integer
histograms, clipped-excess redistribution with the residual stepping loop,
round-half-even LUT quantization, REFLECT_101 padding to tile multiples) so
the L-channel transform is bit-exact vs cv2; see tests/test_histeq.py.

Histograms use one scatter-add; per-pixel LUT application uses 4 gathers.
Values are carried as int32 (TPU-friendly).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from underwater_image_enhancement_tpu.ops import colorspace as cs


def _round_half_even(x: jnp.ndarray) -> jnp.ndarray:
    """cvRound == IEEE round-half-to-even (jnp.rint)."""
    return jnp.rint(x)


def _histogram256(rows: jnp.ndarray) -> jnp.ndarray:
    """256-bin histograms of int32 rows: (T, N) -> (T, 256).

    Two-level one-hot OUTER PRODUCT on the MXU: hist[hi, lo] = sum_px
    onehot16(hi_px) x onehot16(lo_px), i.e. a (16, N) x (N, 16) batched
    matmul — 32 VPU compares/px + a trivial contraction, vs 512 ops/px for
    the flat 256-wide compare-reduce (and ~600x faster than scatter-add,
    which serializes).  One-hot entries are 0/1 (exact in bf16) and counts
    accumulate in f32, which is exact only below 2^24 — rows longer than
    8M pixels are therefore chunked and the int32 partial counts summed,
    so a 33MP single-tone frame still histograms exactly.
    """
    N = rows.shape[1]
    CHUNK = 1 << 23
    if N > CHUNK:
        total = None
        for s in range(0, N, CHUNK):
            part = _histogram256(rows[:, s:s + CHUNK])
            total = part if total is None else total + part
        return total
    bins = jnp.arange(16, dtype=jnp.int32)
    hi_oh = ((rows >> 4)[:, :, None] == bins).astype(jnp.bfloat16)
    lo_oh = ((rows & 15)[:, :, None] == bins).astype(jnp.bfloat16)
    hist = jax.lax.dot_general(
        hi_oh, lo_oh,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (T, 16 hi, 16 lo)
    return hist.reshape(rows.shape[0], 256).astype(jnp.int32)


def histogram256(rows: jnp.ndarray) -> jnp.ndarray:
    """Public alias of the MXU one-hot-matmul histogram: (T, N) i32 -> (T, 256)."""
    return _histogram256(rows)


def shannon_entropy_u8(plane_u8: jnp.ndarray) -> jnp.ndarray:
    """Shannon entropy (base 2) of a uint8-valued int32 plane — matches
    skimage.measure.shannon_entropy on u8 data (np.unique counts == a
    256-bin histogram here; quality_assessment.py:57-75 semantics).

    Uses the two-level one-hot MXU histogram (32 ops/px) rather than a
    256-wide compare-reduce (512 ops/px) — this sits inside the Phase-1
    labeling program's inner loop, so the histogram formulation matters.
    """
    flat = plane_u8.reshape(-1)
    hist = _histogram256(flat[None, :])[0].astype(jnp.float32)
    p = hist / flat.shape[0]
    return -jnp.sum(jnp.where(p > 0, p * jnp.log2(jnp.maximum(p, 1e-30)), 0.0))


def _apply_lut256(vals_u8: jnp.ndarray, lut: jnp.ndarray) -> jnp.ndarray:
    """lut[vals] for a (256,) int32 LUT over int32 values in [0, 255],
    WITHOUT an XLA gather — gathers serialize on TPU (the straight
    ``lut[flat]`` formulation measured 1.5 GB/s, 90 ms per 1080p channel
    inside the batched label program).  Two-level one-hot contraction
    instead: rows = onehot16(hi) @ lut.reshape(16, 16) on the MXU, then a
    16-wide VPU dot with onehot16(lo).  One-hot entries and LUT values
    (<= 255) are exact in bf16; accumulation in f32 is exact."""
    flat = vals_u8.reshape(-1)
    bins = jnp.arange(16, dtype=jnp.int32)
    hi_oh = ((flat >> 4)[:, None] == bins).astype(jnp.bfloat16)
    lo_oh = ((flat & 15)[:, None] == bins).astype(jnp.bfloat16)
    table = lut.reshape(16, 16).astype(jnp.bfloat16)
    rows = jax.lax.dot_general(
        hi_oh, table, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (n, 16): the hi-row of lut
    out = jnp.sum(rows * lo_oh.astype(jnp.float32), axis=1)
    return out.astype(jnp.int32).reshape(vals_u8.shape)


@jax.jit
def equalize_hist_u8(channel_u8: jnp.ndarray) -> jnp.ndarray:
    """cv2.equalizeHist on a single uint8-valued int32 plane (H, W).

    OpenCV semantics: the first occupied bin maps to 0 and is excluded from
    the normalizer; lut[i] = round(cumsum_{i0<j<=i} hist[j] * 255/(N-hist[i0])).
    A constant image is returned unchanged.
    """
    flat = channel_u8.reshape(-1)
    n = flat.shape[0]
    hist = _histogram256(flat[None, :])[0]
    occupied = hist > 0
    # first occupied bin index
    i0 = jnp.argmax(occupied)
    h0 = hist[i0]
    cdf = jnp.cumsum(hist)
    denom = (n - h0).astype(jnp.float32)
    scale = jnp.where(denom > 0, 255.0 / jnp.maximum(denom, 1.0), 0.0)
    shifted = (cdf - cdf[i0]).astype(jnp.float32)
    lut = _round_half_even(shifted * scale).astype(jnp.int32)
    lut = jnp.clip(lut, 0, 255)
    out = _apply_lut256(channel_u8, lut)
    # constant image: cv2 copies the source through unchanged
    return jnp.where(denom > 0, out, channel_u8)


@jax.jit
def histogram_equalization(img: jnp.ndarray) -> jnp.ndarray:
    """enhancement_strategies.py:330-345: per-channel equalizeHist of
    (img*255).u8, returned as float in [0,1].  img: (H, W, 3)."""
    u8 = cs.quantize_u8(img)
    chans = [equalize_hist_u8(u8[..., c]) for c in range(3)]
    return cs.u8_to_unit(jnp.stack(chans, axis=-1))


def histogram_equalization_planes(planes):
    """Channel-first variant: (r, g, b) float planes -> equalized planes."""
    return tuple(
        cs.u8_to_unit(equalize_hist_u8(cs.quantize_u8(p))) for p in planes
    )


def _clahe_luts(tiles: jnp.ndarray, tile_area: int, clip_limit) -> jnp.ndarray:
    """Per-tile CLAHE LUTs, OpenCV integer arithmetic.

    tiles: (T, tile_area) int32 pixel values.  Returns (T, 256) int32 LUTs.
    clip_limit: a float (shared) or a static (T,) numpy int array of
    per-tile clip COUNTS (already max(int(limit*area/256), 1)) — the
    per-image-limit form used when several images' tiles are folded into
    one batch (clahe_u8_batch with a tuple of limits).
    """
    import numpy as _np

    hist = _histogram256(tiles)

    if isinstance(clip_limit, _np.ndarray):
        clip = jnp.asarray(clip_limit.astype(_np.int32))[:, None]
    else:
        clip = max(int(clip_limit * tile_area / 256.0), 1)
    clipped = jnp.minimum(hist, clip)
    excess = jnp.sum(hist - clipped, axis=1)  # (T,)

    redist = excess // 256
    residual = excess - redist * 256  # in [0, 255]
    clipped = clipped + redist[:, None]

    # OpenCV residual loop: step = max(256//residual, 1); bins 0, step, 2*step,
    # ... each get +1 until residual is exhausted (exactly `residual` bins).
    # Vectorized: bin i gets +1 iff i % step == 0 and i/step < residual.
    step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)  # (T,)
    bins = jnp.arange(256, dtype=jnp.int32)[None, :]  # (1, 256)
    hits = (bins % step[:, None] == 0) & (bins // step[:, None] < residual[:, None])
    clipped = clipped + hits.astype(jnp.int32)

    lut_scale = 255.0 / float(tile_area)
    cdf = jnp.cumsum(clipped, axis=1).astype(jnp.float32)
    return jnp.clip(_round_half_even(cdf * lut_scale), 0, 255).astype(jnp.int32)


def _pad_bands(xb: jnp.ndarray, tiles_x: int, tiles_y: int):
    """(B, H, W) -> half-tile-padded band-block frame (B, by*th, bx*tw):
    REFLECT_101 to tile multiples, then edge-pad by a half tile so the
    "which 4 LUTs" partition becomes a uniform (tiles+1)-band grid."""
    Bn, H, W = xb.shape
    th = -(-H // tiles_y)
    tw = -(-W // tiles_x)
    x = jnp.pad(xb, ((0, 0), (0, th * tiles_y - H), (0, tw * tiles_x - W)),
                mode="reflect")
    pt, plf = th // 2, tw // 2
    xp2 = jnp.pad(x, ((0, 0), (pt, th - pt), (plf, tw - plf)), mode="edge")
    return x, xp2, th, tw, pt, plf


def _clahe_prep(xb: jnp.ndarray, clip_limit,
                tiles_x: int, tiles_y: int):
    """Shared CLAHE front half: padding, per-tile LUTs, band-block LUT
    gather, OpenCV f32 interpolation weights.  xb: (B, H, W) i32.
    clip_limit: float, or a length-B tuple of per-image limits (the
    folded-batch path where each image keeps its own clip)."""
    import numpy as _np

    Bn, H, W = xb.shape
    x, xp2, th, tw, pt, plf = _pad_bands(xb, tiles_x, tiles_y)
    by, bx = tiles_y + 1, tiles_x + 1
    NB = by * bx

    T = tiles_y * tiles_x
    tiles = (
        x.reshape(Bn, tiles_y, th, tiles_x, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(Bn * T, th * tw)
    )
    if isinstance(clip_limit, tuple):
        assert len(clip_limit) == Bn
        clip_limit = _np.repeat(
            _np.array([max(int(c * (th * tw) / 256.0), 1)
                       for c in clip_limit], _np.int64), T)
    luts = _clahe_luts(tiles, th * tw, clip_limit).reshape(Bn, T, 256)

    # the 4 fixed LUT ids per band-block (static python ints, same per image)
    r1 = _np.clip(_np.arange(by) - 1, 0, tiles_y - 1)
    r2 = _np.clip(_np.arange(by), 0, tiles_y - 1)
    c1 = _np.clip(_np.arange(bx) - 1, 0, tiles_x - 1)
    c2 = _np.clip(_np.arange(bx), 0, tiles_x - 1)
    ids = _np.stack(
        [
            (r1[:, None] * tiles_x + c1[None, :]),  # TL
            (r1[:, None] * tiles_x + c2[None, :]),  # TR
            (r2[:, None] * tiles_x + c1[None, :]),  # BL
            (r2[:, None] * tiles_x + c2[None, :]),  # BR
        ],
        axis=-1,
    ).reshape(NB, 4)
    luts4 = luts[:, jnp.asarray(ids)]  # (Bn, NB, 4, 256) — row gather, cheap

    # band-block-frame OpenCV f32 weights: index 0 = first PADDED row/col,
    # i.e. crop-frame coordinate -pt (resp. -plf)
    f32 = _np.float32
    tyf = (_np.arange(-pt, by * th - pt, dtype=f32) * f32(1.0 / th)
           - f32(0.5)).astype(f32)
    txf = (_np.arange(-plf, bx * tw - plf, dtype=f32) * f32(1.0 / tw)
           - f32(0.5)).astype(f32)
    ya_np = (tyf - _np.floor(tyf)).astype(f32)
    xa_np = (txf - _np.floor(txf)).astype(f32)
    return xp2, luts4, ya_np, xa_np, th, tw, by, bx, pt, plf


def _clahe_u8_batched(xb: jnp.ndarray, clip_limit: float,
                      tiles_x: int, tiles_y: int, impl: str) -> jnp.ndarray:
    """cv2 CLAHE on (B, H, W) uint8-valued int32 planes, bit-exact.

    The batch dim folds into the tile/band-block axes, so B images cost the
    same program SHAPE as one image with B x the blocks — this is also the
    custom_vmap rule for clahe_u8 (a vmapped one-hot-matmul formulation
    measured pathological: the batched intermediates spill to HBM).
    """
    import numpy as _np

    Bn, H, W = xb.shape
    xp2, luts4, ya_np, xa_np, th, tw, by, bx, pt, plf = _clahe_prep(
        xb, clip_limit, tiles_x, tiles_y)
    Hp, Wp = th * tiles_y, tw * tiles_x
    NB = by * bx

    from underwater_image_enhancement_tpu.ops import pallas_kernels as pk

    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        # one fused VMEM pass per band-block: LUT lane-gathers + OpenCV f32
        # bilinear arithmetic (pallas_kernels.clahe_apply, bit-identical)
        out = pk.clahe_apply(
            xp2, luts4.reshape(Bn * NB, 4, 256).astype(jnp.float32),
            ya_np, xa_np, th, tw, by, bx,
        )
        return out[:, pt:pt + H, plf:plf + W]

    blocks = (
        xp2.reshape(Bn, by, th, bx, tw)
        .transpose(0, 1, 3, 2, 4)
        .reshape(Bn * NB, th * tw)
    )

    # Two-level (64 lo x 4 hi) one-hot matmul, chunked over band-blocks:
    # vs the earlier per-block 256-wide scan this quarters the one-hot
    # construction cost AND replaces 81 sequential dispatches with ~6
    # parallel batched matmuls.  One-hot entries and LUT values (<= 255) are
    # exact in bfloat16 with an f32 accumulator, and the page-select sums a
    # single non-zero term, so mapped values stay exact integers.
    bins_lo = jnp.arange(64, dtype=jnp.int32)
    CH = 16  # blocks per chunk: bounds the (c, A, 64) one-hot intermediate
    t4 = luts4.astype(jnp.bfloat16).reshape(Bn * NB, 4, 4, 64)
    parts = []
    for s in range(0, Bn * NB, CH):
        vals = blocks[s:s + CH]  # (c, A)
        lo = vals & 63
        hi = vals >> 6
        oh = (lo[:, :, None] == bins_lo[None, None, :]).astype(jnp.bfloat16)
        tmp = jax.lax.dot_general(
            oh, t4[s:s + CH],
            dimension_numbers=(((2,), (3,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (c, A, 4 luts, 4 hi-pages)
        pidx = jnp.arange(4, dtype=jnp.int32)[None, None, None, :]
        parts.append(jnp.sum(
            jnp.where(hi[:, :, None, None] == pidx, tmp, 0.0), axis=3
        ))
    mapped = jnp.concatenate(parts, axis=0)  # (Bn*NB, A, 4)
    mapped = (
        mapped.reshape(Bn, by, bx, th, tw, 4)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(Bn, by * th, bx * tw, 4)[:, pt : pt + Hp, plf : plf + Wp]
    )

    # The same host-f32 OpenCV weights _clahe_prep built for the band
    # frame, re-sliced to the crop frame (band index pt+i == crop index i:
    # identical f32 values, ONE source of the tie-critical formula).  The
    # accumulation order ((p11*xa1 + p12*xa)*ya1 + (p21*xa1 + p22*xa)*ya)
    # replicates OpenCV's float32 path bit-for-bit (empirically verified);
    # optimization_barrier keeps XLA from FMA-contracting it, which would
    # shift exact .5 ties in the final cvRound.
    f32 = _np.float32
    ya_c = ya_np[pt:pt + Hp]
    xa_c = xa_np[plf:plf + Wp]
    ya = jnp.asarray(ya_c)[None, :, None]
    xa = jnp.asarray(xa_c)[None, None, :]
    ya1 = jnp.asarray((f32(1.0) - ya_c).astype(f32))[None, :, None]
    xa1 = jnp.asarray((f32(1.0) - xa_c).astype(f32))[None, None, :]
    bar = jax.lax.optimization_barrier
    top = bar(bar(mapped[..., 0] * xa1) + bar(mapped[..., 1] * xa))
    bot = bar(bar(mapped[..., 2] * xa1) + bar(mapped[..., 3] * xa))
    v = bar(top * ya1) + bar(bot * ya)
    out = jnp.clip(_round_half_even(v), 0, 255).astype(jnp.int32)
    return out[:, :H, :W]


_CLAHE_CV_CACHE: dict = {}


def _clahe_cv(clip_limit: float, tiles_x: int, tiles_y: int, impl: str):
    """custom_vmap wrapper per static config: vmap folds the batch into the
    tile/block axes of _clahe_u8_batched instead of batching the program."""
    key = (clip_limit, tiles_x, tiles_y, impl)
    if key not in _CLAHE_CV_CACHE:

        @jax.custom_batching.custom_vmap
        def f(x):
            return _clahe_u8_batched(x[None], clip_limit, tiles_x, tiles_y,
                                     impl)[0]

        @f.def_vmap
        def _rule(axis_size, in_batched, x):
            if not in_batched[0]:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            lead = x.shape[:-2]
            out = _clahe_u8_batched(x.reshape((-1,) + x.shape[-2:]),
                                    clip_limit, tiles_x, tiles_y, impl)
            return out.reshape(lead + out.shape[-2:]), True

        _CLAHE_CV_CACHE[key] = f
    return _CLAHE_CV_CACHE[key]


@partial(jax.jit, static_argnames=("clip_limit", "tiles_x", "tiles_y", "impl"))
def clahe_u8(channel_u8: jnp.ndarray, clip_limit: float = 2.0,
             tiles_x: int = 8, tiles_y: int = 8,
             impl: str = "auto") -> jnp.ndarray:
    """cv2 CLAHE on a uint8-valued int32 plane (H, W), bit-exact.

    Pads to tile multiples with REFLECT_101, builds per-tile clipped LUTs,
    bilinearly interpolates between the 4 neighboring tile LUTs, crops back.

    impl: "pallas" runs the LUT apply + interpolation as one fused VMEM
    kernel (ops/pallas_kernels.py:clahe_apply — bit-identical, ~3x less HBM
    traffic); "xla" is the one-hot-matmul formulation; "auto" picks pallas
    on the TPU backend.  vmap-safe: a custom_vmap rule folds the batch dim
    into the band-block axes (see _clahe_u8_batched)."""
    return _clahe_cv(float(clip_limit), tiles_x, tiles_y, impl)(channel_u8)


def clahe_u8_batch(batch_u8: jnp.ndarray, clip_limit=2.0,
                   tiles_x: int = 8, tiles_y: int = 8,
                   impl: str = "auto") -> jnp.ndarray:
    """Explicit batched CLAHE: (B, H, W) int32 -> (B, H, W), bit-exact
    per image (identical to mapping clahe_u8 over the batch).
    clip_limit may be a length-B tuple of PER-IMAGE limits — the batch
    still runs as one folded program (one histogram/LUT/apply pass)."""
    cl = clip_limit if isinstance(clip_limit, tuple) else float(clip_limit)
    return _clahe_u8_batched(batch_u8, cl, tiles_x, tiles_y, impl)


def clahe_enhancement_planes_multi(planes_list, clip_limits,
                                   tiles_x: int = 8, tiles_y: int = 8):
    """N independent CLAHE-LAB roundtrips as ONE folded program.

    planes_list: sequence of (r, g, b) float plane tuples (same H, W);
    clip_limits: matching per-roundtrip limits.  The LAB conversions fold
    the N images into rows and CLAHE folds them into its tile/band-block
    axes, so one histogram + one LUT build + one apply pass cover all N —
    bit-identical per image to clahe_enhancement_planes (the six-strategy
    program uses this to run its 5 independent CLAHE legs in one pass).
    """
    from underwater_image_enhancement_tpu.ops import pallas_kernels as pk

    if pk.is_batched(*(pl_[0] for pl_ in planes_list)):
        # vmapped caller: the manual folds below aren't vmap-safe; the
        # per-leg ops carry their own custom_vmap batch rules instead
        return [clahe_enhancement_planes(pl_, c)
                for pl_, c in zip(planes_list, clip_limits)]
    N = len(planes_list)
    H, W = planes_list[0][0].shape
    stacked = tuple(
        jnp.concatenate([pl_[c].reshape(H, W) for pl_ in planes_list], axis=0)
        for c in range(3))  # 3 x (N*H, W) row-folded planes
    L, a, b = cs.rgb_unit_to_lab_planes(*stacked)
    Lb = _clahe_u8_batched(L.reshape(N, H, W), tuple(clip_limits),
                           tiles_x, tiles_y, "auto")
    rgb = cs.lab_to_rgb_unit_planes(Lb.reshape(N * H, W), a, b)
    return [tuple(c[i * H:(i + 1) * H] for c in rgb) for i in range(N)]


def _clahe_lab_fused_batched(Lb, ab, bb, clip_limit: float,
                             tiles_x: int, tiles_y: int):
    """CLAHE(L) + inverse LAB as one fused Pallas pass (TPU throughput
    path): the a/b planes ride along in the same band-block frame so the
    mapped L' never round-trips HBM.  (B, H, W) i32 x3 -> (r, g, b) i32.
    Bit-identical to clahe_u8 + lab_to_rgb_u8_exact_planes."""
    from underwater_image_enhancement_tpu.ops import pallas_kernels as pk

    Bn, H, W = Lb.shape
    xp2, luts4, ya_np, xa_np, th, tw, by, bx, pt, plf = _clahe_prep(
        Lb, clip_limit, tiles_x, tiles_y)
    _, ap2, _, _, _, _ = _pad_bands(ab, tiles_x, tiles_y)
    _, bp2, _, _, _, _ = _pad_bands(bb, tiles_x, tiles_y)
    r, g, b = pk.clahe_lab_apply(
        xp2, ap2, bp2,
        luts4.reshape(Bn * by * bx, 4, 256).astype(jnp.float32),
        ya_np, xa_np, th, tw, by, bx,
    )
    crop = lambda x: x[:, pt:pt + H, plf:plf + W]
    return crop(r), crop(g), crop(b)


_FUSED_CV_CACHE: dict = {}


def _clahe_lab_fused_cv(clip_limit: float, tiles_x: int, tiles_y: int):
    key = (clip_limit, tiles_x, tiles_y)
    if key not in _FUSED_CV_CACHE:

        @jax.custom_batching.custom_vmap
        def f(L, a, b):
            out = _clahe_lab_fused_batched(L[None], a[None], b[None],
                                           clip_limit, tiles_x, tiles_y)
            return tuple(o[0] for o in out)

        @f.def_vmap
        def _rule(axis_size, in_batched, L, a, b):
            args = tuple(
                x if bt else jnp.broadcast_to(x[None], (axis_size,) + x.shape)
                for x, bt in zip((L, a, b), in_batched))
            lead = args[0].shape[:-2]
            flat = tuple(x.reshape((-1,) + x.shape[-2:]) for x in args)
            out = _clahe_lab_fused_batched(*flat, clip_limit, tiles_x,
                                           tiles_y)
            return (tuple(o.reshape(lead + o.shape[-2:]) for o in out),
                    (True, True, True))

        _FUSED_CV_CACHE[key] = f
    return _FUSED_CV_CACHE[key]


@partial(jax.jit, static_argnames=("clip_limit", "tiles_x", "tiles_y"))
def clahe_enhancement(img: jnp.ndarray, clip_limit: float = 2.0,
                      tiles_x: int = 8, tiles_y: int = 8) -> jnp.ndarray:
    """LAB-L CLAHE roundtrip — enhancement_strategies.py:287-307 /
    six_stadigy.py:201-208.  img: (H, W, 3) float in [0,1] -> same."""
    planes = tuple(img[..., c] for c in range(3))
    out = clahe_enhancement_planes(planes, clip_limit, tiles_x, tiles_y)
    return jnp.stack(out, axis=-1)


def clahe_enhancement_planes(planes, clip_limit: float = 2.0,
                             tiles_x: int = 8, tiles_y: int = 8,
                             impl: str = "auto", lab_fast: bool = False,
                             gamma: float | None = None):
    """Channel-first LAB-L CLAHE roundtrip: (r, g, b) float planes -> same.
    Identical arithmetic to clahe_enhancement (bit-exact vs cv2); avoids
    channel-minor NHWC tensors in composed programs.

    impl: "fused" runs CLAHE apply + inverse LAB as ONE Pallas pass
    (pallas_kernels.clahe_lab_apply — bit-identical); "split" is clahe_u8 +
    lab_to_rgb.  "auto" = split: the fused pass measured SLOWER on v5e
    (1.45 vs 1.20 ms/leg at 1080p) because the inverse arithmetic — the
    expensive half — runs on the band-block frame's ~35% padding overhead
    instead of the cropped plane; kept as an option + bit-identity test.
    On TPU the quantize/unit conversions run inside the LAB kernels.

    lab_fast=True routes the forward conversion through the uncorrected
    2-step-Newton CBRT kernel (pallas_kernels.lab_forward_planes_unit_approx:
    L/a/b within +-1 u8 LSB of exact, ~48 dB) — the six --fast tier opts
    in; its gate is >= 25 dB vs the exact tier.

    gamma: fold a trailing ``out**gamma`` (six_stadigy's post-CLAHE gamma)
    into the inverse-LAB epilogue — within 1 ulp of composing
    stretch.gamma_correction_pow afterwards (exact 256-entry LUT), one
    fewer full-frame pass on TPU."""
    from underwater_image_enhancement_tpu.ops import pallas_kernels as pk

    if (lab_fast and jax.default_backend() == "tpu"
            and planes[0].ndim == 2):
        # vmap-safe: the kernel carries the row-folding custom_vmap rule
        L, a, b = pk.lab_forward_planes_unit_approx(*planes)
    else:
        L, a, b = cs.rgb_unit_to_lab_planes(*planes)
    if impl == "auto":
        impl = "split"
    if impl == "fused" and L.ndim == 2:
        rgb = _clahe_lab_fused_cv(float(clip_limit), tiles_x, tiles_y)(
            L, a, b)
        out = tuple(cs.u8_to_unit(c) for c in rgb)
        if gamma is not None:
            from underwater_image_enhancement_tpu.ops.stretch import (
                gamma_correction_pow)

            out = tuple(gamma_correction_pow(c, gamma) for c in out)
        return out
    L = clahe_u8(L, clip_limit, tiles_x, tiles_y)
    if gamma is not None:
        return cs.lab_to_rgb_unit_gamma_planes(L, a, b, gamma)
    return cs.lab_to_rgb_unit_planes(L, a, b)
