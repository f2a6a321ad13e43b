"""Color-space conversions with OpenCV-compatible semantics, in pure JAX.

The reference project round-trips through OpenCV's uint8 conversions everywhere
(e.g. ``cv2.cvtColor((img*255).astype(np.uint8), cv2.COLOR_RGB2GRAY)`` at
enhancement_strategies.py:180, quality_assessment.py:25, RGB2LAB at
enhancement_strategies.py:299, RGB2HSV at quality_assessment.py:88).  To hit
bit-close parity, this module reproduces OpenCV's quantized conversions:

- BIT-EXACT vs cv2 5.x: ``rgb_to_gray_u8`` (fixed point, shift 15),
  ``rgb_to_hsv_u8`` (division tables), ``rgb_to_lab_u8_exact`` /
  ``lab_to_rgb_u8_exact`` (OpenCV's full integer pipelines,
  docs/lab_bitexact_notes.md).
- ``rgb_to_lab_u8`` / ``lab_to_rgb_u8``: exact-FLOAT-math variants (within
  ~2 LSB of cv2's tables on rare pixels); kept for callers that prefer the
  mathematically exact formulas over cv2 emulation.

Integer images are carried as int32 (TPU-friendly; uint8 compute is not).
All functions are shape-polymorphic over leading batch dims: they operate on
the trailing channel dim only, so (H,W,3) and (B,H,W,3) both work.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# sRGB -> XYZ (D65) matrix and white point, as used by OpenCV.
_RGB2XYZ_NP = np.array(
    [
        [0.412453, 0.357580, 0.180423],
        [0.212671, 0.715160, 0.072169],
        [0.019334, 0.119193, 0.950227],
    ],
    dtype=np.float64,
)
_RGB2XYZ = jnp.asarray(_RGB2XYZ_NP, dtype=jnp.float32)
_XYZ2RGB = jnp.asarray(np.linalg.inv(_RGB2XYZ_NP), dtype=jnp.float32)
_WHITE = jnp.array([0.950456, 1.0, 1.088754], dtype=jnp.float32)

# cv2 5.x RGB2GRAY fixed-point weights (shift 15), empirically bit-exact.
_GRAY_SHIFT = 15
_R2Y = 9798
_G2Y = 19235
_B2Y = 32768 - _R2Y - _G2Y  # 3735


def quantize_u8(img: jnp.ndarray) -> jnp.ndarray:
    """``(img * 255).astype(np.uint8)`` — the reference's float->u8 step.

    Note numpy's ``astype(uint8)`` truncates toward zero (no rounding); the
    reference relies on this everywhere, so we floor, not round.
    Returns int32 values in [0, 255].
    """
    return jnp.clip(img * 255.0, 0.0, 255.0).astype(jnp.int32)


def u8_to_unit(img_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8-valued int array -> float32 in [0, 1]."""
    return img_u8.astype(jnp.float32) / 255.0


def rgb_to_gray_u8(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """cv2.COLOR_RGB2GRAY on uint8 input, bit-exact (fixed point, shift 15).

    rgb_u8: (..., 3) int32 in [0,255].  Returns (...,) int32 in [0,255].
    """
    return gray_u8_planes(rgb_u8[..., 0], rgb_u8[..., 1], rgb_u8[..., 2])


def gray_u8_planes(r: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Bit-exact RGB2GRAY from separate channel planes (any shape)."""
    acc = r * _R2Y + g * _G2Y + b * _B2Y + (1 << (_GRAY_SHIFT - 1))
    return acc >> _GRAY_SHIFT


def rgb_to_gray_f32(rgb: jnp.ndarray) -> jnp.ndarray:
    """cv2.COLOR_RGB2GRAY float path: 0.299 R + 0.587 G + 0.114 B."""
    return 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]


def unit_to_gray_unit(img: jnp.ndarray) -> jnp.ndarray:
    """The reference's ubiquitous ``cvtColor((img*255).u8, RGB2GRAY)/255``.

    (quality_assessment.py:25,46,68; feature_extraction.py:90; etc.)
    Returns float32 gray in [0,1] quantized to the uint8 grid.
    """
    return u8_to_unit(rgb_to_gray_u8(quantize_u8(img)))


# cv2 8U HSV fixed-point division tables (hsv_shift = 12):
# sdiv[i] = round((255 << 12) / i), hdiv[i] = round((180 << 12) / (6 i)).
# Verified BIT-EXACT vs cv2 5.0 over 262k probes.
_SDIV_TAB = np.zeros(256, np.int32)
_SDIV_TAB[1:] = np.round((255 << 12) / np.arange(1, 256)).astype(np.int32)
_HDIV_TAB = np.zeros(256, np.int32)
_HDIV_TAB[1:] = np.round((180 << 12) / (6.0 * np.arange(1, 256))).astype(np.int32)


def rgb_to_hsv_u8(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """cv2.COLOR_RGB2HSV on uint8, BIT-EXACT: H in [0,180), S,V in [0,255].

    OpenCV's fixed-point path: s = (diff * sdiv[v] + 2^11) >> 12,
    h = (term * hdiv[diff] + 2^11) >> 12 (+180 if negative), where term
    selects the first channel equal to the max in order r, g, b.
    """
    rgb = rgb_u8.astype(jnp.int32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    sdiv = _corrected_lookup(v, _SDIV_TAB, _g_sdiv_tab, "sdiv")
    hdiv = _corrected_lookup(diff, _HDIV_TAB, _g_hdiv_tab, "hdiv")
    s = (diff * sdiv + (1 << 11)) >> 12
    term = jnp.where(
        v == r,
        g - b,
        jnp.where(v == g, b - r + 2 * diff, r - g + 4 * diff),
    )
    h = (term * hdiv + (1 << 11)) >> 12
    h = jnp.where(h < 0, h + 180, h)
    h = jnp.where(diff == 0, 0, h)
    return jnp.stack([h, s, v], axis=-1)


def _srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    c = jnp.maximum(c, 0.0)
    return jnp.where(c <= 0.0031308, c * 12.92, 1.055 * c ** (1.0 / 2.4) - 0.055)


def _lab_f(t: jnp.ndarray) -> jnp.ndarray:
    d = 6.0 / 29.0
    return jnp.where(t > d**3, jnp.cbrt(t), t / (3.0 * d * d) + 4.0 / 29.0)


def _lab_f_inv(ft: jnp.ndarray) -> jnp.ndarray:
    d = 6.0 / 29.0
    return jnp.where(ft > d, ft**3, 3.0 * d * d * (ft - 4.0 / 29.0))


def rgb_to_lab_u8(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """cv2.COLOR_RGB2LAB on uint8 (sRGB companding, D65).

    Output int32: L in [0,255] (L*255/100), a,b offset by +128.
    Within ~2 LSB of cv2's table-based fixed point implementation.
    """
    rgb = rgb_u8.astype(jnp.float32) / 255.0
    lin = _srgb_to_linear(rgb)
    xyz = jnp.einsum("...c,kc->...k", lin, _RGB2XYZ) / _WHITE
    fxyz = _lab_f(xyz)
    L = 116.0 * fxyz[..., 1] - 16.0
    a = 500.0 * (fxyz[..., 0] - fxyz[..., 1])
    b = 200.0 * (fxyz[..., 1] - fxyz[..., 2])
    out = jnp.stack([L * 255.0 / 100.0, a + 128.0, b + 128.0], axis=-1)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.int32)


def rgb_to_lab_u8_arith(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """rgb_to_lab_u8's float math kept in f32 (no int cast): pure
    elementwise VPU arithmetic that XLA fuses straight into downstream
    reductions — no table gathers, no materialized int planes.  Within
    ~2 LSB of the exact integer pipeline; the throughput labeling tier's
    LAB for feature statistics."""
    rgb = rgb_u8.astype(jnp.float32) / 255.0
    lin = _srgb_to_linear(rgb)
    xyz = jnp.einsum("...c,kc->...k", lin, _RGB2XYZ) / _WHITE
    fxyz = _lab_f(xyz)
    L = 116.0 * fxyz[..., 1] - 16.0
    a = 500.0 * (fxyz[..., 0] - fxyz[..., 1])
    b = 200.0 * (fxyz[..., 1] - fxyz[..., 2])
    out = jnp.stack([L * 255.0 / 100.0, a + 128.0, b + 128.0], axis=-1)
    return jnp.clip(jnp.round(out), 0, 255)


def rgb_u8_to_lab_l_arith(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """Arithmetic L plane (u8 scale, f32, unquantized): one sRGB
    linearization + luma dot + cbrt, all elementwise — the throughput
    tier's brightness-metric input (only mean(L) is consumed, so the
    whole computation fuses into the reduction with zero extra HBM
    traffic; within ±1 LSB of the exact table pipeline per pixel)."""
    rgb = rgb_u8.astype(jnp.float32) / 255.0
    lin = _srgb_to_linear(rgb)
    y = jnp.einsum("...c,c->...", lin, _RGB2XYZ[1]) / _WHITE[1]
    return (116.0 * _lab_f(y) - 16.0) * 255.0 / 100.0


def rgb_u8_to_lab_l_arith_planes(r8: jnp.ndarray, g8: jnp.ndarray,
                                 b8: jnp.ndarray) -> jnp.ndarray:
    """``rgb_u8_to_lab_l_arith`` on channel-first u8-valued int planes —
    the Phase-1 label program's layout (no NHWC stack, no layout copies)."""
    lr, lg, lb = (_srgb_to_linear(p.astype(jnp.float32) / 255.0)
                  for p in (r8, g8, b8))
    y = (lr * _RGB2XYZ[1, 0] + lg * _RGB2XYZ[1, 1]
         + lb * _RGB2XYZ[1, 2]) / _WHITE[1]
    return (116.0 * _lab_f(y) - 16.0) * 255.0 / 100.0


def hsv_s_u8_planes(r8: jnp.ndarray, g8: jnp.ndarray,
                    b8: jnp.ndarray) -> jnp.ndarray:
    """cv2-exact HSV S channel from u8-valued int planes (the fixed-point
    path of ``rgb_to_hsv_u8``, S term only — the quality metrics consume
    nothing else of HSV)."""
    v = jnp.maximum(jnp.maximum(r8, g8), b8)
    mn = jnp.minimum(jnp.minimum(r8, g8), b8)
    diff = v - mn
    sdiv = _corrected_lookup(v, _SDIV_TAB, _g_sdiv_tab, "sdiv")
    return (diff * sdiv + (1 << 11)) >> 12


def lab_to_rgb_u8(lab_u8: jnp.ndarray) -> jnp.ndarray:
    """cv2.COLOR_LAB2RGB on uint8 (inverse of rgb_to_lab_u8)."""
    lab = lab_u8.astype(jnp.float32)
    L = lab[..., 0] * 100.0 / 255.0
    a = lab[..., 1] - 128.0
    b = lab[..., 2] - 128.0
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0
    xyz = jnp.stack([_lab_f_inv(fx), _lab_f_inv(fy), _lab_f_inv(fz)], axis=-1)
    xyz = xyz * _WHITE
    lin = jnp.einsum("...c,kc->...k", xyz, _XYZ2RGB)
    srgb = _linear_to_srgb(lin)
    return jnp.clip(jnp.round(srgb * 255.0), 0, 255).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Static-table lookups via f32 arithmetic surrogates + sparse correction.
#
# Every fixed-point table in the LAB/HSV pipelines is a rounded smooth
# function (srgb gamma, cbrt, inverse gamma, L->y, division tables).  An f32
# arithmetic evaluation reproduces the int tables with zero (verified) or a
# handful of +-1 mismatches; the mismatch set is probed ON DEVICE once per
# backend and folded in as `idx == k` corrections, so the lookup is exact by
# construction while costing ~20 VPU ops/px instead of a ~190-op one-hot
# matmul with big HBM intermediates (the earlier one-hot path also OOMed
# large fused programs at 1080p).  Falls back to the matmul path if a
# backend's surrogate diverges on >64 entries.
# ---------------------------------------------------------------------------

_SURROGATE_CORR: dict = {}


def _corrected_lookup(idx: jnp.ndarray, table_np, g_fn, name: str) -> jnp.ndarray:
    """Exact ``table_np[idx]`` via surrogate ``g_fn`` (int32 -> int32)."""
    tab = np.asarray(table_np)
    backend = jax.default_backend()
    key = (name, backend)
    if key not in _SURROGATE_CORR:
        # Concrete (compile-time) evaluation even when called inside a trace.
        # The probe MUST be jit-compiled: eager op-by-op dispatch uses
        # different transcendental codegen than jitted programs on TPU
        # (observed for cbrt), which would poison the correction set.
        with jax.ensure_compile_time_eval():
            probe = np.asarray(
                jax.jit(g_fn)(jnp.arange(tab.shape[0], dtype=jnp.int32))
            ).astype(np.int64)
        delta = tab.astype(np.int64) - probe
        nz = np.nonzero(delta)[0]
        _SURROGATE_CORR[key] = (nz.astype(np.int32), delta[nz].astype(np.int32))
    nz, dl = _SURROGATE_CORR[key]
    if len(nz) > 64:  # pragma: no cover - surrogate unusable on this backend
        return _table_lookup_matmul(idx, tab)
    out = g_fn(idx)
    for i, d in zip(nz.tolist(), dl.tolist()):
        out = out + jnp.where(idx == i, jnp.int32(d), jnp.int32(0))
    return out


def _f32(v) -> np.float32:
    return np.float32(v)


def _stable(fn, x):
    """Barrier-isolate a transcendental so its f32 result cannot change with
    the surrounding fusion context (jnp.cbrt measured context-UNSTABLE on
    TPU: 3 standalone corrections but 5 composed mismatches without this)."""
    bar = jax.lax.optimization_barrier
    return bar(fn(bar(x)))


def _g_gamma_tab(i: jnp.ndarray) -> jnp.ndarray:
    """lab_tables.GAMMA_TAB: round(srgb_degamma(i/255) * 2040)."""
    x = i.astype(jnp.float32) / _f32(255.0)
    p = _stable(lambda v: ((v + _f32(0.055)) / _f32(1.055)) ** _f32(2.4), x)
    lin = jnp.where(x <= _f32(0.04045), x / _f32(12.92), p)
    return jnp.round(lin * _f32(2040.0)).astype(jnp.int32)


def _g_cbrt_tab(i: jnp.ndarray) -> jnp.ndarray:
    """lab_tables.CBRT_TAB: round(labF(i/2040) * 2^15), all in f32."""
    t = i.astype(jnp.float32) / _f32(2040.0)
    f = jnp.where(t < _f32(0.008856), t * _f32(7.787) + _f32(16.0 / 116.0),
                  _stable(jnp.cbrt, t))
    return jnp.round(f * _f32(1 << 15)).astype(jnp.int32)


def _g_inv_gamma_tab(i: jnp.ndarray) -> jnp.ndarray:
    """lab_tables.INV_GAMMA_TAB: clip(round(255 * srgb_gamma(i/4096)))."""
    x = i.astype(jnp.float32) / _f32(4096.0)
    p = _stable(
        lambda v: _f32(1.055) * jnp.maximum(v, _f32(0.0)) ** _f32(1.0 / 2.4)
        - _f32(0.055), x)
    s = jnp.where(x <= _f32(0.0031308), x * _f32(12.92), p)
    return jnp.clip(jnp.round(_f32(255.0) * s), 0, 255).astype(jnp.int32)


def _g_l2y_tab(i: jnp.ndarray) -> jnp.ndarray:
    """lab_tables.L2YF_TAB[:, 0] (y in BASE scale, threshold L <= 20)."""
    fi = i.astype(jnp.float32)
    fy = (fi * _f32(100.0 / 255.0) + _f32(16.0)) / _f32(116.0)
    lin = jnp.round(fi * _f32(16384.0) * _f32(100.0) / _f32(255.0 * 903.3))
    cub = jnp.round(_f32(16384.0) * fy * fy * fy)
    return jnp.where(i <= 20, lin, cub).astype(jnp.int32)


def _g_l2ify_tab(i: jnp.ndarray) -> jnp.ndarray:
    """lab_tables.L2YF_TAB[:, 1] (ify in BASE scale)."""
    fi = i.astype(jnp.float32)
    fy = (fi * _f32(100.0 / 255.0) + _f32(16.0)) / _f32(116.0)
    lin = jnp.round(_f32(16384.0) * (_f32(7.787) * fi * _f32(100.0)
                                     / _f32(255.0 * 903.3) + _f32(16.0 / 116.0)))
    cub = jnp.round(_f32(16384.0) * fy)
    return jnp.where(i <= 20, lin, cub).astype(jnp.int32)


def _g_sdiv_tab(i: jnp.ndarray) -> jnp.ndarray:
    """HSV sdiv table: round((255 << 12) / i), 0 at i=0."""
    v = jnp.round(_f32(255 << 12) / jnp.maximum(i, 1).astype(jnp.float32))
    return jnp.where(i == 0, 0, v.astype(jnp.int32))


def _g_hdiv_tab(i: jnp.ndarray) -> jnp.ndarray:
    """HSV hdiv table: round((180 << 12) / (6 i)), 0 at i=0."""
    v = jnp.round(_f32(180 << 12)
                  / (_f32(6.0) * jnp.maximum(i, 1).astype(jnp.float32)))
    return jnp.where(i == 0, 0, v.astype(jnp.int32))


def _table_lookup_matmul(idx: jnp.ndarray, table_np, lo_width: int = 64) -> jnp.ndarray:
    """table[idx] for int32 idx without per-pixel gathers (slow on TPU).

    Two-level (hi, lo) decomposition with a SINGLE batched one-hot matmul
    (no lax.scan — per-step dispatch overhead dominated a chunked-scan
    version ~10x): tmp = onehot(lo) @ T2.T gives each pixel the values of
    its lo-offset across every hi-page, then a compare-select over hi pages
    picks the right one.  Precision.HIGH (bf16x3) is exact here: any fp32
    value splits into 3 bf16 mantissa chunks, the one-hot rows select a
    single table entry, and the f32 accumulator re-sums the chunks exactly.
    Per-pixel cost: lo_width compares (VPU) + T MACs (MXU) + hi_n selects.
    """
    import numpy as _np

    tab = _np.asarray(table_np, _np.float32)
    T = int(tab.shape[0])
    flat = idx.reshape(-1)
    hp = jax.lax.Precision.HIGH

    lo_w = min(lo_width, T)
    hi_n = -(-T // lo_w)
    if hi_n * lo_w != T:
        tab = _np.pad(tab, (0, hi_n * lo_w - T))
    t2 = jnp.asarray(tab.reshape(hi_n, lo_w))

    lo = flat % lo_w
    bins_lo = jnp.arange(lo_w, dtype=jnp.int32)
    oh_lo = (lo[:, None] == bins_lo[None, :]).astype(jnp.float32)
    if hi_n == 1:
        out = jnp.dot(oh_lo, t2[0][:, None], precision=hp)[:, 0]
    else:
        hi = flat // lo_w
        tmp = jnp.dot(oh_lo, t2.T, precision=hp)  # (n, hi_n)
        bins_hi = jnp.arange(hi_n, dtype=jnp.int32)
        sel = hi[:, None] == bins_hi[None, :]
        out = jnp.sum(jnp.where(sel, tmp, 0.0), axis=1)
    return out.astype(jnp.int32).reshape(idx.shape)


def rgb_to_lab_u8_exact(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """cv2.COLOR_RGB2LAB on uint8, BIT-EXACT (OpenCV integer pipeline).

    Reproduces RGB2Lab_b's fixed-point tables (ops/lab_tables.py, verified
    0 mismatches vs cv2 5.0 over 327k probes).  Used by the CLAHE strategy
    path and the LAB feature extractor."""
    L, a, b = rgb_to_lab_u8_exact_planes(
        rgb_u8[..., 0], rgb_u8[..., 1], rgb_u8[..., 2]
    )
    return jnp.stack([L, a, b], axis=-1)


def rgb_to_lab_u8_exact_planes(r: jnp.ndarray, g: jnp.ndarray, b_: jnp.ndarray,
                               impl: str = "auto"):
    """Bit-exact RGB2LAB from/to separate channel planes (the channel-first
    hot path: NHWC channel-minor layouts measured ~7x slower when composed
    with windowed ops in one program).

    impl: "pallas" runs the whole conversion as one fused VMEM kernel with
    the GAMMA/CBRT tables as lane gathers (pallas_kernels.lab_forward_planes
    — bit-identical); "xla" is the surrogate-arithmetic path; "auto" picks
    pallas on the TPU backend (leading batch dims fold into rows — the
    conversion is pointwise — so the surrogate path, whose jit-probed
    corrections can be wrong under other codegen contexts such as eager
    execution, never runs on TPU)."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from underwater_image_enhancement_tpu.ops import pallas_kernels as pk

        if r.ndim == 2:
            return pk.lab_forward_planes(r, g, b_)
        if not pk.is_batched(r, g, b_):
            shp = r.shape
            flat = tuple(x.reshape(-1, shp[-1]) for x in (r, g, b_))
            return tuple(o.reshape(shp)
                         for o in pk.lab_forward_planes(*flat))
        # vmap trace with extra explicit dims: fall through to XLA
    return _lab_fwd_xla(r, g, b_, l_only=False)


def _lab_fwd_xla(r, g, b_, l_only: bool):
    """Shared XLA fixed-point RGB2LAB forward (OpenCV's integer pipeline).
    l_only skips fX/fZ and the a/b math — the brightness-metric tier —
    while keeping ONE copy of the bit-exactness-critical rounding/descale
    arithmetic for both entry points."""
    from underwater_image_enhancement_tpu.ops import lab_tables as lt

    R = _corrected_lookup(r.astype(jnp.int32), lt.GAMMA_TAB, _g_gamma_tab, "gamma")
    G = _corrected_lookup(g.astype(jnp.int32), lt.GAMMA_TAB, _g_gamma_tab, "gamma")
    B = _corrected_lookup(b_.astype(jnp.int32), lt.GAMMA_TAB, _g_gamma_tab, "gamma")
    C = lt.COEFFS

    def descale(v, n):
        return (v + (1 << (n - 1))) >> n

    def idx(row):
        acc = R * int(C[row, 0]) + G * int(C[row, 1]) + B * int(C[row, 2])
        return jnp.clip(descale(acc, lt.LAB_SHIFT), 0, lt.NCBRT - 1)

    clip = lambda v: jnp.clip(v, 0, 255)
    fY = _corrected_lookup(idx(1), lt.CBRT_TAB, _g_cbrt_tab, "cbrt")
    L = clip(descale(lt.L_SCALE * fY + lt.L_SHIFT, lt.LAB_SHIFT2))
    if l_only:
        return L
    fX = _corrected_lookup(idx(0), lt.CBRT_TAB, _g_cbrt_tab, "cbrt")
    fZ = _corrected_lookup(idx(2), lt.CBRT_TAB, _g_cbrt_tab, "cbrt")
    a = descale(500 * (fX - fY) + 128 * (1 << lt.LAB_SHIFT2), lt.LAB_SHIFT2)
    b = descale(200 * (fY - fZ) + 128 * (1 << lt.LAB_SHIFT2), lt.LAB_SHIFT2)
    return L, clip(a), clip(b)


def rgb_to_lab_l_u8_exact(rgb_u8: jnp.ndarray, impl: str = "auto") -> jnp.ndarray:
    """L plane only of cv2.COLOR_RGB2LAB on uint8, BIT-EXACT.

    The brightness metric (quality_assessment.py:99-123) reads only
    mean L; computing fX/fZ and writing the a/b planes is pure waste
    there — this tier does one CBRT lookup and one output plane.
    Bit-identical to rgb_to_lab_u8_exact(...)[..., 0]."""
    r, g, b_ = rgb_u8[..., 0], rgb_u8[..., 1], rgb_u8[..., 2]
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from underwater_image_enhancement_tpu.ops import pallas_kernels as pk

        if r.ndim == 2:
            return pk.lab_forward_l_plane(r, g, b_)
        if not pk.is_batched(r, g, b_):
            shp = r.shape
            flat = tuple(x.reshape(-1, shp[-1]) for x in (r, g, b_))
            return pk.lab_forward_l_plane(*flat).reshape(shp)
        # vmap trace with extra explicit dims: fall through to XLA
    return _lab_fwd_xla(r, g, b_, l_only=True)


def rgb_unit_to_lab_planes(r: jnp.ndarray, g: jnp.ndarray, b_: jnp.ndarray,
                           impl: str = "auto"):
    """quantize_u8 + bit-exact RGB2LAB on float unit planes.  On TPU the
    quantize (clip + truncate) runs INSIDE the forward kernel, skipping the
    int32 planes' HBM roundtrip; identical outputs on every path."""
    use_pallas = (jax.default_backend() == "tpu" and r.ndim == 2
                  if impl == "auto" else impl == "pallas")
    if use_pallas and r.ndim == 2:
        from underwater_image_enhancement_tpu.ops import pallas_kernels as pk

        return pk.lab_forward_planes_unit(r, g, b_)
    return rgb_to_lab_u8_exact_planes(
        quantize_u8(r), quantize_u8(g), quantize_u8(b_), impl=impl)


def lab_to_rgb_unit_planes(L: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                           impl: str = "auto"):
    """Bit-exact LAB2RGB + u8_to_unit, fused in-kernel on TPU."""
    use_pallas = (jax.default_backend() == "tpu" and L.ndim == 2
                  if impl == "auto" else impl == "pallas")
    if use_pallas and L.ndim == 2:
        from underwater_image_enhancement_tpu.ops import pallas_kernels as pk

        return pk.lab_inverse_planes_unit(L, a, b)
    return tuple(u8_to_unit(c)
                 for c in lab_to_rgb_u8_exact_planes(L, a, b, impl=impl))


def lab_to_rgb_unit_gamma_planes(L: jnp.ndarray, a: jnp.ndarray,
                                 b: jnp.ndarray, gamma: float,
                                 impl: str = "auto"):
    """lab_to_rgb_unit_planes followed by ``out**gamma`` (six_stadigy's
    post-CLAHE gamma, :221-224) — on TPU the gamma rides the inverse
    kernel's epilogue as a 256-entry LUT (outputs are on the u8 grid),
    saving the standalone pass's full-frame HBM roundtrip per leg.
    Within 1 ulp of composing the two ops (the LUT is applied exactly;
    XLA's pow drifts the last ulp between evaluation shapes).  The
    non-TPU path literally composes them."""
    from underwater_image_enhancement_tpu.ops.stretch import (
        _U8_GRID, gamma_correction_pow)

    use_pallas = (jax.default_backend() == "tpu" and L.ndim == 2
                  if impl == "auto" else impl == "pallas")
    if use_pallas and L.ndim == 2:
        from underwater_image_enhancement_tpu.ops import pallas_kernels as pk

        glut = jnp.power(jnp.asarray(_U8_GRID), jnp.float32(gamma))
        return pk.lab_inverse_planes_unit_gamma(L, a, b, glut)
    return tuple(gamma_correction_pow(c, gamma)
                 for c in lab_to_rgb_unit_planes(L, a, b, impl=impl))


def _ctrunc_div(a: jnp.ndarray, b: int) -> jnp.ndarray:
    """C/C++ integer division (truncates toward zero; ints can be negative).

    For non-power-of-two b, XLA lowers i32 `//` into a multi-op
    convert/multiply/correct sequence that profiled at ~120us/frame per
    division site; |a| in the LAB inverse fits float32 exactly (< 2^24), so
    an f32 reciprocal multiply with a +-1 integer correction is exact and
    ~4 cheap VPU ops."""
    m = jnp.abs(a)
    if b & (b - 1) == 0:  # power of two: a plain shift after abs
        q = m >> int(b).bit_length() - 1
    else:
        q = (m.astype(jnp.float32) * np.float32(1.0 / b)).astype(jnp.int32)
        r = m - q * b
        q = q + (r >= b).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    return jnp.where(a < 0, -q, q)


def lab_to_rgb_u8_exact(lab_u8: jnp.ndarray) -> jnp.ndarray:
    """cv2.COLOR_LAB2RGB on uint8, BIT-EXACT (OpenCV Lab2RGBinteger).

    Verified 0 mismatches vs cv2 5.0 over 393k probes
    (docs/lab_bitexact_notes.md)."""
    r, g, b = lab_to_rgb_u8_exact_planes(
        lab_u8[..., 0], lab_u8[..., 1], lab_u8[..., 2]
    )
    return jnp.stack([r, g, b], axis=-1)


def lab_to_rgb_u8_exact_planes(L: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                               impl: str = "auto"):
    """Bit-exact LAB2RGB on separate planes.  The abToXZ table is evaluated
    as pure integer arithmetic; the L->y/ify and inverse-gamma tables go
    through surrogate lookups ("xla") or packed in-VMEM lane gathers
    ("pallas", bit-identical; "auto" = pallas on TPU, leading batch dims
    folded into rows)."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        from underwater_image_enhancement_tpu.ops import pallas_kernels as pk

        if L.ndim == 2:
            return pk.lab_inverse_planes(L, a, b)
        if not pk.is_batched(L, a, b):
            shp = L.shape
            flat = tuple(x.reshape(-1, shp[-1]) for x in (L, a, b))
            return tuple(o.reshape(shp)
                         for o in pk.lab_inverse_planes(*flat))
    from underwater_image_enhancement_tpu.ops import lab_tables as lt

    L = L.astype(jnp.int32)
    a = a.astype(jnp.int32)
    b = b.astype(jnp.int32)
    y = _corrected_lookup(L, lt.L2YF_TAB[:, 0], _g_l2y_tab, "l2y")
    ify = _corrected_lookup(L, lt.L2YF_TAB[:, 1], _g_l2ify_tab, "l2ify")

    adiv = ((5 * a * 53687 + (1 << 7)) >> 13) - 128 * lt.BASE // 500
    bdiv = ((b * 41943 + (1 << 4)) >> 9) - 128 * lt.BASE // 200 + 1

    def ab_to_xz(v):
        v = jnp.clip(v, lt.MIN_AB, lt.BASE * 9 // 4)
        lin = _ctrunc_div(v * 108, 841) - lt.AB_LIN_K
        cub = _ctrunc_div(_ctrunc_div(v * v, lt.BASE) * v, lt.BASE)
        return jnp.where(v <= lt.AB_LIN_THRESH, lin, cub)

    x = ab_to_xz(ify + adiv)
    z = ab_to_xz(ify - bdiv)

    def descale(v, n):
        return (v + (1 << (n - 1))) >> n

    C = lt.COEFFS_INV
    outs = []
    for ch in range(3):
        idx = descale(x * int(C[ch, 0]) + y * int(C[ch, 1]) + z * int(C[ch, 2]), 14)
        idx = jnp.clip(idx, 0, lt.INV_GAMMA_SIZE - 1)
        outs.append(_corrected_lookup(idx, lt.INV_GAMMA_TAB,
                                      _g_inv_gamma_tab, "inv_gamma"))
    return tuple(outs)


def rgb_to_hsv_f32(rgb: jnp.ndarray) -> jnp.ndarray:
    """cv2.COLOR_RGB2HSV on float input: H in [0,360), S,V in [0,1]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = v - mn
    safe_diff = jnp.where(diff == 0, 1.0, diff)
    safe_v = jnp.where(v == 0, 1.0, v)
    s = jnp.where(v == 0, 0.0, diff / safe_v)
    term = jnp.where(
        v == r,
        g - b,
        jnp.where(v == g, b - r + 2.0 * diff, r - g + 4.0 * diff),
    )
    h = jnp.where(diff == 0, 0.0, 60.0 * term / safe_diff)
    h = jnp.where(h < 0, h + 360.0, h)
    return jnp.stack([h, s, v], axis=-1)
