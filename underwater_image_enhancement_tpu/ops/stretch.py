"""Percentile contrast stretch, white balance, gamma — pure JAX, batched.

Reference semantics reproduced:
- ``color_enhancement(img, L_low, L_high)``: per-channel percentile stretch
  (enhancement_strategies.py:251-273, eps 1e-10) and the six_stadigy twin
  ``enhance_contrast`` (six_stadigy.py:190-199, eps 1e-6).
- ``white_balance(img, percentile)``: symmetric percentile stretch
  (six_stadigy.py:210-219).
- ``gamma_correction``: TWO divergent conventions exist in the reference —
  ``img**(1/gamma)`` with clip (enhancement_strategies.py:276-285) and
  ``img**gamma`` without clip (six_stadigy.py:221-224).  Both are exposed.

Percentiles use numpy's linear-interpolation definition (np.percentile).
Four methods: 'sort' (full sort, the parity oracle), 'radix' (identical
order statistics via an O(n) MXU-histogram radix select — bit-equal to
'sort', the production path for arbitrary non-negative f32 inputs),
'index-u8' (vgg_16_UIE's sorted-index convention, exact on the u8 grid),
and 'hist'/'hist-fast' (approximate, the six --fast tier).

All functions take NHWC (or HWC) float32 and are jittable; percentile
reduction is per-image, per-channel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# the 256 float32 values a decoded u8 image can take (k/255, f32 division)
_U8_GRID = np.arange(256, dtype=np.float32) / np.float32(255.0)


def _lerp_indices(n: int, l_low, l_high):
    """np.percentile 'linear' indices/weights in f32, shared by the sort
    oracle and the radix path so the two agree bit for bit: q = pct/100 *
    (n-1); low/high = floor/ceil(q); weights (1-frac, frac)."""
    qs = jnp.stack([jnp.asarray(l_low, jnp.float32),
                    jnp.asarray(l_high, jnp.float32)]) / np.float32(100.0)
    n_f = np.float32(n)
    q = qs * (n_f - 1)
    low = jnp.floor(q)
    high_w = q - low
    low_w = np.float32(1.0) - high_w
    low_i = jnp.clip(low, 0, n_f - 1).astype(jnp.int32)
    high_i = jnp.clip(jnp.ceil(q), 0, n_f - 1).astype(jnp.int32)
    return low_i, high_i, low_w, high_w


def _lerp_barrier(lv, hv, lw, hw):
    """lv*lw + hv*hw with each product behind an optimization_barrier:
    XLA otherwise contracts into fma(lv, lw, hv*hw) on some program
    instances, shifting the percentile 1 ulp between paths — the same
    discipline as the CLAHE bilinear chain
    (ops/pallas_kernels._cv_bilinear_f32)."""
    t = jax.lax.optimization_barrier((lv * lw, hv * hw))
    return t[0] + t[1]


def _perc_pair_sort(channel: jnp.ndarray, l_low, l_high):
    """Exact (p_low, p_high) percentiles of a flattened channel — numpy's
    linear-interpolation convention (np.percentile), via a full sort.

    The parity oracle for the O(n) radix path below.  Implemented as an
    explicit sort + gather + barriered lerp rather than jnp.percentile:
    the identical order statistics and formula, but with deterministic
    f32 rounding — jnp.percentile's own mul/mul/add FMA-contracts on
    some backend instances, which would make bit-equality between two
    different programs an unstable target."""
    flat = jnp.sort(channel.reshape(-1))
    n = flat.shape[0]
    low_i, high_i, low_w, high_w = _lerp_indices(n, l_low, l_high)
    p = _lerp_barrier(flat[low_i], flat[high_i], low_w, high_w)
    return p[0], p[1]


def _perc_pair_hist(channel: jnp.ndarray, l_low, l_high, k: int = 32,
                    subsample: int = 1):
    """Approximate percentiles via a two-level hierarchical histogram.

    Level 1 bins values into k coarse buckets (k compares/pixel), locates
    the bucket holding each target rank, then level 2 refines within that
    bucket with a SHARED k-wide compare pass for both quantiles — ~2.5k ops
    per pixel total for k*k = 1024 effective bins.  ~25x faster than a flat
    4096-bin compare-reduce on TPU (the VPU-bound production fast path).
    Error <= (vmax - vmin) / k^2; returns the left edge of the final bin.
    ``subsample`` > 1 histograms every subsample-th ROW (striding the lane
    dim would break TPU vector layout); the quantile rank jitter is
    ~sqrt(p(1-p)/(n/s)) — about 0.06% of a percentile for 1080p at s=8.
    min/max also run on the subsample (values outside the estimated range
    clip into the end bins, shifting a percentile only when its rank lands
    there — never the 2-20% tails the strategies use): dropping the
    full-frame min/max pass saves ~40% of the leg's HBM traffic.
    """
    if subsample > 1 and channel.ndim == 2:
        channel = channel[::subsample, :]
    vmin = jnp.min(channel)
    vmax = jnp.max(channel)
    flat = channel.reshape(-1)
    n = flat.shape[0]
    scale = (k * k - 1) / jnp.maximum(vmax - vmin, 1e-12)
    idx = jnp.clip((flat - vmin) * scale, 0, k * k - 1)
    hi = (idx // k).astype(jnp.int32)
    lo = jnp.clip(idx - hi.astype(jnp.float32) * k, 0, k - 1).astype(jnp.int32)
    bins = jnp.arange(k, dtype=jnp.int32)

    h1 = jnp.sum((hi[:, None] == bins[None, :]).astype(jnp.int32), axis=0)
    c1 = jnp.cumsum(h1)

    def rank_of(pct):
        return jnp.asarray(pct, jnp.float32) / 100.0 * (n - 1) + 1.0

    t_lo = rank_of(l_low)
    t_hi = rank_of(l_high)
    b_lo = jnp.clip(jnp.sum((c1 < t_lo).astype(jnp.int32)), 0, k - 1)
    b_hi = jnp.clip(jnp.sum((c1 < t_hi).astype(jnp.int32)), 0, k - 1)
    below_lo = jnp.where(b_lo > 0, c1[jnp.maximum(b_lo - 1, 0)], 0)
    below_hi = jnp.where(b_hi > 0, c1[jnp.maximum(b_hi - 1, 0)], 0)

    lo_onehot = (lo[:, None] == bins[None, :]).astype(jnp.int32)  # shared
    h2_lo = jnp.sum(jnp.where((hi == b_lo)[:, None], lo_onehot, 0), axis=0)
    h2_hi = jnp.sum(jnp.where((hi == b_hi)[:, None], lo_onehot, 0), axis=0)

    def fine(h2, below, b1, target):
        c2 = jnp.cumsum(h2) + below
        b2 = jnp.clip(jnp.sum((c2 < target).astype(jnp.int32)), 0, k - 1)
        return vmin + (b1 * k + b2).astype(jnp.float32) / scale

    return (fine(h2_lo, below_lo, b_lo, t_lo),
            fine(h2_hi, below_hi, b_hi, t_hi))


def _pick_bucket(hist, i_rel):
    """hist: (256,) i32 counts; i_rel: i32 rank within candidates.
    Returns (bucket index i32, count below that bucket i32)."""
    cum = jnp.cumsum(hist)
    sel = jnp.sum((cum <= i_rel).astype(jnp.int32))  # first cum > i
    below = jnp.where(sel > 0, cum[jnp.maximum(sel - 1, 0)], 0)
    return sel, below


def _hist_slots(vals: jnp.ndarray, nslots: int) -> jnp.ndarray:
    """(n,) int32 in {-16} U [0, 256*nslots) -> (256*nslots,) i32 counts.

    Same two-level one-hot MXU contraction as histeq._histogram256 but
    with a (16*nslots)-wide hi nibble, so ONE dot (and one fused read of
    the keys) serves every rank slot of a channel at a radix level.
    The -16 sentinel's hi nibble (-1) matches no bin.  Counts accumulate
    exactly in f32 below 2^24; larger inputs are chunked."""
    n = vals.shape[0]
    CHUNK = 1 << 23
    if n > CHUNK:
        total = None
        for s in range(0, n, CHUNK):
            part = _hist_slots(vals[s:s + CHUNK], nslots)
            total = part if total is None else total + part
        return total
    hi = ((vals >> 4)[:, None]
          == jnp.arange(16 * nslots, dtype=jnp.int32)).astype(jnp.bfloat16)
    lo = ((vals & 15)[:, None]
          == jnp.arange(16, dtype=jnp.int32)).astype(jnp.bfloat16)
    h = jax.lax.dot_general(hi, lo, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return h.reshape(256 * nslots).astype(jnp.int32)


def _order_stats_radix_multi(keys: jnp.ndarray, ranks_per_row):
    """Exact order statistics of non-negative-f32 bit-pattern keys, O(n).

    keys: (C, n) int32 — float32 values bitcast to int32, one row per
    channel.  For x >= 0 the IEEE bit pattern is monotone in the value,
    so selecting the i-th smallest key selects the i-th smallest float.
    ranks_per_row: per row, a sequence of int32 scalar ranks (traced OK).
    Returns the matching nested lists of selected int32 keys.

    Radix select, 4 levels x 8 bits, one SLOTTED histogram per channel
    per level (_hist_slots: two-level one-hot MXU matmul) over the
    candidates that match each rank's prefix selected so far — all of a
    channel's ranks share one dot and one fused read of the keys.  The
    mask/bucket arithmetic stays an elementwise chain from keys that
    fuses into the one-hot producer: an earlier jnp.stack of masked rows
    materialized (R, n) i32 in HBM per level, which dominated the select
    (~50 MB written + re-read per level at 1080p x 3 channels).  ~4
    fused passes over the data vs the O(n log n) bitonic sort
    jnp.percentile lowers to (measured 7.8 ms/channel @1080p on v5e —
    over half the Phase-1 label program; this path is ~10x cheaper).
    """
    from underwater_image_enhancement_tpu.ops.histeq import _histogram256

    # level 1: bits 31-24, all elements are candidates, one pass per row
    h1 = _histogram256(keys >> 24)  # (C, 256)
    prefs, rels, row_of = [], [], []
    for c, ranks in enumerate(ranks_per_row):
        for r in ranks:
            sel, below = _pick_bucket(h1[c], r.astype(jnp.int32))
            prefs.append(sel << 24)
            rels.append(r.astype(jnp.int32) - below)
            row_of.append(c)

    for shift in (16, 8, 0):
        idx = 0
        for c, ranks in enumerate(ranks_per_row):
            R = len(ranks)
            g = list(range(idx, idx + R))
            idx += R
            # ONE slotted histogram per channel per level: each rank's
            # candidates land in its own 256-bin slot; an element whose
            # prefix matches several ranks goes to the FIRST match (the
            # jj=0 where is applied last), and the equal-prefix fixup
            # below reads that slot for the later ranks.  Non-candidates
            # get -16: hi nibble -1 matches no one-hot bin.
            base = (keys[c] >> shift) & 255
            bucket = jnp.full_like(keys[c], -16)
            cprefs = [prefs[j] >> (shift + 8) for j in g]
            for jj in range(R - 1, -1, -1):
                cand = (keys[c] >> (shift + 8)) == cprefs[jj]
                bucket = jnp.where(cand, base + 256 * jj, bucket)
            hist = _hist_slots(bucket, R)
            raws = [hist[256 * jj:256 * (jj + 1)] for jj in range(R)]
            for jj in range(R):
                j = g[jj]
                h_j = raws[jj]
                # equal candidate prefixes share one candidate set whose
                # elements sit in the first matching slot
                for kk in range(jj - 1, -1, -1):
                    h_j = jnp.where(cprefs[kk] == cprefs[jj], raws[kk], h_j)
                sel, below = _pick_bucket(h_j, rels[j])
                prefs[j] = prefs[j] | (sel << shift)
                rels[j] = rels[j] - below

    out, k = [], 0
    for ranks in ranks_per_row:
        out.append(prefs[k:k + len(ranks)])
        k += len(ranks)
    return out


def percentiles_radix_planes(planes, pcts):
    """EXACT np.percentile-convention percentiles in O(n) for non-negative
    float32 channels (every caller's input in this repo is clipped to
    [0, 1] upstream: dehaze.recover_planes, CLAHE, hist-eq, u8 gray).

    planes: same-shape channels, selected jointly — per radix level each
    CHANNEL issues one slotted histogram dot (_hist_slots) that serves
    all of that channel's ranks in one fused read of its keys.  pcts:
    static sequence of percentiles.  Only the FLOOR order statistic of
    each percentile goes through the radix select; the ceil statistic
    s[i+1] comes from one fused compare/min pass over the keys:
    s[i+1] = s[i] when count(x <= s[i]) >= i+2, else min(x > s[i]) —
    identical floats to a full sort either way.  Interpolation goes
    through the same _lerp_indices/_lerp_barrier helpers as the sort
    oracle, so results are bit-equal on every backend (gated in
    tests/test_stretch_radix.py).  Returns one (len(pcts),) f32 array
    per plane."""
    flats = [p.reshape(-1) for p in planes]
    n = flats[0].shape[0]
    low_is, low_ws, high_ws = [], [], []
    for p in pcts:
        li, _, lw, hw = _lerp_indices(n, p, p)
        low_is.append(li[0])
        low_ws.append(lw[0])
        high_ws.append(hw[0])
    i1 = jnp.stack(low_is) + 1  # ceil ranks (s[i+1]; weight 0 if q integral)
    lw = jnp.stack(low_ws)
    hw = jnp.stack(high_ws)

    keys = jnp.stack([jax.lax.bitcast_convert_type(f, jnp.int32)
                      for f in flats])
    sel = _order_stats_radix_multi(keys, [low_is] * len(planes))

    imax = np.int32(np.iinfo(np.int32).max)
    outs = []
    for c in range(len(planes)):
        lo_keys = jnp.stack(sel[c])  # (P,) int32
        gt = keys[c][None, :] > lo_keys[:, None]
        cnt_le = jnp.sum(jnp.logical_not(gt), axis=1).astype(jnp.int32)
        min_gt = jnp.min(jnp.where(gt, keys[c][None, :], imax), axis=1)
        # s[i+1] == s[i] when ties cover rank i+1; clamp at the top
        # (i+1 >= n can only pair with hw == 0, but min_gt would be the
        # imax sentinel whose bitcast is NaN — NaN * 0 poisons the lerp)
        hi_keys = jnp.where((cnt_le >= i1 + 1) | (i1 >= n), lo_keys, min_gt)
        lv = jax.lax.bitcast_convert_type(lo_keys, jnp.float32)
        hv = jax.lax.bitcast_convert_type(hi_keys, jnp.float32)
        outs.append(_lerp_barrier(lv, hv, lw, hw))
    return tuple(outs)


def percentiles_radix(channel: jnp.ndarray, pcts) -> jnp.ndarray:
    """Single-channel percentiles_radix_planes: (len(pcts),) f32."""
    return percentiles_radix_planes((channel,), pcts)[0]


def _perc_pair_radix(channel: jnp.ndarray, l_low, l_high):
    """(p_low, p_high) via percentiles_radix — the production percentile
    for the Phase-1 label strategies (pipeline/strategies.py)."""
    p = percentiles_radix(channel, (l_low, l_high))
    return p[0], p[1]


def _perc_pair_index_u8(channel: jnp.ndarray, l_low, l_high):
    """EXACT sorted-index percentiles (vgg_16_UIE.py:57-92:
    ``p = sorted[int(L/100*n)]``) in O(n) via a two-level integer histogram.

    Decoded images live on the u8 grid (values k/255 float32), so the order
    statistic is recoverable from an exact 256-bin histogram: sorted[i] is
    the first grid value whose cumulative count exceeds i.  Two 16-wide
    compare-reduce passes (hi nibble, then lo nibble masked to the selected
    bucket, shared between both percentiles) keep it VPU-friendly — no sort,
    no gather.  Bit-equal to the sort path for u8-grid inputs; for off-grid
    inputs the percentile quantizes to the nearest grid value (<=1/255 off).
    """
    n = channel.size
    # q in f32: integers < 2^24 compare exactly, and f32 keeps the VPU on its
    # native lanes (int one-hots measured ~2x slower here)
    q = jnp.clip(jnp.round(channel * 255.0), 0.0, 255.0)

    def order_index(pct):
        # int() truncation + clamp, exactly the reference formula
        return jnp.clip((pct / 100.0 * n).astype(jnp.int32), 0, n - 1
                        ).astype(jnp.float32)

    i_lo = order_index(jnp.asarray(l_low, jnp.float32))
    i_hi = order_index(jnp.asarray(l_high, jnp.float32))

    # Radix-select over the GLOBAL CDF c(v) = #(q <= v): the order statistic
    # sorted[i] is the first v with c(v) > i, so each level only narrows the
    # value range — no bucket masking, no one-hot, no count bookkeeping.
    # Levels 16/4/4: pass 1 probes the 15 interior coarse edges (shared by
    # both percentiles), passes 2-3 probe 3 dynamic-scalar edges per
    # percentile each.  27 compare+reduce ops/px total; same-shape reductions
    # over the same input fuse into one memory pass per level.
    def cdf(t):
        return jnp.sum((q <= t).astype(jnp.float32))

    c1 = [cdf(float(16 * k + 15)) for k in range(15)]

    def narrow(base, width, i):
        """v* known in [base, base+4*width): probe 3 edges, return new base."""
        cs = [cdf(base + float(width * j + width - 1)) for j in range(3)]
        sub = sum((c <= i).astype(jnp.float32) for c in cs)
        return base + float(width) * sub

    def select(i):
        b = sum((c <= i).astype(jnp.float32) for c in c1)  # coarse bucket
        base = 16.0 * b
        base = narrow(base, 4, i)
        return narrow(base, 1, i)

    v_lo = select(i_lo)
    v_hi = select(i_hi)

    # Host-precomputed k/255 table: XLA rewrites x/255.0 as x*(1/255), which
    # is 1 ulp off true division for some k — numpy float32 division here is
    # bit-identical to decoded pixel values (k.astype(f32)/255.0).
    grid = jnp.asarray(_U8_GRID)
    return (grid[v_lo.astype(jnp.int32)], grid[v_hi.astype(jnp.int32)])


def stretch_channel(channel: jnp.ndarray, l_low, l_high, eps: float = 1e-10,
                    method: str = "sort") -> jnp.ndarray:
    """(channel - p_low) / (p_high - p_low + eps), clipped to [0,1].

    method: 'sort' (exact np.percentile interpolation, the parity oracle),
    'radix' (EXACT np.percentile via O(n) radix select — the production
    path for arbitrary non-negative f32 inputs, e.g. the Phase-1 label
    strategies), 'index-u8' (EXACT sorted-index percentile for u8-grid
    inputs, O(n) — the production enhance() path), 'hist' (two-level
    histogram), 'hist-fast' (histogram on a stride-8 row subsample)."""
    if method == "sort":
        p_low, p_high = _perc_pair_sort(channel, l_low, l_high)
    elif method == "radix":
        p_low, p_high = _perc_pair_radix(channel, l_low, l_high)
    elif method == "index-u8":
        p_low, p_high = _perc_pair_index_u8(channel, l_low, l_high)
    elif method == "hist-fast":
        p_low, p_high = _perc_pair_hist(channel, l_low, l_high, subsample=8)
    else:
        p_low, p_high = _perc_pair_hist(channel, l_low, l_high)
    out = (channel - p_low) / (p_high - p_low + eps)
    return jnp.clip(out, 0.0, 1.0)


@partial(jax.jit, static_argnames=("eps", "method"))
def color_enhancement(img: jnp.ndarray, l_low=15.0, l_high=95.0,
                      eps: float = 1e-10, method: str = "sort") -> jnp.ndarray:
    """Per-channel percentile stretch (enhancement_strategies.py:251-273).

    img: (..., H, W, C).  Percentiles are computed per leading-batch element
    and per channel.  ``eps=1e-6`` reproduces six_stadigy.enhance_contrast.
    """
    def one_image(im):
        chans = [stretch_channel(im[..., c], l_low, l_high, eps, method)
                 for c in range(im.shape[-1])]
        return jnp.stack(chans, axis=-1)

    if img.ndim == 3:
        return one_image(img)
    batch_shape = img.shape[:-3]
    flat = img.reshape((-1,) + img.shape[-3:])
    out = jax.vmap(one_image)(flat)
    return out.reshape(batch_shape + img.shape[-3:])


def enhance_contrast(img: jnp.ndarray, l_low=15.0, l_high=95.0,
                     method: str = "sort") -> jnp.ndarray:
    """six_stadigy.py:190-199 flavor (eps 1e-6)."""
    return color_enhancement(img, l_low, l_high, eps=1e-6, method=method)


def white_balance(img: jnp.ndarray, percentile=5.0, method: str = "sort") -> jnp.ndarray:
    """Symmetric percentile stretch (six_stadigy.py:210-219, eps 1e-6)."""
    return color_enhancement(img, percentile, 100.0 - percentile, eps=1e-6,
                             method=method)


@jax.jit
def gray_world_white_balance(img: jnp.ndarray) -> jnp.ndarray:
    """Classic gray-world white balance by channel-mean scaling.

    out_c = img_c * mean(gray) / mean(c), where mean(gray) is the average of
    the three channel means; clipped to [0, 1].  This is the textbook
    gray-world assumption (BASELINE config #1 wording: "gray-world white
    balance"); the reference's percentile-stretch flavor is
    :func:`white_balance`.  img: (..., H, W, 3); means are per image.
    Channel-first single-image variant: pipeline/fusion.py:gray_world_wb_planes.
    """
    means = jnp.mean(img, axis=(-3, -2), keepdims=True)  # (..., 1, 1, 3)
    gray = jnp.mean(means, axis=-1, keepdims=True)
    scale = gray / jnp.maximum(means, 1e-6)
    return jnp.clip(img * scale, 0.0, 1.0)


def color_enhancement_planes(planes, l_low=15.0, l_high=95.0,
                             eps: float = 1e-10, method: str = "sort"):
    """Channel-first per-channel percentile stretch: (r, g, b) planes.

    method='radix' selects all three channels' percentiles jointly, so
    each radix level runs as ONE histogram call over 6 (channel, rank)
    rows instead of three independent per-channel programs."""
    if method == "radix":
        pairs = percentiles_radix_planes(planes, (l_low, l_high))
        return tuple(
            jnp.clip((p - pr[0]) / (pr[1] - pr[0] + eps), 0.0, 1.0)
            for p, pr in zip(planes, pairs))
    return tuple(stretch_channel(p, l_low, l_high, eps, method) for p in planes)


def enhance_contrast_planes(planes, l_low=15.0, l_high=95.0,
                            method: str = "sort"):
    return color_enhancement_planes(planes, l_low, l_high, 1e-6, method)


def white_balance_planes(planes, percentile=5.0, method: str = "sort"):
    return color_enhancement_planes(planes, percentile, 100.0 - percentile,
                                    1e-6, method)


@jax.jit
def gamma_correction_inv(img: jnp.ndarray, gamma=1.2) -> jnp.ndarray:
    """img ** (1/gamma), clipped — enhancement_strategies.py:276-285."""
    return jnp.clip(jnp.power(jnp.maximum(img, 0.0), 1.0 / gamma), 0.0, 1.0)


@jax.jit
def gamma_correction_pow(img: jnp.ndarray, gamma=1.2) -> jnp.ndarray:
    """img ** gamma, NO clip — six_stadigy.py:221-224."""
    return jnp.power(jnp.maximum(img, 0.0), gamma)
