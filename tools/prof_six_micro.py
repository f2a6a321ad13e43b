"""Micro-profile the two outlier six legs (strong_dehazing 2.2 ms,
clahe_enhancement 2.4 ms vs ~0.85 peers @1080p fast tier): time stage
prefixes and param swaps to localize the cost."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from underwater_image_enhancement_tpu.ops import dehaze, histeq, stretch
from underwater_image_enhancement_tpu.ops.layout import split_planes as _split
from underwater_image_enhancement_tpu.pipeline import cast as cast_mod
from underwater_image_enhancement_tpu.pipeline import six as six_mod

H, W = 1080, 1920
METHOD = "hist-fast"
K, REPS = 4, 5


def requant(x):
    x = jnp.clip(x, 0.0, 1.0) * 0.9 + 0.05
    return jnp.floor(x * 255.0) / 255.0


@jax.jit
def mk(key):
    u = jax.random.uniform(key, (H, W, 3), jnp.float32)
    return jnp.floor((u * 0.9 + 0.05) * 255.0) / 255.0


frame = mk(jax.random.PRNGKey(0))
frame.block_until_ready()

ident = jax.jit(lambda x: x + 1.0)
z = jax.device_put(np.zeros((4, 4), np.float32))
float(np.asarray(ident(z))[0, 0])
t0 = time.time()
for _ in range(5):
    _ = np.asarray(ident(z))
RTT = (time.time() - t0) / 5


def timed(fn, label):
    @jax.jit
    def run(x):
        def body(i, x):
            return requant(fn(x))
        y = jax.lax.fori_loop(0, K, body, x)
        return jnp.sum(y[::256, ::256, 0])

    float(run(frame))
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        _ = float(run(frame))
        ts.append(time.time() - t0 - RTT)
    ms = float(np.median(ts)) / K * 1000.0
    print(f"{label:48s} {ms:7.3f} ms")
    return ms


def pre(x):
    corrected, _ = cast_mod.detect_and_correct(x)
    p = _split(corrected)
    A = six_mod._airlight(p, METHOD)
    return p, A


def restack(p):
    return jnp.stack(p, axis=-1)


# ---- strong_dehazing prefixes ----
def s1_rec(x, omega=0.3, r=20, eps=0.5):
    p, A = pre(x)
    rec = six_mod._restore(p, omega, r, eps, METHOD, A)
    return restack(rec)


def s1_stretch(x):
    p, A = pre(x)
    rec = six_mod._restore(p, 0.3, 20, 0.5, METHOD, A)
    e = stretch.enhance_contrast_planes(rec, 5.0, 98.0, method=METHOD)
    return restack(e)


def s1_full(x, clip=3.0, gamma=1.5):
    p, A = pre(x)
    rec = six_mod._restore(p, 0.3, 20, 0.5, METHOD, A)
    e = stretch.enhance_contrast_planes(rec, 5.0, 98.0, method=METHOD)
    e = histeq.clahe_enhancement_planes(e, clip, lab_fast=True, gamma=gamma)
    return restack(e)


timed(lambda x: s1_rec(x), "strong: ...recover (r20 w.3)")
timed(lambda x: s1_rec(x, omega=0.5, r=15), "strong: ...recover (r15 w.5 = medium params)")
timed(s1_stretch, "strong: ...stretch 5-98")
timed(lambda x: s1_full(x), "strong: full (clahe3 gamma1.5)")
timed(lambda x: s1_full(x, gamma=None), "strong: full, NO gamma fold")
timed(lambda x: s1_full(x, clip=2.0, gamma=None), "strong: full, clip2 no gamma (=medium tail)")


# ---- medium for comparison ----
def s2_full(x):
    p, A = pre(x)
    rec = six_mod._restore(p, 0.5, 15, 0.5, METHOD, A)
    e = stretch.enhance_contrast_planes(rec, 15.0, 95.0, method=METHOD)
    e = histeq.clahe_enhancement_planes(e, 2.0, lab_fast=True)
    return restack(e)


timed(s2_full, "medium: full")


# ---- clahe_enhancement (strategy4) prefixes ----
def s4_clahe(x):
    corrected, _ = cast_mod.detect_and_correct(x)
    e = histeq.clahe_enhancement_planes(_split(corrected), 4.0, lab_fast=True)
    return restack(e)


def s4_stretch(x):
    corrected, _ = cast_mod.detect_and_correct(x)
    e = histeq.clahe_enhancement_planes(_split(corrected), 4.0, lab_fast=True)
    e = stretch.enhance_contrast_planes(e, 10.0, 95.0, method=METHOD)
    return restack(e)


def s4_wb(x):
    corrected, _ = cast_mod.detect_and_correct(x)
    e = histeq.clahe_enhancement_planes(_split(corrected), 4.0, lab_fast=True)
    e = stretch.enhance_contrast_planes(e, 10.0, 95.0, method=METHOD)
    e = stretch.white_balance_planes(e, 3.0, method=METHOD)
    return restack(e)


def s4_full(x):
    corrected, _ = cast_mod.detect_and_correct(x)
    e = histeq.clahe_enhancement_planes(_split(corrected), 4.0, lab_fast=True)
    e = stretch.enhance_contrast_planes(e, 10.0, 95.0, method=METHOD)
    e = stretch.white_balance_planes(e, 3.0, method=METHOD)
    return restack(six_mod._gamma_pow(e, 1.3))


timed(s4_clahe, "strat4: clahe4 only")
timed(s4_stretch, "strat4: ...stretch 10-95")
timed(s4_wb, "strat4: ...wb p3")
timed(s4_full, "strat4: full (...gamma_pow 1.3)")

# ---- strategy5 for comparison (wb, stretch, clahe+gamma fold) ----
def s5_full(x):
    corrected, _ = cast_mod.detect_and_correct(x)
    e = stretch.white_balance_planes(_split(corrected), 2.0, method=METHOD)
    e = stretch.enhance_contrast_planes(e, 15.0, 90.0, method=METHOD)
    e = histeq.clahe_enhancement_planes(e, 1.5, lab_fast=True, gamma=1.2)
    return restack(e)


timed(s5_full, "strat5: full")
