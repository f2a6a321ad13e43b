"""Measure each six-strategy leg as its own chained program vs the
six-in-one tuple program, to localize the composition overhead
(ROADMAP: tuple ~5.45 ms/frame @1080p vs sum-of-parts ~3.5 ms).

Usage: python tools/prof_six_parts.py [HxW] [--exact]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from underwater_image_enhancement_tpu.pipeline import cast as cast_mod
from underwater_image_enhancement_tpu.pipeline import six as six_mod
from underwater_image_enhancement_tpu.pipeline.enhance import (
    SIX_ORDER,
    six_strategy_tuple,
)

H, W = (1080, 1920)
for a in sys.argv[1:]:
    if "x" in a:
        H, W = map(int, a.split("x"))
METHOD = "radix" if "--exact" in sys.argv else "hist-fast"
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


def timed(run, x):
    float(run(x))
    ts = []
    for _ in range(REPS):
        t0 = time.time()
        _ = float(run(x))
        ts.append(time.time() - t0 - RTT)
    return float(np.median(ts)) / K * 1000.0  # ms per iteration


def chain(fn):
    @jax.jit
    def run(x):
        def body(i, x):
            return requant(fn(x))
        y = jax.lax.fori_loop(0, K, body, x)
        return jnp.sum(y[::256, ::256, 0])
    return run


# --- parts ---
def cast_A_only(x):
    corrected, code = cast_mod.detect_and_correct(x)
    A = six_mod._airlight(six_mod._split(corrected), METHOD)
    return corrected + 1e-9 * (A[0] + jnp.float32(code))


ms_castA = timed(chain(cast_A_only), frame)
print(f"cast+airlight            {ms_castA:7.3f} ms")

total_parts = ms_castA
for k in SIX_ORDER:
    builder = six_mod._BUILDERS[k]

    if k in ("strong_dehazing", "medium_dehazing", "light_dehazing"):
        def leg(x, b=builder):
            corrected, code = cast_mod.detect_and_correct(x)
            A = six_mod._airlight(six_mod._split(corrected), METHOD)
            return b(corrected, METHOD, A=A)
    else:
        def leg(x, b=builder):
            corrected, code = cast_mod.detect_and_correct(x)
            return b(corrected, METHOD)

    ms = timed(chain(leg), frame)
    # subtract the shared prologue measured above (cast+A for dehaze legs,
    # approx cast-only for the others — report raw too)
    print(f"{k:24s} {ms:7.3f} ms (incl. prologue)")
    total_parts += ms - (ms_castA if k in (
        "strong_dehazing", "medium_dehazing", "light_dehazing") else 0.0)


# --- whole tuple program ---
@jax.jit
def tuple_run(x):
    def body(i, carry):
        outs, code = six_strategy_tuple(carry[0], fast=(METHOD == "hist-fast"))
        outs = tuple(requant(o) for o in outs)
        nxt = requant(outs[0] + 1e-9 * jnp.float32(code))
        return (nxt,) + outs

    init = (frame,) + tuple(frame for _ in range(6))
    y = jax.lax.fori_loop(0, K, body, init)
    return sum(jnp.sum(o[::256, ::256, 0]) for o in y)


float(tuple_run(frame))
ts = []
for _ in range(REPS):
    t0 = time.time()
    _ = float(tuple_run(frame))
    ts.append(time.time() - t0 - RTT)
ms_tuple = float(np.median(ts)) / K * 1000.0

print(f"--\nsum of parts (shared-A adjusted) ~ {total_parts:7.3f} ms")
print(f"tuple program                      {ms_tuple:7.3f} ms")
