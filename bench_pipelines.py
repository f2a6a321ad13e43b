"""Benchmarks for the three real workloads (VERDICT r2 item 2).

Prints one JSON line per (workload, size):
  {"metric": "<workload>_<size>", "value": fps, "unit": "frames/s/chip",
   "ms_per_frame": ...}

Workloads (reference hot loops):
- enhance   — use_trained_model.py:83-111 via pipeline.enhance.enhance_batch
              (the north-star path; also reported by bench.py)
- six       — six_stadigy.py:424-447 per-image x 6-strategy loop via
              pipeline.enhance.six_strategy_single(fast=True)
- label     — main.py:88-155 Phase-1 labeling (features + 5 strategies +
              quality scores + on-device winner) via select.system._label_batch

Methodology matches bench.py: frames generated on device on the u8 grid,
K iterations chained through a fori_loop body (compiled once, output
re-quantized and fed back), tunnel RTT subtracted, median of REPS.

Usage: python bench_pipelines.py [--workloads enhance,six,label]
                                 [--sizes 1080p,vga] [--six-batch N]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

SIZES = {"1080p": (1080, 1920), "vga": (480, 640)}


def _requantize(x):
    import jax.numpy as jnp

    x = jnp.clip(x, 0.0, 1.0) * 0.9 + 0.05
    return jnp.floor(x * 255.0) / 255.0


def _rtt():
    """Tunnel round-trip to subtract from each timed dispatch.

    MIN of 10 probes, not the mean: the probe itself can catch a transient
    tunnel stall, and a mean inflated to tens of ms then over-subtracts
    from every rep (observed: a run where six measured an impossible
    1.18 ms/frame because one stalled probe pushed the mean RTT past the
    program's own runtime).  The minimum is the floor the timed reps
    actually pay."""
    import jax
    import numpy as np

    ident = jax.jit(lambda x: x + 1.0)
    z = jax.device_put(np.zeros((4, 4), np.float32))
    float(np.asarray(ident(z))[0, 0])
    probes = []
    for _ in range(10):
        t0 = time.time()
        _ = np.asarray(ident(z))
        probes.append(time.time() - t0)
    return min(probes)


def _make_frames(n, h, w, seed=0):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def mk(key):
        u = jax.random.uniform(key, (n, h, w, 3), jnp.float32)
        return jnp.floor((u * 0.9 + 0.05) * 255.0) / 255.0

    f = mk(jax.random.PRNGKey(seed))
    f.block_until_ready()
    return f


def _timed(run, frames, reps, rtt):
    float(run(frames))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.time()
        _ = float(run(frames))
        times.append(time.time() - t0 - rtt)
    return max(float(np.median(times)), 1e-9)


def _scale_k(k, h, w):
    """Scale the chained-iteration count inversely with frame area so the
    in-loop device time dominates the tunnel RTT at small sizes (at VGA an
    unscaled loop measures below the RTT and the subtraction clamps)."""
    return max(k, int(round(k * (1080 * 1920) / (h * w))))


def bench_enhance(h, w, rtt, n=8, k=64, reps=5):
    k = _scale_k(k, h, w)
    import jax
    import jax.numpy as jnp

    from underwater_image_enhancement_tpu.pipeline.enhance import enhance_batch

    frames = _make_frames(n, h, w)

    @jax.jit
    def run(frames):
        def body(i, x):
            out = enhance_batch(x, 10.0, 90.0, 0.6, 1.2, stretch_mode="hist")
            return _requantize(out)

        x = jax.lax.fori_loop(0, k, body, frames)
        return jnp.sum(x[:, ::256, ::256, 0])

    return _timed(run, frames, reps, rtt) / (n * k)


def bench_six(h, w, rtt, batch=1, k=16, reps=5, fast=True):
    """Honest harness: ALL SIX outputs are the fori_loop carry, so every
    iteration must fully materialize each strategy's full-resolution frame
    (feeding back only one output would let XLA skip the non-probed pixels
    of the other five).  fast=False benches the EXACT parity tier
    (per-block-Canny quadtree airlight + exact radix percentiles +
    exact-gather LAB)."""
    k = _scale_k(k, h, w)
    import jax
    import jax.numpy as jnp

    from underwater_image_enhancement_tpu.pipeline.enhance import (
        six_strategy_tuple,
    )

    frames = _make_frames(batch, h, w)

    def one(im):
        outs, code = six_strategy_tuple(im, fast=fast)
        return outs

    @jax.jit
    def run(frames):
        def body(i, carry):
            if batch == 1:
                x = _requantize(carry[0][0])
                return tuple(o[None] for o in one(x))
            xs = _requantize(carry[0])
            outs = jax.vmap(one)(xs)
            return outs

        init = body(0, (frames,) * 6)
        out = jax.lax.fori_loop(0, k, body, init)
        return sum(jnp.sum(o[:, ::256, ::256, 0]) for o in out)

    return _timed(run, frames, reps, rtt) / (batch * (k + 1))


def bench_label(h, w, rtt, batch=4, k=4, reps=5, fast=False):
    """fast=True benches the throughput labeling tier (cli build-dataset
    --fast: canonical airlight descent, fast guided filter, histogram
    percentiles); the default is the exact parity tier."""
    if (h, w) == SIZES["vga"]:
        k = 8  # full-area scaling would overshoot: label is ~30 ms/frame
    import jax
    import jax.numpy as jnp

    from underwater_image_enhancement_tpu.select.system import _label_batch
    from underwater_image_enhancement_tpu.utils.config import (
        DEFAULT_QUALITY_WEIGHTS,
    )

    weights = tuple(sorted(DEFAULT_QUALITY_WEIGHTS.items()))
    frames = _make_frames(batch, h, w)

    @jax.jit
    def run(frames):
        def body(i, x):
            feats, scores, best, winners = _label_batch(
                x, weights, return_all=False, fast=fast)
            return _requantize(winners + 1e-9 * jnp.mean(feats))

        x = jax.lax.fori_loop(0, k, body, frames)
        return jnp.sum(x[:, ::128, ::128, 0])

    return _timed(run, frames, reps, rtt) / (batch * k)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workloads", default="enhance,six,label")
    ap.add_argument("--sizes", default="1080p,vga")
    ap.add_argument("--six-batch", type=int, default=1)
    args = ap.parse_args()

    rtt = _rtt()
    runners = {"enhance": bench_enhance, "six": bench_six,
               "six-exact": bench_six, "label": bench_label,
               "label-fast": bench_label}
    for size in args.sizes.split(","):
        h, w = SIZES[size]
        for wl in args.workloads.split(","):
            kw = {}
            if wl == "six":
                kw["batch"] = args.six_batch
            elif wl == "six-exact":
                kw["batch"] = args.six_batch
                kw["fast"] = False
            elif wl == "label-fast":
                kw["fast"] = True
            per_frame = runners[wl](h, w, rtt, **kw)
            print(json.dumps({
                "metric": f"{wl}_{size}",
                "value": round(1.0 / per_frame, 1),
                "unit": "frames/s/chip",
                "ms_per_frame": round(per_frame * 1e3, 3),
            }), flush=True)


if __name__ == "__main__":
    main()
