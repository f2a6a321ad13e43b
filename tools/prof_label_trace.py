"""Capture a jax.profiler trace of the Phase-1 label program """
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from underwater_image_enhancement_tpu.select.system import _label_batch
from underwater_image_enhancement_tpu.utils.config import (
    DEFAULT_QUALITY_WEIGHTS,
)

H, W = (1080, 1920) if len(sys.argv) < 2 else map(int, sys.argv[1].split("x"))
B = 4
K = 2
FAST = "--fast" in sys.argv
weights = tuple(sorted(DEFAULT_QUALITY_WEIGHTS.items()))


def requant(x):
    return jnp.floor(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0


@jax.jit
def mk(key):
    u = jax.random.uniform(key, (B, H, W, 3), jnp.float32)
    return jnp.floor((u * 0.9 + 0.05) * 255.0) / 255.0


frames = mk(jax.random.PRNGKey(0))
frames.block_until_ready()


@jax.jit
def run(x):
    def body(i, x):
        feats, scores, best, winners = _label_batch(
            x, weights, return_all=False, fast=FAST)
        return requant(winners + 1e-9 * jnp.mean(feats))
    y = jax.lax.fori_loop(0, K, body, x)
    return jnp.sum(y[:, ::128, ::128, 0])


float(run(frames))  # compile + warm

logdir = "/tmp/labeltrace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    float(run(frames))

cands = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", cands)
for c in cands:
    with gzip.open(c, "rt") as f:
        data = json.load(f)
    evs = [e for e in data.get("traceEvents", [])
           if e.get("ph") == "X" and e.get("dur", 0) > 0]
    pids = {p["pid"]: p.get("args", {}).get("name", "")
            for p in data.get("traceEvents", []) if p.get("ph") == "M"
            and p.get("name") == "process_name"}
    from collections import defaultdict
    tot = defaultdict(float)
    for e in evs:
        pname = pids.get(e["pid"], "")
        if "TPU" in pname or "tpu" in pname or "Device" in pname:
            tot[e["name"]] += e["dur"]
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:50]
    ssum = sum(tot.values())
    print(f"== {c}: {len(evs)} events, device total {ssum/1e3:.2f} ms"
          f" ({ssum/1e3/(B*K):.2f} ms/frame)")
    for name, dur in top:
        print(f"  {dur/1e3:9.3f} ms  {name[:110]}")
