"""Capture a jax.profiler trace of the combined six --fast program """
import glob
import gzip
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from underwater_image_enhancement_tpu.pipeline.enhance import six_strategy_single

H, W = 1080, 1920
K = 10


def requant(x):
    return jnp.floor(jnp.clip(x, 0.0, 1.0) * 255.0) / 255.0


@jax.jit
def mk(key):
    u = jax.random.uniform(key, (H, W, 3), jnp.float32)
    return jnp.floor((u * 0.9 + 0.05) * 255.0) / 255.0


frame = mk(jax.random.PRNGKey(0))
frame.block_until_ready()


@jax.jit
def run(x):
    def body(i, x):
        stack, code = six_strategy_single(x, fast=True)
        return requant(stack[0] + 1e-9 * jnp.sum(stack[:, ::256, ::256, 0]))
    y = jax.lax.fori_loop(0, K, body, x)
    return jnp.sum(y[::256, ::256, 0])


float(run(frame))  # compile + warm

logdir = "/tmp/sixtrace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    float(run(frame))

# find the trace.json.gz the profiler wrote (python-level events + device)
cands = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", cands)
for c in cands:
    with gzip.open(c, "rt") as f:
        data = json.load(f)
    evs = [e for e in data.get("traceEvents", [])
           if e.get("ph") == "X" and e.get("dur", 0) > 0]
    # keep device-side events (pid names like /device:TPU:0)
    pids = {p["pid"]: p.get("args", {}).get("name", "")
            for p in data.get("traceEvents", []) if p.get("ph") == "M"
            and p.get("name") == "process_name"}
    from collections import defaultdict
    tot = defaultdict(float)
    for e in evs:
        pname = pids.get(e["pid"], "")
        if "TPU" in pname or "tpu" in pname or "Device" in pname:
            tot[e["name"]] += e["dur"]
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
    ssum = sum(tot.values())
    print(f"== {c}: {len(evs)} events, device total {ssum/1e3:.2f} ms")
    for name, dur in top:
        print(f"  {dur/1e3:9.3f} ms  {name[:110]}")
