"""Capture a jax.profiler trace of the headline enhance_batch program."""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

from underwater_image_enhancement_tpu.pipeline.enhance import enhance_batch

H, W = (1080, 1920) if len(sys.argv) < 2 else map(int, sys.argv[1].split("x"))
B = 8
K = 16


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
        y = enhance_batch(x, 10.0, 90.0, 0.6, 1.2)
        return requant(y)
    y = jax.lax.fori_loop(0, K, body, x)
    return jnp.sum(y[:, ::128, ::128, 0])


float(run(frames))  # compile + warm

logdir = "/tmp/enhtrace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    float(run(frames))

for c in glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True):
    with gzip.open(c, "rt") as f:
        data = json.load(f)
    evs = [e for e in data.get("traceEvents", [])
           if e.get("ph") == "X" and e.get("dur", 0) > 0]
    pids = {p["pid"]: p.get("args", {}).get("name", "")
            for p in data.get("traceEvents", []) if p.get("ph") == "M"
            and p.get("name") == "process_name"}
    tot = defaultdict(float)
    for e in evs:
        pname = pids.get(e["pid"], "")
        if "TPU" in pname or "tpu" in pname or "Device" in pname:
            tot[e["name"]] += e["dur"]
    top = sorted(tot.items(), key=lambda kv: -kv[1])[:25]
    ssum = sum(v for k, v in tot.items() if "jit_run" not in k
               and not k.startswith("while"))
    print(f"== {c}: device op total {ssum/1e3:.2f} ms"
          f" ({ssum/1e3/(B*K):.4f} ms/frame over {B*K} frames)")
    for name, dur in top:
        print(f"  {dur/1e3:9.3f} ms  {dur/1e3/(B*K)*1e3:8.2f} us/fr  {name[:90]}")
