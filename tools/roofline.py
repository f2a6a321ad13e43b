"""HBM-bandwidth roofline for the three real workloads (docs/BENCH.md).

This workload family is memory-bound (pointwise/windowed image ops; the
only MXU work is LUT one-hot contractions), so MFU is the wrong lens.
The meaningful utilization figure is: bytes the compiled program touches
per frame vs what v5e HBM can move in the measured frame time.

Bytes come from XLA's own cost model on the COMPILED executable
(``compiled.cost_analysis()['bytes accessed']`` — post-fusion, so it
counts real HBM traffic, not traced intermediates).  Frame times are the
measured medians from bench_pipelines.py; pass them via --ms, or omit to
just print bytes/frame.

Usage (on the chip):
    python tools/roofline.py                  # bytes/frame per workload
    python tools/roofline.py --ms enhance=0.250,six=5.45,label=9.58
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

# v5e (lite) HBM: 16 GB @ ~819 GB/s (public spec, How to Scale Your Model)
HBM_GBPS = 819.0

H, W = 1080, 1920


def _frames(b):
    u = jax.random.uniform(jax.random.PRNGKey(0), (b, H, W, 3), jnp.float32)
    return jnp.floor((u * 0.9 + 0.05) * 255.0) / 255.0


def _bytes_accessed(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device program
        ca = ca[0]
    return float(ca.get("bytes accessed", float("nan")))


def wl_enhance():
    from underwater_image_enhancement_tpu.pipeline.enhance import enhance_batch

    imgs = _frames(8)

    def f(x):
        return enhance_batch(x, 10.0, 90.0, 0.6, 1.2)

    return _bytes_accessed(f, imgs) / 8.0


def wl_six():
    from underwater_image_enhancement_tpu.pipeline.enhance import (
        six_strategy_tuple,
    )

    img = _frames(1)[0]

    def f(x):
        outs, code = six_strategy_tuple(x, fast=True)
        return outs, code

    return _bytes_accessed(f, img)


def wl_label():
    from underwater_image_enhancement_tpu.select.system import _label_batch
    from underwater_image_enhancement_tpu.utils.config import (
        DEFAULT_QUALITY_WEIGHTS,
    )

    weights = tuple(sorted(DEFAULT_QUALITY_WEIGHTS.items()))
    imgs = _frames(4)

    def f(x):
        return _label_batch(x, weights, return_all=False, fast=True)

    return _bytes_accessed(f, imgs) / 4.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ms", default="",
                    help="comma list name=ms_per_frame (measured medians)")
    args = ap.parse_args()
    ms = {}
    for part in filter(None, args.ms.split(",")):
        k, v = part.split("=")
        ms[k] = float(v)

    for name, fn in (("enhance", wl_enhance), ("six", wl_six),
                     ("label", wl_label)):
        try:
            nbytes = fn()
        except Exception as e:  # noqa: BLE001 — report and continue
            print(json.dumps({"workload": name, "error": str(e)[:200]}))
            continue
        row = {"workload": name, "bytes_per_frame_mb": round(nbytes / 2**20, 1)}
        if name in ms:
            t = ms[name] / 1e3
            gbps = nbytes / t / 1e9
            row["ms_per_frame"] = ms[name]
            row["implied_gbps"] = round(gbps, 1)
            row["hbm_fraction"] = round(gbps / HBM_GBPS, 3)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
