"""Benchmark: end-to-end enhance() throughput at 1080p on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 2000 fps (BASELINE.json north-star target).

Methodology notes (this container tunnels to the chip, so naive timing is
unreliable): inputs are generated ON DEVICE, N distinct frames are enhanced
inside one jitted program whose outputs are folded to one scalar, and the
tunnel round-trip (measured with an identity program) is subtracted.
"""

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from underwater_image_enhancement_tpu.pipeline.enhance import enhance_batch

    H, W = 1080, 1920
    N = 8           # frames per inner batch
    K = 64          # chained repetitions per timed program: the timed work
                    # (~N*K*0.3 ms ≈ 150 ms) must DWARF the tunnel RTT
                    # (1-10 ms, load-dependent).  K=8 made the measurement
                    # RTT-dominated — the round-4 3.0k-vs-4.0k fps
                    # discrepancy between the two harnesses was exactly
                    # this noise (VERDICT r4 #2).
    REPS = 5        # timed repetitions (median reported)

    dev = jax.devices()[0]

    # on-device frame generation: uniform noise shaped to [0.05, 0.95] and
    # quantized to the u8 grid like any decoded image — on this grid the
    # benched 'hist' stretch is BIT-EQUAL to the sorted-index parity path
    # (tests/test_pipeline_api.py::test_enhance_hist_mode_bit_equal_on_u8_grid)
    @jax.jit
    def make_frames(key):
        u = jax.random.uniform(key, (N, H, W, 3), jnp.float32)
        return jnp.floor((u * 0.9 + 0.05) * 255.0) / 255.0

    frames = make_frames(jax.random.PRNGKey(0))
    frames.block_until_ready()

    # K data-dependent iterations via fori_loop: the body compiles ONCE and
    # each round's output (re-shaped to [0.05, 0.95] and re-quantized to the
    # u8 grid, like any decoded frame) feeds the next round's input, so the
    # device runs K sequential full-batch enhances per dispatch.  An earlier
    # K-times-unrolled variant kept K copies of the program's intermediates
    # live and measured ~50% slower from the memory pressure alone.
    @jax.jit
    def run(frames):
        def body(i, x):
            out = enhance_batch(x, 10.0, 90.0, 0.6, 1.2,
                                stretch_mode="hist")
            out = jnp.clip(out, 0.0, 1.0) * 0.9 + 0.05
            return jnp.floor(out * 255.0) / 255.0
        x = jax.lax.fori_loop(0, K, body, frames)
        return jnp.sum(x[:, ::256, ::256, 0])  # fold: full compute

    # warm up / compile
    float(run(frames))

    # tunnel RTT probe — MIN of 10, not the mean: one stalled probe would
    # inflate a mean and over-subtract from every rep (bench_pipelines._rtt
    # has the observed failure case); the minimum is the floor each timed
    # rep actually pays.
    ident = jax.jit(lambda x: x + 1.0)
    z = jax.device_put(np.zeros((4, 4), np.float32))
    float(np.asarray(ident(z))[0, 0])
    probes = []
    for _ in range(10):
        t0 = time.time()
        _ = np.asarray(ident(z))
        probes.append(time.time() - t0)
    rtt = min(probes)

    times = []
    for _ in range(REPS):
        t0 = time.time()
        _ = float(run(frames))
        times.append(time.time() - t0 - rtt)
    per_frame = max(float(np.median(times)), 1e-9) / (N * K)
    fps = 1.0 / per_frame

    print(json.dumps({
        "metric": "enhance_1080p_throughput",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 2000.0, 3),
    }))


if __name__ == "__main__":
    main()
