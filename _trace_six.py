import glob, gzip, json, time, numpy as np, jax, jax.numpy as jnp
from underwater_image_enhancement_tpu.pipeline.enhance import six_strategy_single

H, W = 1080, 1920
img = jnp.floor((jax.random.uniform(jax.random.PRNGKey(0), (H, W, 3)) * .9 + .05) * 255.) / 255.

@jax.jit
def run(x0):
    def body(i, x):
        out, code = six_strategy_single(x, fast=True)
        return jnp.floor(jnp.clip(out[i % 6], 0., 1.) * 255.) / 255.
    return jnp.sum(jax.lax.fori_loop(0, 4, body, x0)[::256, ::256, 0])

float(run(img))
with jax.profiler.trace("/tmp/sixtrace"):
    float(run(img))
    float(run(img))
print("traced")
files = glob.glob("/tmp/sixtrace/**/*.trace.json.gz", recursive=True)
print(files)
