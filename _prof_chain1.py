import sys, time, numpy as np, jax, jax.numpy as jnp
from underwater_image_enhancement_tpu.pipeline import six as six_mod
from underwater_image_enhancement_tpu.pipeline import cast as cast_mod
from underwater_image_enhancement_tpu.ops import stretch, histeq, colorspace as cs

H, W = 1080, 1920
K = 64
split = six_mod._split
img = jnp.floor((jax.random.uniform(jax.random.PRNGKey(0), (H, W, 3)) * .9 + .05) * 255.) / 255.
img.block_until_ready()
ident = jax.jit(lambda x: x + 1.0)
z = jax.device_put(np.zeros((4, 4), np.float32))
float(np.asarray(ident(z))[0, 0])
t0 = time.time()
for _ in range(5): _ = np.asarray(ident(z))
RTT = (time.time() - t0) / 5

def timed(label, per_image):
    @jax.jit
    def run(x0):
        def body(i, x):
            return jnp.floor(jnp.clip(per_image(x), 0., 1.) * 255.) / 255.
        x = jax.lax.fori_loop(0, K, body, x0)
        return jnp.sum(x[::256, ::256, 0])
    float(run(img))
    ts = []
    for _ in range(3):
        t0 = time.time(); float(run(img)); ts.append(time.time() - t0 - RTT)
    print(f"{label:24s} {float(np.median(ts))/K*1e3:8.3f} ms", flush=True)

def st(im): return jnp.stack(stretch.enhance_contrast_planes(split(im), 5., 98., method="hist-fast"), -1)
def cl(im): return jnp.stack(histeq.clahe_enhancement_planes(split(im), 3.0), -1)
def rs(im):
    A = six_mod._airlight(split(im), "hist-fast")
    return jnp.stack(six_mod._restore(split(im), 0.5, 15, 5e-1, "hist-fast", A), -1)
def gm(im): return jnp.stack(six_mod._gamma_pow(split(im), 1.3), -1)
def wb(im): return jnp.stack(stretch.white_balance_planes(split(im), 2.0, method="hist-fast"), -1)
def airx(im):
    A = six_mod._airlight(split(im), "hist-fast")
    return im + 1e-7 * (A[0] + A[1] + A[2])
def ident3(im): return im * 0.999

STAGES = {"id": ident3, "stretch": st, "clahe": cl, "restore+air": rs,
          "gamma": gm, "wb": wb, "air": airx}
for k in sys.argv[1:]:
    timed(k, STAGES[k])
