"""Water-Net-style gated-fusion CNN enhancer + a small UNet (Flax).

BASELINE config #5 asks for a "small CNN enhancer (Water-Net/UNet-style)
batched inference on 4K UIEB frames (stretch: full pipeline + CNN in one
jit)".  The reference repo has no image-to-image CNN; this module supplies
the two canonical families from the UIEB paper era, TPU-first:

* :class:`WaterNet` — the gated-fusion architecture of Li et al., "An
  Underwater Image Enhancement Benchmark Dataset and Beyond" (UIEB, TIP
  2019): the raw frame plus three classically pre-processed views
  (white-balanced, histogram-equalized, gamma-corrected) are each refined by
  a Feature Transformation Unit, and a confidence branch over the stacked
  views predicts per-pixel softmax weights that fuse the refinements.
* :class:`UNetEnhancer` — a compact 3-level encoder/decoder with skip
  connections producing a residual correction.

TPU design notes:
  - Everything is NHWC with static shapes; convs land on the MXU.  Modules
    take ``dtype`` so activations/filters can run in bfloat16 (params stay
    f32) — that is the deployment configuration; parity tests run f32.
  - :func:`waternet_enhance` computes the three pre-processed views with this
    package's existing kernels (ops/stretch.py gray-world WB,
    ops/histeq.py exact cv2 equalizeHist, gamma) INSIDE the same jitted
    program as the CNN — one XLA program, zero host round-trips.
  - 4K frames: :func:`enhance_sharded` shards the batch (and optionally
    image rows) over a ``jax.sharding.Mesh``; XLA's SPMD partitioner inserts
    the conv halo exchanges and the psum for the equalization histograms.

Forward parity is gated against an independent NumPy oracle
(testing/golden_cnn.py, tests/test_waternet.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import histeq, stretch


class FTU(nn.Module):
    """Feature Transformation Unit: refines one pre-processed view.

    Sees the raw frame alongside the view (6 input channels) and emits a
    3-channel refined view, as in Water-Net's per-input units.
    """

    features: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, raw: jnp.ndarray, view: jnp.ndarray) -> jnp.ndarray:
        # float32 mode pins conv precision to HIGHEST: the MXU's default
        # bf16 passes drift ~1e-3 vs the float64 numpy oracle on real TPUs
        prec = None if self.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
        x = jnp.concatenate([raw, view], axis=-1).astype(self.dtype)
        x = nn.relu(nn.Conv(self.features, (7, 7), dtype=self.dtype,
                            precision=prec)(x))
        x = nn.relu(nn.Conv(self.features, (5, 5), dtype=self.dtype,
                            precision=prec)(x))
        x = nn.relu(nn.Conv(3, (3, 3), dtype=self.dtype, precision=prec)(x))
        return x


class WaterNet(nn.Module):
    """Gated-fusion enhancer over (raw, wb, he, gc) NHWC views in [0, 1].

    The confidence branch mirrors the UIEB paper's 8-conv trunk
    (7x7/5x5/3x3 at ``features``, then three 3x3 at ``features // 2``, then a
    3-channel head) with a per-pixel softmax so the three confidence maps sum
    to one; output = sum_i conf_i * FTU_i(raw, view_i), clipped to [0, 1].
    """

    features: int = 128
    ftu_features: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, raw, wb, he, gc) -> jnp.ndarray:
        prec = None if self.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
        conv = functools.partial(nn.Conv, dtype=self.dtype, precision=prec)
        t = jnp.concatenate([raw, wb, he, gc], axis=-1).astype(self.dtype)
        t = nn.relu(conv(self.features, (7, 7))(t))
        t = nn.relu(conv(self.features, (5, 5))(t))
        t = nn.relu(conv(self.features, (3, 3))(t))
        for _ in range(3):
            t = nn.relu(conv(self.features // 2, (3, 3))(t))
        conf = nn.softmax(conv(3, (3, 3))(t).astype(jnp.float32), axis=-1)

        r_wb = FTU(self.ftu_features, self.dtype, name="ftu_wb")(raw, wb)
        r_he = FTU(self.ftu_features, self.dtype, name="ftu_he")(raw, he)
        r_gc = FTU(self.ftu_features, self.dtype, name="ftu_gc")(raw, gc)
        out = (conf[..., 0:1] * r_wb.astype(jnp.float32)
               + conf[..., 1:2] * r_he.astype(jnp.float32)
               + conf[..., 2:3] * r_gc.astype(jnp.float32))
        return jnp.clip(out, 0.0, 1.0)


class UNetEnhancer(nn.Module):
    """Compact 3-level UNet emitting a residual over the raw frame.

    Encoder features (F, 2F, 4F) with stride-2 downsampling convs, bilinear
    upsampling + skip concatenation on the way back, and a final 3-channel
    head added to the input (residual learning keeps identity easy).  H and W
    must be divisible by 4; :func:`unet_enhance` pads and crops.
    """

    features: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        prec = None if self.dtype == jnp.bfloat16 else jax.lax.Precision.HIGHEST
        conv = functools.partial(nn.Conv, dtype=self.dtype, precision=prec)
        raw = x
        x = x.astype(self.dtype)
        f = self.features

        e0 = nn.relu(conv(f, (3, 3))(x))
        e0 = nn.relu(conv(f, (3, 3))(e0))
        d1 = nn.relu(conv(2 * f, (3, 3), strides=(2, 2))(e0))
        e1 = nn.relu(conv(2 * f, (3, 3))(d1))
        d2 = nn.relu(conv(4 * f, (3, 3), strides=(2, 2))(e1))
        b = nn.relu(conv(4 * f, (3, 3))(d2))

        u1 = _upsample2(b)
        u1 = nn.relu(conv(2 * f, (3, 3))(jnp.concatenate([u1, e1], -1)))
        u0 = _upsample2(u1)
        u0 = nn.relu(conv(f, (3, 3))(jnp.concatenate([u0, e0], -1)))
        res = conv(3, (3, 3))(u0).astype(jnp.float32)
        return jnp.clip(raw + res, 0.0, 1.0)


def _upsample2(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour 2x upsample (pure reshape/broadcast: layout-friendly
    and exactly reproducible by the NumPy oracle)."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, 2 * h, 2 * w, c)


# ---------------------------------------------------------------------------
# Full pipeline + CNN in one jitted program
# ---------------------------------------------------------------------------

def preprocess_views(img: jnp.ndarray, gamma: float = 0.7
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The three classical views Water-Net fuses, from existing TPU kernels.

    img: (..., H, W, 3) float in [0, 1].  Returns (wb, he, gc):
    gray-world white balance, exact-cv2 per-channel histogram equalization,
    and brightening gamma (img ** gamma, gamma < 1), as in the UIEB paper.
    """
    wb = stretch.gray_world_white_balance(img)
    if img.ndim == 3:
        he = histeq.histogram_equalization(img)
    else:
        flat = img.reshape((-1,) + img.shape[-3:])
        he = jax.vmap(histeq.histogram_equalization)(flat)
        he = he.reshape(img.shape)
    gc = jnp.clip(stretch.gamma_correction_pow(img, gamma), 0.0, 1.0)
    return wb, he, gc


def init_waternet(rng, image_size: int = 64, model: Optional[WaterNet] = None):
    """Initialize WaterNet variables on a tiny dummy (shape-polymorphic:
    convs are size-agnostic, so any H, W works at apply time)."""
    model = model or WaterNet()
    z = jnp.zeros((1, image_size, image_size, 3), jnp.float32)
    return model.init(rng, z, z, z, z)


@functools.partial(jax.jit, static_argnums=(2,))
def waternet_enhance(variables, imgs: jnp.ndarray,
                     model: Optional[WaterNet] = None) -> jnp.ndarray:
    """Full pipeline + CNN as ONE XLA program (BASELINE config #5 stretch).

    imgs: (N, H, W, 3) or (H, W, 3) float in [0, 1].  Computes the WB / HE /
    gamma views on-device and applies the gated fusion net; no host
    round-trips between the classical stages and the CNN.
    """
    model = model or WaterNet()
    single = imgs.ndim == 3
    if single:
        imgs = imgs[None]
    wb, he, gc = preprocess_views(imgs)
    out = model.apply(variables, imgs, wb, he, gc)
    return out[0] if single else out


@functools.partial(jax.jit, static_argnums=(2,))
def unet_enhance(variables, imgs: jnp.ndarray,
                 model: Optional[UNetEnhancer] = None) -> jnp.ndarray:
    """UNet enhancer with automatic pad-to-multiple-of-4 and crop."""
    model = model or UNetEnhancer()
    single = imgs.ndim == 3
    if single:
        imgs = imgs[None]
    n, h, w, c = imgs.shape
    ph, pw = (-h) % 4, (-w) % 4
    x = jnp.pad(imgs, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    out = model.apply(variables, x)[:, :h, :w, :]
    return out[0] if single else out


def enhance_sharded(variables, imgs, mesh, model: Optional[WaterNet] = None,
                    shard_rows: bool = False) -> jnp.ndarray:
    """Sharded batch inference over a device mesh (4K-frame path).

    Default shards the batch over the mesh's 'data' axis (pure data
    parallel).  ``shard_rows=True`` additionally splits image rows across the
    same axis — for a single 4K frame that doesn't fit one chip's HBM — and
    relies on XLA SPMD to insert the conv halo exchanges and the histogram
    psum; rows per shard must exceed the 7-pixel conv halo.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    imgs = jnp.asarray(imgs)
    batch = imgs.shape[0] if imgs.ndim == 4 else 1
    if shard_rows:
        rows = imgs.shape[-3]
        if rows % n_dev != 0:
            raise ValueError(
                f"shard_rows: image rows ({rows}) must divide the mesh "
                f"'{axis}' axis size ({n_dev})")
        if rows // n_dev < 8:
            raise ValueError(
                f"shard_rows: {rows // n_dev} rows/shard is below the "
                f"7-pixel conv halo; use more rows or fewer devices")
    elif batch % n_dev != 0:
        raise ValueError(
            f"batch size ({batch}) must divide the mesh '{axis}' axis "
            f"size ({n_dev}); pad the batch or use shard_rows=True")
    spec = P(None, axis) if shard_rows else P(axis)
    imgs = jax.device_put(jnp.asarray(imgs), NamedSharding(mesh, spec))
    return waternet_enhance(variables, imgs, model)
