"""Inference engine — EnhancementPredictor (use_trained_model.py:13-164).

Pipeline per image: 79-dim features + 224^2 ImageNet-normalized input ->
ImprovedVGGParameterNet -> parameter dict with defaults
(guided_radius=15, use_gamma=1) and safety clamps (:69-79) -> full-
resolution DifferentiableEnhancement -> NaN scrub (:107-109).

Parameters are predicted at 224x224 but applied at FULL resolution — the
tiny-net + big-fused-elementwise structure the TPU build is designed around
(SURVEY.md §2.7).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from underwater_image_enhancement_tpu.features.full import extract_all_features
from underwater_image_enhancement_tpu.models.vgg import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    ImprovedVGGParameterNet,
)
from underwater_image_enhancement_tpu.ops.resize import resize_u8
from underwater_image_enhancement_tpu.pipeline.enhance import enhance_batch
from underwater_image_enhancement_tpu.utils import io as uio

CLAMPS = {  # use_trained_model.py:74-79
    "omega": (0.1, 0.9),
    "gamma": (0.5, 3.0),
    "L_low": (1.0, 30.0),
    "L_high": (65.0, 99.0),
    "guided_radius": (1.0, 50.0),
    "use_gamma": (0.0, 1.0),
}


class EnhancementPredictor:
    def __init__(self, checkpoint_path: Optional[str] = None,
                 hidden_dim: int = 256, input_size: int = 224, seed: int = 0,
                 pretrained_vgg: Optional[str] = "auto"):
        self.input_size = input_size
        self.model = ImprovedVGGParameterNet(hidden_dim=hidden_dim)
        img0 = jnp.zeros((1, input_size, input_size, 3))
        feats0 = jnp.zeros((1, 79))
        self.variables = self.model.init(jax.random.PRNGKey(seed), img0, feats0)
        if pretrained_vgg == "auto":
            # conventional artifact path (tools/fetch_vgg16_npz.py output);
            # a loaded checkpoint below overrides the trunk anyway
            from underwater_image_enhancement_tpu.utils.weights import find_vgg16_npz

            pretrained_vgg = find_vgg16_npz()
        if pretrained_vgg is not None:
            # ImageNet VGG16 trunk from an offline-converted .npz
            # (vgg_16_UIE.py:149; heads stay whatever the checkpoint holds)
            from underwater_image_enhancement_tpu.models.vgg import load_backbone_npz

            self.variables = dict(self.variables)
            self.variables["params"] = load_backbone_npz(
                dict(self.variables["params"]), pretrained_vgg
            )
        if checkpoint_path is not None:
            self.load(checkpoint_path)
        self._apply = jax.jit(
            lambda v, im, ft: self.model.apply(v, im, ft, train=False)
        )
        self._prep = jax.jit(self._preprocess)

    def load(self, checkpoint_path: str) -> None:
        """Accepts VGGTrainer checkpoints (params [+ batch_stats]),
        mirroring the reference's tolerance of both checkpoint dialects
        (use_trained_model.py:21-24)."""
        from underwater_image_enhancement_tpu.train.trainer import restore_checkpoint

        like = {"params": self.variables["params"],
                "batch_stats": self.variables.get("batch_stats", {})}
        try:
            restored = restore_checkpoint(checkpoint_path, like)
        except Exception:
            # trainer checkpoints carry optimizer state etc. — retry with it
            import warnings

            from underwater_image_enhancement_tpu.train.trainer import VGGTrainer

            with warnings.catch_warnings():
                # only the trainer's random-perceptual-trunk warning is
                # irrelevant here (params/batch_stats alone are taken from
                # it); other warnings must still surface
                warnings.filterwarnings(
                    "ignore", message="VGGTrainer: perceptual loss.*")
                t = VGGTrainer(hidden_dim=self.model.hidden_dim,
                               image_size=self.input_size)
            t.load(checkpoint_path)
            restored = {"params": t.params, "batch_stats": t.batch_stats}
        self.variables = {"params": restored["params"],
                          "batch_stats": restored.get("batch_stats", {})}

    def _preprocess(self, img: jnp.ndarray) -> jnp.ndarray:
        """use_trained_model.py:39-46: u8 resize to 224 then /255, ImageNet
        normalize."""
        u8 = jnp.clip(img * 255.0, 0, 255).astype(jnp.int32)
        small = jnp.stack(
            [resize_u8(u8[..., c], self.input_size, self.input_size)
             for c in range(3)], axis=-1,
        ).astype(jnp.float32) / 255.0
        return (small - IMAGENET_MEAN) / IMAGENET_STD

    def predict_parameters(self, img: jnp.ndarray) -> Dict[str, float]:
        """(H, W, 3) [0,1] -> clamped scalar param dict (:53-81)."""
        feats = extract_all_features(img)[None]
        vgg_in = self._prep(img)[None]
        raw = self._apply(self.variables, vgg_in, feats)
        params = {k: float(np.asarray(v).reshape(-1)[0]) for k, v in raw.items()}
        params.setdefault("guided_radius", 15.0)
        params.setdefault("use_gamma", 1.0)
        params.setdefault("omega", 0.6)
        for k, (lo, hi) in CLAMPS.items():
            params[k] = float(np.clip(params.get(k, (lo + hi) / 2), lo, hi))
        return params

    def enhance_image(self, img: jnp.ndarray,
                      params: Optional[Dict[str, float]] = None) -> np.ndarray:
        """Full-resolution enhancement + NaN scrub (:83-111)."""
        if params is None:
            params = self.predict_parameters(img)
        out = enhance_batch(
            jnp.asarray(img)[None], params["L_low"], params["L_high"],
            params["omega"], params["gamma"], stretch_mode="index",
        )[0]
        out = np.asarray(out)
        if not np.isfinite(out).all():
            out = np.nan_to_num(out, nan=0.0, posinf=1.0, neginf=0.0)
        return np.clip(out, 0.0, 1.0)

    def process_single_image(self, input_path: str,
                             output_path: Optional[str] = None,
                             log=print) -> Dict[str, float]:
        img = uio.imread_unit(input_path)
        if img is None:
            raise ValueError(f"unreadable image: {input_path}")
        params = self.predict_parameters(jnp.asarray(img))
        out = self.enhance_image(jnp.asarray(img), params)
        inp = Path(input_path)
        if output_path is None:
            output_path = str(inp.parent / f"{inp.stem}_enhanced.png")
        else:
            op = Path(output_path)
            if op.suffix == "":
                output_path = str(op / f"{inp.stem}_enhanced.png")
        uio.imwrite_unit(output_path, out)
        log(f"saved: {output_path}")
        return params

    def process_folder(self, input_folder: str, output_folder: str,
                       log=print) -> int:
        files = uio.collect_images(input_folder)
        done = 0
        for p in files:
            try:
                out = str(Path(output_folder) / f"{p.stem}_enhanced.png")
                self.process_single_image(str(p), out, log=lambda *_: None)
                done += 1
            except Exception as e:  # per-item fault tolerance (:163-164)
                log(f"failed {p.name}: {e}")
        return done


class ZooPredictor:
    """EnhancementPredictor-style inference for the model_architectures.py
    backbones (resnet/efficientnet/vit, D11): six params predicted at
    ``input_size``², applied at FULL resolution through the zoo composite
    (models.diff_enhance.enhance_zoo) — the same tiny-net +
    big-fused-elementwise structure as the VGG predictor.  The reference
    ships these backbones with no inference driver at all
    (model_architectures.py has only forward smoke tests); this closes the
    loop on ZooTrainer checkpoints."""

    def __init__(self, checkpoint_path: Optional[str] = None,
                 model_type: str = "resnet", variant: str = "b0",
                 input_size: int = 224, seed: int = 0,
                 imagenet_normalize: bool = True):
        from underwater_image_enhancement_tpu.models import zoo

        self.model_type = model_type
        self.input_size = input_size
        self.imagenet_normalize = imagenet_normalize
        kwargs = {"variant": variant} if model_type == "efficientnet" else {}
        self.model = zoo.create_model(model_type, **kwargs)
        variables = self.model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, input_size, input_size, 3)))
        self.variables = {"params": variables["params"],
                          "batch_stats": variables.get("batch_stats", {})}
        if checkpoint_path is not None:
            self.load(checkpoint_path)
        self._apply = jax.jit(
            lambda v, im: self.model.apply(v, im, train=False))
        self._prep = jax.jit(self._preprocess)

    def load(self, checkpoint_path: str) -> None:
        """Accepts raw {params[, batch_stats]} checkpoints and full
        ZooTrainer checkpoints (with optimizer state etc.)."""
        from underwater_image_enhancement_tpu.train.trainer import (
            restore_checkpoint,
        )

        import numpy as _np

        like = {"params": self.variables["params"],
                "batch_stats": self.variables.get("batch_stats", {})}
        try:
            restored = restore_checkpoint(checkpoint_path, like)
        except Exception:
            # ZooTrainer checkpoints also carry opt_state + loss history;
            # restore against the trainer-shaped target without rebuilding
            # a trainer (its optimizer state shapes mirror the params)
            import optax

            tx = optax.chain(optax.clip_by_global_norm(1.0),
                             optax.adam(1e-4))
            like = {
                "params": self.variables["params"],
                "batch_stats": self.variables.get("batch_stats", {}),
                "opt_state": tx.init(self.variables["params"]),
                "train_losses": _np.zeros((0,), _np.float64),
                "val_losses": _np.zeros((0,), _np.float64),
            }
            restored = restore_checkpoint(checkpoint_path, like)
        self.variables = {"params": restored["params"],
                          "batch_stats": restored.get("batch_stats", {})}

    def _preprocess(self, img: jnp.ndarray) -> jnp.ndarray:
        """u8 resize to input_size, /255, ImageNet normalize (matching
        ZooTrainer._backbone_input plus the predictor-side resize)."""
        u8 = jnp.clip(img * 255.0, 0, 255).astype(jnp.int32)
        small = jnp.stack(
            [resize_u8(u8[..., c], self.input_size, self.input_size)
             for c in range(3)], axis=-1,
        ).astype(jnp.float32) / 255.0
        if not self.imagenet_normalize:
            return small
        return (small - IMAGENET_MEAN) / IMAGENET_STD

    def predict_parameters(self, img: jnp.ndarray) -> Dict[str, float]:
        """(H, W, 3) [0,1] -> clamped scalar six-param dict."""
        x = self._prep(img)[None]
        raw = self._apply(self.variables, x)
        params = {k: float(np.asarray(v).reshape(-1)[0])
                  for k, v in raw.items()}
        for k, (lo, hi) in CLAMPS.items():
            params[k] = float(np.clip(params.get(k, (lo + hi) / 2), lo, hi))
        return params

    def enhance_image(self, img: jnp.ndarray,
                      params: Optional[Dict[str, float]] = None) -> np.ndarray:
        """Full-resolution zoo-composite enhancement + NaN scrub."""
        from underwater_image_enhancement_tpu.models.diff_enhance import (
            enhance_zoo,
        )

        if params is None:
            params = self.predict_parameters(img)
        arrs = {k: jnp.full((1,), float(v), jnp.float32)
                for k, v in params.items()}
        out = np.asarray(enhance_zoo(jnp.asarray(img)[None], arrs,
                                     stretch_mode="index")[0])
        if not np.isfinite(out).all():
            out = np.nan_to_num(out, nan=0.0, posinf=1.0, neginf=0.0)
        return np.clip(out, 0.0, 1.0)

    def process_single_image(self, input_path: str,
                             output_path: Optional[str] = None,
                             log=print) -> Dict[str, float]:
        img = uio.imread_unit(input_path)
        if img is None:
            raise ValueError(f"unreadable image: {input_path}")
        params = self.predict_parameters(jnp.asarray(img))
        out = self.enhance_image(jnp.asarray(img), params)
        inp = Path(input_path)
        if output_path is None:
            output_path = str(inp.parent / f"{inp.stem}_enhanced.png")
        else:
            op = Path(output_path)
            if op.suffix == "":
                output_path = str(op / f"{inp.stem}_enhanced.png")
        uio.imwrite_unit(output_path, out)
        log(f"saved: {output_path}")
        return params

    def process_folder(self, input_folder: str, output_folder: str,
                       log=print) -> int:
        files = uio.collect_images(input_folder)
        done = 0
        for p in files:
            try:
                out = str(Path(output_folder) / f"{p.stem}_enhanced.png")
                self.process_single_image(str(p), out, log=lambda *_: None)
                done += 1
            except Exception as e:
                log(f"failed {p.name}: {e}")
        return done
