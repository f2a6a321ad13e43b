"""Training loops — optax/orbax equivalents of the reference trainers.

- ``MLPTrainer`` == EndToEndTrainer (deep_learning_parameters.py:253-459):
  ParameterPredictor on 79-dim features -> enhance_mlp -> ReferenceLoss,
  Adam 1e-4, grad-clip 1.0, 80/20 split, best-model checkpointing,
  training_history.json.
- ``VGGTrainer`` == ImprovedTrainer (vgg_16_UIE.py:481-615):
  ImprovedVGGParameterNet -> enhance_vgg -> CombinedLoss, AdamW 1e-5 /
  wd 1e-5, cosine warm restarts (T_0=10 epochs, T_mult=2, stepped per
  epoch like scheduler.step()), grad-clip 1.0, frozen early VGG convs
  (the reference freezes the first 16 conv parameter tensors = 8 convs,
  vgg_16_UIE.py:152-154), best + every-10-epoch checkpoints, early stop
  patience 15, resume.

TPU-first: train steps are jitted once and optionally data-parallel over a
device mesh (batch sharded on the 'data' axis; XLA inserts the gradient
all-reduce).  bf16 compute is the AMP analog (``compute_dtype='bfloat16'``).
Checkpoints via Orbax keep model/optimizer/history like the reference.
"""

from __future__ import annotations

import json
from functools import partial
from pathlib import Path
from typing import Any, Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from underwater_image_enhancement_tpu.models import diff_enhance, losses
from underwater_image_enhancement_tpu.models.mlp import ParameterPredictor
from underwater_image_enhancement_tpu.models.vgg import ImprovedVGGParameterNet
from underwater_image_enhancement_tpu.parallel.mesh import (
    data_parallel_sharding,
    maybe_mesh,
)


def cosine_warm_restarts(base_lr: float, t0: int, t_mult: int,
                         max_epochs: int) -> optax.Schedule:
    """CosineAnnealingWarmRestarts(T_0, T_mult), one step per EPOCH."""
    schedules = []
    boundaries = []
    t = t0
    total = 0
    while total < max_epochs:
        schedules.append(optax.cosine_decay_schedule(base_lr, t))
        total += t
        boundaries.append(total)
        t *= t_mult
    return optax.join_schedules(schedules, boundaries[:-1])


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, like: Dict[str, Any]) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(Path(path).absolute(), target=like)


class _BaseTrainer:
    """Shared epoch/checkpoint/early-stop machinery."""

    def _shard(self, x):
        """Shard a batch over the data-parallel mesh (identity without
        one) — shared by both trainers' run_epoch loops."""
        if self.mesh is None:
            return x
        return jax.device_put(x, data_parallel_sharding(self.mesh)(x))

    def __init__(self):
        self.train_losses: list = []
        self.val_losses: list = []

    def fit(self, train_batches_fn, val_batches_fn, epochs: int,
            output_folder: str, patience: int = 15,
            checkpoint_every: int = 10, log=print) -> Dict[str, list]:
        """Reference loop shape (vgg_16_UIE.py:728-772): per epoch train +
        validate, lr schedule per epoch, best/periodic ckpt, early stop."""
        out = Path(output_folder)
        out.mkdir(parents=True, exist_ok=True)
        best = float("inf")
        bad_epochs = 0
        try:
            for epoch in range(self.start_epoch, epochs):
                tr = self.run_epoch(train_batches_fn(), train=True)
                va = self.run_epoch(val_batches_fn(), train=False)
                self.train_losses.append(tr)
                self.val_losses.append(va)
                self.epoch_hook(epoch)
                log(f"epoch {epoch + 1}/{epochs}: train {tr:.6f} val {va:.6f}")
                if va < best:
                    best = va
                    bad_epochs = 0
                    self.save(str(out / "best_model"))
                else:
                    bad_epochs += 1
                if (epoch + 1) % checkpoint_every == 0:
                    self.save(str(out / f"checkpoint_epoch_{epoch + 1}"))
                if bad_epochs >= patience:
                    log(f"early stopping at epoch {epoch + 1}")
                    break
        except KeyboardInterrupt:
            # interrupt checkpoint (vgg_16_UIE.py:796-799)
            log("interrupted — saving checkpoint")
            self.save(str(out / "interrupted_checkpoint"))
            raise
        except Exception as e:  # OOM advice (vgg_16_UIE.py:778-786)
            if "RESOURCE_EXHAUSTED" in str(e) or "out of memory" in str(e).lower():
                log("out of device memory — reduce batch size or image "
                    "resolution; saving checkpoint")
                self.save(str(out / "oom_checkpoint"))
            raise
        self.save(str(out / "final_model"))
        history = {"train_loss": self.train_losses, "val_loss": self.val_losses}
        with open(out / "training_history.json", "w") as f:
            json.dump(history, f, indent=2)
        return history

    def epoch_hook(self, epoch: int) -> None:
        pass

    @property
    def start_epoch(self) -> int:
        return len(self.train_losses)


class MLPTrainer(_BaseTrainer):
    """EndToEndTrainer equivalent (deep_learning_parameters.py:253-349)."""

    def __init__(self, feature_dim: int = 79, hidden_dim: int = 256,
                 num_blocks: int = 3, lr: float = 1e-4, seed: int = 0,
                 mesh=None, stretch_mode: str = "quantile"):
        super().__init__()
        self.model = ParameterPredictor(feature_dim, hidden_dim, num_blocks)
        rng = jax.random.PRNGKey(seed)
        self.params = self.model.init(rng, jnp.zeros((1, feature_dim)))
        self.tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
        self.opt_state = self.tx.init(self.params)
        self.mesh = maybe_mesh(mesh)
        self._step = self._build_step(stretch_mode)
        self._eval = self._build_eval(stretch_mode)
        self._rng = rng
        self._feature_cache = None  # set by cache_features()

    def _loss_fn(self, params, imgs, refs, feats, dropout_rng, train,
                 stretch_mode):
        pred = self.model.apply(
            params, feats, train=train,
            rngs={"dropout": dropout_rng} if train else {},
        )
        enhanced = diff_enhance.enhance_mlp(imgs, pred, stretch_mode=stretch_mode)
        total, _ = losses.reference_loss(enhanced, refs)
        return total

    def _build_step(self, stretch_mode):
        @partial(jax.jit, static_argnames=())
        def step(params, opt_state, imgs, refs, feats, rng):
            loss, grads = jax.value_and_grad(self._loss_fn)(
                params, imgs, refs, feats, rng, True, stretch_mode
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    def _build_eval(self, stretch_mode):
        @jax.jit
        def ev(params, imgs, refs, feats):
            return self._loss_fn(params, imgs, refs, feats,
                                 jax.random.PRNGKey(0), False, stretch_mode)

        return ev

    def _features(self, imgs: np.ndarray) -> jnp.ndarray:
        from underwater_image_enhancement_tpu.features.full import extract_batch

        return extract_batch(jnp.asarray(imgs))

    def cache_features(self, dataset, batch_size: int = 32, log=print) -> None:
        """One batched 79-dim extraction pass over the whole dataset, cached
        per index — removes the dominant per-epoch cost of this trainer
        (the reference re-extracts per item per epoch inside __getitem__,
        deep_learning_parameters.py:234; round-2 did it per batch per epoch).

        Features are computed on the UN-AUGMENTED images: the reference's
        EnhancementDataset has no augmentation at all, and caching
        canonical-orientation features keeps the pass valid across epochs
        even when pixel-space flips are enabled for the loss.  Consumed by
        run_epoch when batches carry dataset indices
        (PairedImageDataset.batches(with_indices=True))."""
        was_aug = getattr(dataset, "augment", False)
        dataset.augment = False
        try:
            chunks = []
            n = len(dataset)
            for s in range(0, n, batch_size):
                imgs = np.stack([dataset.load_pair(i)[0]
                                 for i in range(s, min(s + batch_size, n))])
                chunks.append(np.asarray(self._features(jnp.asarray(imgs))))
            self._feature_cache = jnp.asarray(np.concatenate(chunks, axis=0))
            log(f"cached features for {n} images")
        finally:
            dataset.augment = was_aug

    def run_epoch(self, batches: Iterable, train: bool) -> float:
        total, n = 0.0, 0
        for item in batches:
            if len(item) == 3:  # (dataset_indices, imgs, refs)
                idx, imgs, refs = item
            else:
                idx, (imgs, refs) = None, item
            imgs = self._shard(jnp.asarray(imgs))
            refs = self._shard(jnp.asarray(refs))
            if idx is not None and self._feature_cache is not None:
                feats = self._shard(self._feature_cache[jnp.asarray(idx)])
            else:
                feats = self._features(imgs)
            if train:
                self._rng, sub = jax.random.split(self._rng)
                self.params, self.opt_state, loss = self._step(
                    self.params, self.opt_state, imgs, refs, feats, sub
                )
            else:
                loss = self._eval(self.params, imgs, refs, feats)
            total += float(loss)
            n += 1
        return total / max(n, 1)

    def predict_params(self, feats: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return self.model.apply(self.params, feats)

    def save(self, path: str) -> None:
        save_checkpoint(path, {
            "params": self.params,
            "opt_state": self.opt_state,
            "train_losses": np.asarray(self.train_losses, np.float64),
            "val_losses": np.asarray(self.val_losses, np.float64),
        })

    def load(self, path: str) -> None:
        like = {
            "params": self.params,
            "opt_state": self.opt_state,
            "train_losses": np.zeros((0,), np.float64),
            "val_losses": np.zeros((0,), np.float64),
        }
        restored = restore_checkpoint(path, like)
        self.params = restored["params"]
        self.opt_state = restored["opt_state"]
        self.train_losses = list(np.asarray(restored["train_losses"]))
        self.val_losses = list(np.asarray(restored["val_losses"]))


class ZooTrainer(_BaseTrainer):
    """End-to-end trainer for the model_architectures.py backbones (D11).

    The reference ships CNN/EfficientNet/ViT parameter predictors with only
    forward smoke tests and a broken trainer import
    (model_architectures.py:199-203, 230-264); here they train through the
    same differentiable objective as the other trainers: image -> 6 params
    (models.zoo head ranges, model_architectures.py:61-66) -> stretch +
    omega-dehaze + use_gamma-gated gamma -> ReferenceLoss vs the UIEB
    reference image.  ``pretrained`` loads a converted torchvision .npz
    backbone for ANY of the three trunks (models.zoo.load_{resnet18,
    efficientnet,vit}_npz); by default the conventional artifact
    (utils.weights.find_zoo_npz) is used when present.  ``variant`` selects
    the efficientnet width/depth scale (b0/b3, model_architectures.py:83).

    Like VGGTrainer, the backbone input is ImageNet-normalized by default
    (what the torchvision trunks were trained on; the enhancement composite
    and the loss still consume the raw [0,1] images) —
    ``imagenet_normalize=False`` opts out.
    """

    def __init__(self, model_type: str = "resnet", lr: float = 1e-4,
                 seed: int = 0, mesh=None, image_size: int = 224,
                 stretch_mode: str = "quantile",
                 pretrained: str | None = "auto", variant: str = "b0",
                 imagenet_normalize: bool = True):
        super().__init__()
        from underwater_image_enhancement_tpu.models import zoo

        self.model_type = model_type
        self.variant = variant
        self.imagenet_normalize = imagenet_normalize
        kwargs = {"variant": variant} if model_type == "efficientnet" else {}
        self.model = zoo.create_model(model_type, **kwargs)
        rng = jax.random.PRNGKey(seed)
        variables = self.model.init(
            rng, jnp.zeros((1, image_size, image_size, 3)))
        if pretrained == "auto":
            from underwater_image_enhancement_tpu.utils.weights import (
                find_zoo_npz,
            )

            pretrained = (find_zoo_npz(model_type, variant)
                          if model_type in ("resnet", "efficientnet", "vit")
                          else None)
        if pretrained is not None:
            if model_type == "resnet":
                variables = zoo.load_resnet18_npz(variables, pretrained)
            elif model_type == "efficientnet":
                variables = zoo.load_efficientnet_npz(variables, pretrained,
                                                      variant)
            elif model_type == "vit":
                variables = zoo.load_vit_npz(variables, pretrained)
            else:
                raise ValueError(
                    "pretrained import exists for the resnet18/efficientnet/"
                    "vit backbones (model_architectures.py:13,83,131)")
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
        self.opt_state = self.tx.init(self.params)
        self.mesh = maybe_mesh(mesh)
        self._stretch_mode = stretch_mode
        self._rng = rng
        self._step = self._make_step()
        self._eval = self._make_eval()

    def _backbone_input(self, imgs):
        """ImageNet-normalize the backbone branch (identical to
        models.predictor.ZooPredictor); raw [0,1] when opted out."""
        if not self.imagenet_normalize:
            return imgs
        from underwater_image_enhancement_tpu.models.vgg import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )

        return (imgs - IMAGENET_MEAN) / IMAGENET_STD

    def _apply_enhance(self, imgs, pred):
        """The six-param differentiable composite
        (models.diff_enhance.enhance_zoo)."""
        return diff_enhance.enhance_zoo(imgs, pred,
                                        stretch_mode=self._stretch_mode)

    def _loss_fn(self, params, batch_stats, imgs, refs, rng, train):
        variables = {"params": params, "batch_stats": batch_stats}
        x = self._backbone_input(imgs)
        if train:
            pred, mutated = self.model.apply(
                variables, x, train=True, rngs={"dropout": rng},
                mutable=["batch_stats"])
            new_stats = mutated["batch_stats"]
        else:
            pred = self.model.apply(variables, x, train=False)
            new_stats = batch_stats
        enhanced = self._apply_enhance(imgs, pred)
        total, _ = losses.reference_loss(enhanced, refs)
        return total, new_stats

    def _make_step(self):
        @jax.jit
        def step(params, batch_stats, opt_state, imgs, refs, rng):
            (loss, new_stats), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True)(
                    params, batch_stats, imgs, refs, rng, True)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss

        return step

    def _make_eval(self):
        @jax.jit
        def ev(params, batch_stats, imgs, refs):
            loss, _ = self._loss_fn(params, batch_stats, imgs, refs,
                                    jax.random.PRNGKey(0), False)
            return loss

        return ev

    def run_epoch(self, batches: Iterable, train: bool) -> float:
        total, n = 0.0, 0
        for item in batches:
            if len(item) == 3:  # (dataset_indices, imgs, refs)
                _, imgs, refs = item
            else:
                imgs, refs = item
            imgs = self._shard(jnp.asarray(imgs))
            refs = self._shard(jnp.asarray(refs))
            if train:
                self._rng, sub = jax.random.split(self._rng)
                self.params, self.batch_stats, self.opt_state, loss = \
                    self._step(self.params, self.batch_stats, self.opt_state,
                               imgs, refs, sub)
            else:
                loss = self._eval(self.params, self.batch_stats, imgs, refs)
            total += float(loss)
            n += 1
        return total / max(n, 1)

    def predict_params(self, imgs: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return self.model.apply(
            {"params": self.params, "batch_stats": self.batch_stats},
            self._backbone_input(imgs), train=False)

    def save(self, path: str) -> None:
        save_checkpoint(path, {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "train_losses": np.asarray(self.train_losses, np.float64),
            "val_losses": np.asarray(self.val_losses, np.float64),
        })

    def load(self, path: str) -> None:
        like = {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "train_losses": np.zeros((0,), np.float64),
            "val_losses": np.zeros((0,), np.float64),
        }
        restored = restore_checkpoint(path, like)
        self.params = restored["params"]
        self.batch_stats = restored["batch_stats"]
        self.opt_state = restored["opt_state"]
        self.train_losses = list(np.asarray(restored["train_losses"]))
        self.val_losses = list(np.asarray(restored["val_losses"]))


class VGGTrainer(_BaseTrainer):
    """ImprovedTrainer equivalent (vgg_16_UIE.py:481-615)."""

    FROZEN_CONVS = 8  # first 16 conv param tensors = 8 (kernel, bias) pairs

    def __init__(self, hidden_dim: int = 256, lr: float = 1e-5,
                 weight_decay: float = 1e-5, epochs: int = 100,
                 image_size: int = 224, seed: int = 0, mesh=None,
                 compute_dtype: str = "bfloat16",
                 stretch_mode: str = "quantile",
                 vgg_loss_params=None, pretrained_vgg: str | None = "auto",
                 imagenet_normalize: bool = True):
        super().__init__()
        # Canonical backbone preprocessing: ImageNet-normalize the VGG input,
        # matching EnhancementPredictor._preprocess (use_trained_model.py:
        # 39-46) and what an ImageNet-pretrained trunk expects.  The
        # REFERENCE trains on raw [0,1] images — its dataset declares the
        # normalize transform but never applies it (vgg_16_UIE.py:327-330 is
        # dead code; __getitem__ at :389-421 returns raw images fed straight
        # to the net at :527-529) while its inference normalizes — a silent
        # train->inference skew.  imagenet_normalize=False reproduces that
        # reference-faithful raw-input training.  See docs/PARITY.md
        # "Known divergences".
        self.imagenet_normalize = imagenet_normalize
        # bf16 compute by default — the AMP-autocast analog the reference
        # trains under (vgg_16_UIE.py:504 GradScaler); params, the loss,
        # and the enhancement pipeline stay float32
        self.compute_dtype = (jnp.bfloat16 if compute_dtype == "bfloat16"
                              else jnp.float32)
        self.model = ImprovedVGGParameterNet(hidden_dim=hidden_dim,
                                             dtype=self.compute_dtype)
        rng = jax.random.PRNGKey(seed)
        img0 = jnp.zeros((1, image_size, image_size, 3))
        feats0 = jnp.zeros((1, 79))
        variables = self.model.init(rng, img0, feats0)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        if pretrained_vgg == "auto":
            # conventional artifact path (tools/fetch_vgg16_npz.py output);
            # None when no artifact is installed
            from underwater_image_enhancement_tpu.utils.weights import find_vgg16_npz

            pretrained_vgg = find_vgg16_npz()
        if pretrained_vgg is not None:
            # ImageNet-pretrained VGG16 for both the backbone trunk
            # (vgg_16_UIE.py:149-154) and the perceptual loss (:257-269),
            # from an offline-converted .npz (models.vgg.convert_torch_vgg_to_npz)
            from underwater_image_enhancement_tpu.models.vgg import (
                load_backbone_npz,
                load_perceptual_npz,
            )

            self.params = load_backbone_npz(self.params, pretrained_vgg)
            if vgg_loss_params is None:
                vgg_loss_params = load_perceptual_npz(pretrained_vgg)
        if vgg_loss_params is None:
            # The reference's PerceptualLoss runs ImageNet-pretrained VGG16
            # (vgg_16_UIE.py:257-269); without weights the distance lives in
            # a random feature space.  Pass vgg_loss_params (see
            # models.vgg.load_perceptual_npz) for reference semantics.
            import warnings

            warnings.warn(
                "VGGTrainer: perceptual loss uses a RANDOM-init VGG trunk; "
                "pass vgg_loss_params=load_perceptual_npz(path) for the "
                "reference's pretrained-VGG16 perceptual loss",
                stacklevel=2,
            )
            vgg_loss_params = losses.init_perceptual_params(
                jax.random.PRNGKey(seed + 1), (1, image_size, image_size, 3)
            )
        self.vgg_loss_params = vgg_loss_params
        self.schedule = cosine_warm_restarts(lr, 10, 2, epochs)
        self._epoch_count = 0

        def freeze_mask(params):
            def mask_leaf(path, _):
                # freeze conv0..conv7 inside the 'vgg' trunk
                names = [getattr(p, "key", "") for p in path]
                if "vgg" in names:
                    for nm in names:
                        if nm.startswith("conv") and nm[4:].isdigit():
                            return int(nm[4:]) < self.FROZEN_CONVS
                return False

            return jax.tree_util.tree_map_with_path(mask_leaf, params)

        def trainable_mask(params):
            return jax.tree.map(lambda m: not m, freeze_mask(params))

        # Reference semantics (vgg_16_UIE.py:492-534): frozen convs have
        # requires_grad=False, so torch's clip_grad_norm_ sees only trainable
        # grads and AdamW never touches them (no update, no weight decay).
        # Hence: zero frozen grads FIRST, clip over the trainable-only norm,
        # and run AdamW masked to the trainable leaves.  The learning rate is
        # injected as optimizer-state so the per-epoch cosine-warm-restarts
        # value can be set inside the jitted step (see _set_lr).
        self.tx = optax.chain(
            optax.masked(optax.set_to_zero(), freeze_mask),
            optax.clip_by_global_norm(1.0),
            optax.masked(
                optax.inject_hyperparams(optax.adamw)(
                    learning_rate=lr, weight_decay=weight_decay
                ),
                trainable_mask,
            ),
        )
        self.opt_state = self.tx.init(self.params)
        self.mesh = maybe_mesh(mesh)
        self._stretch_mode = stretch_mode
        self._rng = rng
        self._step = self._make_step()
        self._eval = self._make_eval()

    def _backbone_input(self, imgs):
        """The backbone preprocessing applied to the [0,1] batch — identical
        to EnhancementPredictor's normalize step (the resize happened in the
        dataset).  The enhancement pipeline and the loss still consume the
        raw [0,1] images."""
        if not self.imagenet_normalize:
            return imgs
        from underwater_image_enhancement_tpu.models.vgg import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )

        return (imgs - IMAGENET_MEAN) / IMAGENET_STD

    def _forward(self, params, batch_stats, imgs, feats, refs, dropout_rng,
                 train):
        variables = {"params": params, "batch_stats": batch_stats}
        x = self._backbone_input(imgs).astype(self.compute_dtype)
        # mutable must be False (not []) when not training: an empty
        # mutable LIST still makes flax return an (output, vars) tuple
        out = self.model.apply(
            variables, x, feats, train=train,
            mutable=["batch_stats"] if train else False,
            rngs={"dropout": dropout_rng} if train else {},
        )
        if train:
            pred, updates = out
            new_stats = updates["batch_stats"]
        else:
            pred, new_stats = out, batch_stats
        pred = {k: v.astype(jnp.float32) for k, v in pred.items()}
        enhanced = diff_enhance.enhance_vgg(imgs, pred,
                                            stretch_mode=self._stretch_mode)
        total, comps = losses.combined_loss(self.vgg_loss_params, enhanced,
                                            refs, dtype=self.compute_dtype)
        return total, (comps, new_stats)

    def _set_lr(self, opt_state, lr):
        """Write the injected AdamW learning rate into the chain's state.

        Chain layout (see __init__): (masked-zero, clip, masked(inject(adamw)));
        traced-lr writes here are the scheduler.step()-per-epoch analog of
        vgg_16_UIE.py:499-501,749."""
        masked_state = opt_state[2]
        inj = masked_state.inner_state
        inj = inj._replace(hyperparams={**inj.hyperparams, "learning_rate": lr})
        return (opt_state[0], opt_state[1],
                masked_state._replace(inner_state=inj))

    def _make_step(self):
        @jax.jit
        def step(params, batch_stats, opt_state, imgs, feats, refs, rng, epoch):
            opt_state = self._set_lr(opt_state, self.schedule(epoch))
            (loss, (comps, new_stats)), grads = jax.value_and_grad(
                self._forward, has_aux=True
            )(params, batch_stats, imgs, feats, refs, rng, True)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss

        return step

    def _make_eval(self):
        @jax.jit
        def ev(params, batch_stats, imgs, feats, refs):
            loss, _ = self._forward(params, batch_stats, imgs, feats, refs,
                                    jax.random.PRNGKey(0), False)
            return loss

        return ev

    def run_epoch(self, batches: Iterable, train: bool) -> float:
        from underwater_image_enhancement_tpu.features.basic import extract_basic_batch

        total, n = 0.0, 0
        epoch = jnp.asarray(self._epoch_count, jnp.int32)
        for imgs, refs in batches:
            imgs = self._shard(jnp.asarray(imgs))
            refs = self._shard(jnp.asarray(refs))
            feats = extract_basic_batch(imgs)
            if train:
                self._rng, sub = jax.random.split(self._rng)
                (self.params, self.batch_stats, self.opt_state, loss) = self._step(
                    self.params, self.batch_stats, self.opt_state,
                    imgs, feats, refs, sub, epoch,
                )
            else:
                loss = self._eval(self.params, self.batch_stats, imgs, feats, refs)
            total += float(loss)
            n += 1
        return total / max(n, 1)

    def epoch_hook(self, epoch: int) -> None:
        self._epoch_count = epoch + 1  # scheduler.step() per epoch

    def save(self, path: str) -> None:
        save_checkpoint(path, {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "train_losses": np.asarray(self.train_losses, np.float64),
            "val_losses": np.asarray(self.val_losses, np.float64),
        })

    def load(self, path: str) -> None:
        like = {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "train_losses": np.zeros((0,), np.float64),
            "val_losses": np.zeros((0,), np.float64),
        }
        restored = restore_checkpoint(path, like)
        self.params = restored["params"]
        self.batch_stats = restored["batch_stats"]
        self.opt_state = restored["opt_state"]
        self.train_losses = list(np.asarray(restored["train_losses"]))
        self.val_losses = list(np.asarray(restored["val_losses"]))
        # resume the per-epoch LR schedule where it left off (vgg:713-717)
        self._epoch_count = len(self.train_losses)
