"""Self-supervised strategy-selection system (main.py:28-456).

Phase 1 (build_dataset, main.py:63-196): for every image, extract the
79-dim features, run all 5 strategies, score each with the weighted quality
metric, label with the argmax strategy, save the winner image, and log a CSV
row.  On TPU the per-image strategy+metric evaluation runs as batched
compiled programs (the 99% of compute, SURVEY.md §2.4); dataset rows are
accumulated host-side.

Phase 2 (train_classifier, main.py:225-335): stratified 80/20 split,
StandardScaler, RandomForest/GradientBoosting/SVC with config.py:100-119
hyperparameters, 5-fold CV, best-by-test-accuracy selection, pickled
artifacts.  The tabular classifier stays host-side sklearn (it sees only
79-dim vectors); an on-device Flax MLP alternative is available via
``train_classifier(include_mlp=True)``.

predict (main.py:398-434): features -> scale -> classifier -> (label,
probabilities).
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

import jax
from functools import partial

from underwater_image_enhancement_tpu.features.full import extract_all_features
from underwater_image_enhancement_tpu.pipeline.strategies import (
    STRATEGY_DISPLAY,
    STRATEGY_FNS,
    STRATEGY_FNS_FAST_PLANES,
    STRATEGY_FNS_PLANES,
)
from underwater_image_enhancement_tpu.utils import io as uio
from underwater_image_enhancement_tpu.utils.config import Config

_LABEL_ORDER = tuple(STRATEGY_FNS)


@partial(jax.jit, static_argnames=("weights", "return_all", "fast"))
def _label_batch(imgs: jnp.ndarray, weights: tuple, return_all: bool = True,
                 fast: bool = False):
    """Phase-1 inner loop as ONE compiled program for a same-shape batch:
    79-dim features + all 5 strategies + weighted quality scores + argmax
    (main.py:116-146).  weights: hashable ((name, w), ...) tuple.
    return_all=False selects the winning image ON DEVICE and returns
    (B, H, W, 3) instead of the (B, 5, H, W, 3) stack — a 5x smaller
    device->host transfer for the default save-best-only Phase 1.
    fast=True labels with the throughput-tier strategies
    (pipeline/strategies.py STRATEGY_FNS_FAST) — near-tie winners may
    occasionally flip vs the exact tier."""
    from underwater_image_enhancement_tpu.features.full import extract_batch
    from underwater_image_enhancement_tpu.metrics.quality import (
        comprehensive_batch_planes,
    )

    fns = STRATEGY_FNS_FAST_PLANES if fast else STRATEGY_FNS_PLANES
    # CHANNEL-FIRST end to end: strategies emit (r, g, b) plane tuples, the
    # metrics consume them as planes, and the winner where-chain runs per
    # plane — NHWC is stacked exactly ONCE at exit.  The per-strategy
    # stack + the metrics' NHWC re-split cost ~0.9 ms/frame of pure layout
    # copies @1080p x batch 4 in the device trace (tools/prof_label_trace).
    # Scoring each strategy's batch directly (no (B, S, H, W, 3) stack) is
    # identical per-image math; fast=True also swaps the brightness
    # metric's L and the feature LAB/DCT onto the arithmetic tiers
    # (metrics.quality.assess_all_planes, features.full docstrings).
    outs_p = [fns[k](imgs) for k in _LABEL_ORDER]
    scores = jnp.stack(
        [comprehensive_batch_planes(o, dict(weights), fast=fast)
         for o in outs_p],
        axis=1)
    feats = extract_batch(imgs, fast=fast)
    best = jnp.argmax(scores, axis=1)
    if return_all:
        return feats, scores, best, jnp.stack(
            [jnp.stack(o, axis=-1) for o in outs_p], axis=1)
    # winner selection as a fused elementwise where-chain over the five
    # live outputs (bit-identical to stack + take_along_axis)
    best_planes = []
    for c in range(3):
        acc = outs_p[0][c]
        for k in range(1, len(outs_p)):
            acc = jnp.where((best == k)[:, None, None], outs_p[k][c], acc)
        best_planes.append(acc)
    return feats, scores, best, jnp.stack(best_planes, axis=-1)


def label_batch_dp(imgs, weights, mesh, return_all: bool = False,
                   fast: bool = False):
    """Data-parallel Phase-1 labeling: shard the (B, H, W, 3) image batch
    over a 1-D device mesh and run the fused label program on it.

    Every reduction inside `_label_batch` (strategy percentiles, quality
    histograms, the 79-dim features, the argmax) is per-image, so XLA
    partitions the whole program along the batch with ZERO collectives —
    the same pattern as `pipeline/enhance.enhance_batch_dp`.  This is the
    multi-chip story for the heaviest per-frame workload: the reference
    labels 890 UIEB images serially on the host (main.py:88-155).

    weights: hashable ((name, w), ...) tuple, as for `_label_batch`.
    B must be divisible by the mesh size.
    """
    from underwater_image_enhancement_tpu.parallel.mesh import shard_batch

    sharded = shard_batch(jnp.asarray(imgs), mesh)
    return _label_batch(sharded, weights, return_all, fast=fast)


@dataclass
class DatasetItem:
    filename: str
    features: np.ndarray
    best_strategy: str
    best_score: float
    all_scores: Dict[str, float]


@dataclass
class SelfSupervisedSystem:
    config: Config = field(default_factory=Config)

    def __post_init__(self):
        self.dataset: List[DatasetItem] = []
        self.classifier = None
        self.scaler = None
        self.classes_: List[str] = []
        self.results: Dict[str, Dict[str, float]] = {}

    # ---------------- Phase 1 ----------------

    def _mesh(self):
        """The Phase-1 data mesh: all visible devices (config.n_devices
        pins a count; config.data_parallel=False or 1 device -> None)."""
        from underwater_image_enhancement_tpu.parallel.mesh import default_mesh

        if not getattr(self.config, "data_parallel", True):
            return None
        return default_mesh(getattr(self.config, "n_devices", None))

    def _label_batch_np(self, imgs: np.ndarray, return_all: bool = True):
        """Run the fused Phase-1 program on a same-shape (B, H, W, 3) batch.

        Returns numpy (feats (B,79), scores (B,5), best (B,), stacks) where
        stacks is (B,5,H,W,3) or the device-selected winners (B,H,W,3) when
        return_all=False.  ONE device dispatch for features + all 5
        strategies + weighted scoring (the hot loop of main.py:63-196; the
        reference pays 1 + 5x2 full-image passes per image on the host).
        The batch is sharded over the data mesh when >1 device is visible —
        every reduction inside the program is per-image, so multi-device
        output is byte-identical to single-device (tests/test_cli_dp.py)."""
        from underwater_image_enhancement_tpu.parallel.mesh import (
            run_data_parallel,
        )

        frozen = tuple(sorted(self.config.quality_weights.items()))
        fast = bool(getattr(self.config, "fast_label", False))
        feats, scores, best, stacks = run_data_parallel(
            lambda b: _label_batch(b, frozen, return_all, fast=fast),
            np.asarray(imgs), self._mesh())
        return (np.asarray(feats), np.asarray(scores),
                np.asarray(best), np.asarray(stacks))

    def label_image(self, img: np.ndarray) -> Tuple[np.ndarray, DatasetItem]:
        """Run all strategies + scoring for one image (main.py:116-164)."""
        feats, scores, best, winners = self._label_batch_np(
            np.asarray(img)[None], return_all=False)
        names = [STRATEGY_DISPLAY[k] for k in _LABEL_ORDER]
        all_scores = {nm: float(s) for nm, s in zip(names, scores[0])}
        k = int(best[0])
        item = DatasetItem(
            filename="", features=feats[0], best_strategy=names[k],
            best_score=float(scores[0, k]), all_scores=all_scores,
        )
        return winners[0], item

    def build_dataset(self, log=print,
                      batch_size: Optional[int] = None) -> List[Dict]:
        """Phase 1 over config.image_folder; returns CSV rows
        (main.py:63-196).  Images are grouped by shape and processed in
        vmapped batches — one compiled program per distinct shape."""
        self.config.create_folders()
        files = uio.collect_images(self.config.image_folder)
        names = [STRATEGY_DISPLAY[k] for k in _LABEL_ORDER]
        rows_by_path: Dict[Path, Dict] = {}
        items_by_path: Dict[Path, DatasetItem] = {}
        order: List[Path] = []

        # STREAMING decode with shape grouping: images accumulate in
        # per-shape pending buffers that flush as soon as a full batch is
        # ready, so host memory is bounded by n_shapes x batch_size frames
        # (a decode-everything-first version held the whole dataset in RAM).
        # decode_iter/AsyncWriter overlap host decode + winner-PNG encode
        # with the device labeling program.
        pending: Dict[tuple, List[Tuple[Path, np.ndarray]]] = {}
        return_all = bool(self.config.save_all_enhanced)

        def flush(chunk):
            batch = np.stack([im for _, im in chunk])
            feats, scores, best, stacks = self._label_batch_np(
                batch, return_all=return_all)
            self._emit_chunk(chunk, feats, scores, best, stacks, names,
                             return_all, rows_by_path, items_by_path)

        bs = max(1, batch_size or self.config.batch_size)
        self._writer = uio.AsyncWriter()
        for path, img in uio.decode_iter(files, log=log, min_size=10):
            order.append(path)
            buf = pending.setdefault(img.shape, [])
            buf.append((path, img))
            if len(buf) == bs:
                flush(buf)
                buf.clear()
        for buf in pending.values():
            if buf:
                flush(buf)
        for wpath, err in self._writer.close():
            log(f"warning: write failed {Path(wpath).name}: {err}")

        # emit rows/dataset in the original folder order (reference order)
        csv_rows: List[Dict] = []
        for path in order:
            if path in rows_by_path:
                csv_rows.append(rows_by_path[path])
                self.dataset.append(items_by_path[path])
        if csv_rows:
            self._write_csv(csv_rows)
            self._save_dataset()
        return csv_rows

    def _emit_chunk(self, chunk, feats, scores, best, stacks, names,
                    return_all, rows_by_path, items_by_path):
        for j, (path, _) in enumerate(chunk):
            k = int(best[j])
            item = DatasetItem(
                filename=path.name, features=feats[j],
                best_strategy=names[k],
                best_score=float(scores[j, k]),
                all_scores={nm: float(s)
                            for nm, s in zip(names, scores[j])},
            )
            items_by_path[path] = item
            winner = stacks[j, k] if return_all else stacks[j]
            self._writer.write(
                str(Path(self.config.strategy_folder)
                    / f"{path.stem}_{item.best_strategy}.png"),
                winner,
            )
            if return_all:  # config.py:123 SAVE_ALL_ENHANCED
                for m, nm in enumerate(names):
                    if m == k:
                        continue
                    self._writer.write(
                        str(Path(self.config.strategy_folder)
                            / f"{path.stem}_{nm}.png"),
                        stacks[j, m],
                    )
            row = {"filename": path.name,
                   "best_strategy": item.best_strategy,
                   "best_score": item.best_score}
            row.update(item.all_scores)
            rows_by_path[path] = row

    def _write_csv(self, rows: List[Dict]) -> None:
        import csv

        path = Path(self.config.report_folder) / "dataset_building.csv"
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            w.writeheader()
            w.writerows(rows)

    def _save_dataset(self) -> None:
        path = Path(self.config.model_folder) / "dataset.pkl"
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump([item.__dict__ for item in self.dataset], f)

    def dataset_report(self) -> Dict[str, Dict[str, float]]:
        """Strategy distribution + mean scores (main.py:198-218; the
        reference then crashes on an undefined method at :221 — not
        reproduced)."""
        out: Dict[str, Dict[str, float]] = {}
        labels = [d.best_strategy for d in self.dataset]
        for s in sorted(set(labels)):
            scores = [d.best_score for d in self.dataset if d.best_strategy == s]
            out[s] = {
                "count": labels.count(s),
                "fraction": labels.count(s) / len(labels),
                "mean_score": float(np.mean(scores)),
                "std_score": float(np.std(scores)),
            }
        return out

    # ---------------- Phase 2 ----------------

    def train_classifier(self, log=print,
                         include_mlp: bool = False) -> Dict[str, Dict[str, float]]:
        """main.py:225-335: scale, fit RF/GB/SVC, 5-fold CV, pick best.
        include_mlp adds the on-device FlaxMLPClassifier to the candidate
        zoo (TPU-resident alternative; not in the reference)."""
        from sklearn.ensemble import (
            GradientBoostingClassifier,
            RandomForestClassifier,
        )
        from sklearn.metrics import accuracy_score
        from sklearn.model_selection import cross_val_score, train_test_split
        from sklearn.preprocessing import StandardScaler
        from sklearn.svm import SVC

        if not self.dataset:
            raise RuntimeError("dataset empty; run build_dataset() first")
        X = np.stack([d.features for d in self.dataset])
        y = np.array([d.best_strategy for d in self.dataset])
        # stratify only if every class has >= 2 members (sklearn requirement)
        counts = {c: int((y == c).sum()) for c in set(y)}
        strat = y if min(counts.values()) >= 2 else None
        X_tr, X_te, y_tr, y_te = train_test_split(
            X, y, test_size=self.config.test_size,
            random_state=self.config.random_seed, stratify=strat,
        )
        self.scaler = StandardScaler().fit(X_tr)
        X_trs = self.scaler.transform(X_tr)
        X_tes = self.scaler.transform(X_te)

        zoo = {
            "random_forest": RandomForestClassifier(
                **self.config.classifiers["random_forest"]),
            "gradient_boosting": GradientBoostingClassifier(
                **self.config.classifiers["gradient_boosting"]),
            "svm": SVC(probability=True, **self.config.classifiers["svm"]),
        }
        if include_mlp:
            from underwater_image_enhancement_tpu.select.mlp_classifier import (
                FlaxMLPClassifier,
            )

            zoo["mlp"] = FlaxMLPClassifier()
        if len(set(y)) < 2:
            log("warning: every image got the same best strategy — "
                "classifiers that require >=2 classes will be skipped")
        best_name, best_acc = None, -1.0
        for name, clf in zoo.items():
            try:
                clf.fit(X_trs, y_tr)
            except ValueError as e:  # e.g. single-class GB/SVC
                log(f"{name}: skipped ({e})")
                self.results[name] = {"test_accuracy": float("nan"),
                                      "cv_mean": float("nan"),
                                      "cv_std": float("nan")}
                continue
            acc = accuracy_score(y_te, clf.predict(X_tes))
            # folds bounded by the TRAIN split's smallest class (the CV runs
            # on y_tr; a class can be rarer there than in the full set)
            tr_counts = {c: int((y_tr == c).sum()) for c in set(y_tr)}
            cv_folds = min(self.config.cv_folds, min(tr_counts.values()),
                           len(X_tr))
            if cv_folds >= 2 and len(set(y_tr)) >= 2 and name != "mlp":
                cv = cross_val_score(clf, X_trs, y_tr, cv=cv_folds)
                cv_mean, cv_std = float(cv.mean()), float(cv.std())
            else:
                cv_mean = cv_std = float("nan")
            self.results[name] = {"test_accuracy": float(acc),
                                  "cv_mean": cv_mean, "cv_std": cv_std}
            log(f"{name}: test acc {acc:.3f}")
            if acc > best_acc:
                best_name, best_acc = name, acc
                self.classifier = clf
        if self.classifier is None:
            raise RuntimeError("no classifier could be trained on this dataset")
        self.classes_ = sorted(set(y))
        self._save_model(best_name)
        return self.results

    def _save_model(self, best_name: str) -> None:
        path = Path(self.config.model_folder) / "trained_model.pkl"
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump({
                "classifier": self.classifier,
                "scaler": self.scaler,
                "results": self.results,
                "classes": self.classes_,
                "best_name": best_name,
            }, f)

    def load_model(self, path: Optional[str] = None) -> None:
        p = path or str(Path(self.config.model_folder) / "trained_model.pkl")
        with open(p, "rb") as f:
            blob = pickle.load(f)
        self.classifier = blob["classifier"]
        self.scaler = blob["scaler"]
        self.results = blob.get("results", {})
        self.classes_ = blob.get("classes", [])

    def predict(self, image_path: str) -> Tuple[str, Dict[str, float]]:
        """main.py:398-434: label + per-class probabilities for one image."""
        if self.classifier is None:
            raise RuntimeError("no classifier; train or load one first")
        img = uio.imread_unit(image_path)
        if img is None:
            raise ValueError(f"unreadable image: {image_path}")
        feats = np.asarray(extract_all_features(jnp.asarray(img)))[None]
        scaled = self.scaler.transform(feats)
        label = str(self.classifier.predict(scaled)[0])
        probs = {}
        if hasattr(self.classifier, "predict_proba"):
            pr = self.classifier.predict_proba(scaled)[0]
            probs = {str(c): float(p) for c, p in zip(self.classifier.classes_, pr)}
        return label, probs

    # ---------------- Reports (main.py:337-396) ----------------

    def classification_report(self) -> str:
        """Text report + confusion matrix on the held-out split
        (main.py:337-374)."""
        from sklearn.metrics import classification_report as cr
        from sklearn.metrics import confusion_matrix
        from sklearn.model_selection import train_test_split

        X = np.stack([d.features for d in self.dataset])
        y = np.array([d.best_strategy for d in self.dataset])
        counts = {c: int((y == c).sum()) for c in set(y)}
        strat = y if min(counts.values()) >= 2 else None
        _, X_te, _, y_te = train_test_split(
            X, y, test_size=self.config.test_size,
            random_state=self.config.random_seed, stratify=strat,
        )
        pred = self.classifier.predict(self.scaler.transform(X_te))
        rep = cr(y_te, pred, zero_division=0)
        cm = confusion_matrix(y_te, pred, labels=self.classes_)
        lines = [rep, "", "confusion matrix (rows=true, cols=pred):",
                 "  " + " ".join(f"{c[:10]:>12}" for c in self.classes_)]
        for c, row in zip(self.classes_, cm):
            lines.append(f"{c[:12]:>12} " + " ".join(f"{v:>12}" for v in row))
        text = "\n".join(lines)
        path = Path(self.config.report_folder) / "classification_report.txt"
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(text)
        self._confusion_png(cm)
        return text

    def _confusion_png(self, cm: np.ndarray) -> None:
        """Confusion-matrix heatmap PNG (main.py:376-396, matplotlib in
        place of seaborn)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:  # pragma: no cover
            return
        fig, ax = plt.subplots(figsize=(6, 5))
        im = ax.imshow(cm, cmap="Blues")
        ax.set_xticks(range(len(self.classes_)))
        ax.set_yticks(range(len(self.classes_)))
        ax.set_xticklabels(self.classes_, rotation=45, ha="right", fontsize=7)
        ax.set_yticklabels(self.classes_, fontsize=7)
        for i in range(cm.shape[0]):
            for j in range(cm.shape[1]):
                ax.text(j, i, str(cm[i, j]), ha="center", va="center",
                        fontsize=8)
        ax.set_xlabel("predicted")
        ax.set_ylabel("true")
        fig.colorbar(im)
        fig.tight_layout()
        fig.savefig(Path(self.config.report_folder) / "confusion_matrix.png",
                    dpi=150)
        plt.close(fig)
