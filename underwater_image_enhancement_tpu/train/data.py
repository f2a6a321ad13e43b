"""Host-side input pipeline: paired image datasets -> device batches.

Reproduces the reference datasets' semantics on a TPU-friendly layout:

- ImprovedEnhancementDataset (vgg_16_UIE.py:306-421): paired raw/reference
  images matched by filename, resized to target_size, paired random H/V
  flips, 18-dim basic features (the full 79-dim path is also available).
- EnhancementDataset (deep_learning_parameters.py:199-246): 256 resize,
  full 79-dim features.

Differences by design: decode happens on host (cv2 with a PIL fallback),
features are computed on device in one batched jit (the reference computed
79-dim features per item inside __getitem__ — the actual bottleneck of that
trainer, SURVEY.md 3.5), and batches are prefetched to device ahead of use.
"""

from __future__ import annotations

import threading
import queue as queue_mod
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np

try:
    import cv2

    def _imread_rgb(path: str) -> Optional[np.ndarray]:
        img = cv2.imread(path)
        if img is None:
            return None
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def _resize(img: np.ndarray, size: int) -> np.ndarray:
        return cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)

except ImportError:  # pragma: no cover - cv2 is present in CI
    from PIL import Image

    def _imread_rgb(path: str) -> Optional[np.ndarray]:
        try:
            return np.asarray(Image.open(path).convert("RGB"))
        except Exception:
            return None

    def _resize(img: np.ndarray, size: int) -> np.ndarray:
        from PIL import Image

        return np.asarray(Image.fromarray(img).resize((size, size), Image.BILINEAR))


IMAGE_EXTS = (".jpg", ".jpeg", ".png")


class PairedImageDataset:
    """Paired raw/reference folders matched by filename.

    Missing references fall back to the raw image (vgg_16_UIE.py:396-400)."""

    def __init__(self, image_folder: str, reference_folder: str,
                 target_size: int = 224, augment: bool = True,
                 seed: int = 0):
        self.image_paths: List[Path] = sorted(
            p for p in Path(image_folder).iterdir()
            if p.suffix.lower() in IMAGE_EXTS
        )
        if not self.image_paths:
            raise ValueError(f"No images found in {image_folder}")
        self.reference_folder = Path(reference_folder)
        self.target_size = target_size
        self.augment = augment
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.image_paths)

    def load_pair(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        p = self.image_paths[idx]
        img = _imread_rgb(str(p))
        if img is None:
            raise ValueError(f"Failed to load image: {p}")
        img = _resize(img, self.target_size).astype(np.float32) / 255.0
        ref_path = self.reference_folder / p.name
        ref = _imread_rgb(str(ref_path)) if ref_path.exists() else None
        if ref is None:
            ref = (img * 255).astype(np.uint8)
        ref = _resize(ref, self.target_size).astype(np.float32) / 255.0
        if self.augment:
            if self.rng.random() > 0.5:
                img, ref = img[:, ::-1].copy(), ref[:, ::-1].copy()
            if self.rng.random() > 0.5:
                img, ref = img[::-1].copy(), ref[::-1].copy()
        return img, ref

    def split(self, train_frac: float, seed: int = 42) -> Tuple[np.ndarray, np.ndarray]:
        """Deterministic index split (reference: random_split seeded 42)."""
        n = len(self)
        perm = np.random.default_rng(seed).permutation(n)
        k = int(train_frac * n)
        return perm[:k], perm[k:]

    def batches(self, indices: np.ndarray, batch_size: int,
                shuffle: bool = True, drop_remainder: bool = True,
                seed: int = 0, process_index: int | None = None,
                process_count: int | None = None,
                with_indices: bool = False,
                ) -> Iterator[Tuple[np.ndarray, ...]]:
        """Yield (imgs, refs) batches of `batch_size` — or
        (indices, imgs, refs) with ``with_indices=True`` (the dataset-index
        form consumed by MLPTrainer's per-index feature cache).

        Multi-host sharding (grain-style sharded file lists): every process
        runs the SAME seed-synchronized shuffle, then takes every
        `process_count`-th batch starting at `process_index` — disjoint IO
        per host, global effective batch = process_count * batch_size, and
        epoch boundaries stay aligned across hosts (each process yields
        floor(n_batches / process_count) batches).  Defaults pick up
        `jax.process_index()/process_count()` when multi-process JAX is
        initialized; single-process behavior is unchanged.
        """
        if process_index is None or process_count is None:
            import jax

            process_count = jax.process_count()
            process_index = jax.process_index()
        order = np.array(indices)
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        stop = len(order) - (len(order) % batch_size) if drop_remainder else len(order)
        if process_count > 1:
            # multi-host: always exclude the short remainder batch — a
            # lone host yielding a smaller batch than its lockstep peers
            # would shape-mismatch the data-parallel step
            stop = len(order) - (len(order) % batch_size)
        starts = list(range(0, stop, batch_size))
        if process_count > 1:
            # equal batch counts per process keep hosts lockstep
            per = len(starts) // process_count
            starts = starts[process_index::process_count][:per]
        for i in starts:
            chunk = order[i:i + batch_size]
            if len(chunk) < batch_size and drop_remainder:
                break
            pairs = [self.load_pair(int(j)) for j in chunk]
            imgs = np.stack([p[0] for p in pairs])
            refs = np.stack([p[1] for p in pairs])
            if with_indices:
                yield chunk.astype(np.int64), imgs, refs
            else:
                yield imgs, refs


def prefetch_to_device(iterator, size: int = 2):
    """Host->device double buffering: decode thread keeps `size` batches in
    flight so H2D transfer overlaps compute (SURVEY.md §7 throughput plan)."""
    import jax

    q: queue_mod.Queue = queue_mod.Queue(maxsize=size)
    _SENTINEL = object()

    def producer():
        try:
            for item in iterator:
                q.put(jax.tree.map(jax.device_put, item))
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _SENTINEL:
            return
        yield item
