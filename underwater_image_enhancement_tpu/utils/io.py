"""Host-side image IO: decode/encode stay on CPU (SURVEY.md §2.9).

Reproduces the reference's load conventions (main.py:91-113): BGR->RGB,
grayscale->RGB, RGBA->RGB, float32 [0,1]; unreadable files return None so
callers can skip them (fault tolerance, SURVEY.md §5)."""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import numpy as np

from underwater_image_enhancement_tpu.utils.config import SUPPORTED_FORMATS

try:
    import cv2

    _HAVE_CV2 = True
except ImportError:  # pragma: no cover
    from PIL import Image

    _HAVE_CV2 = False


def imread_unit(path: str) -> Optional[np.ndarray]:
    """Read an image as float32 RGB in [0,1]; None if unreadable."""
    if _HAVE_CV2:
        img = cv2.imread(str(path), cv2.IMREAD_UNCHANGED)
        if img is None:
            return None
        if img.ndim == 2:
            img = cv2.cvtColor(img, cv2.COLOR_GRAY2RGB)
        elif img.shape[2] == 4:
            img = cv2.cvtColor(img, cv2.COLOR_BGRA2RGB)
        else:
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    else:  # pragma: no cover
        try:
            img = np.asarray(Image.open(path).convert("RGB"))
        except Exception:
            return None
    return img.astype(np.float32) / 255.0


def imwrite_unit(path: str, img: np.ndarray) -> None:
    """Write a float [0,1] RGB image as PNG/JPG (reference: (img*255).u8)."""
    u8 = (np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    if _HAVE_CV2:
        cv2.imwrite(str(path), cv2.cvtColor(u8, cv2.COLOR_RGB2BGR))
    else:  # pragma: no cover
        Image.fromarray(u8).save(str(path))


def collect_images(folder: str, formats: Optional[List[str]] = None) -> List[Path]:
    """Glob by supported extension, case-insensitive (main.py:45-61,
    six_stadigy.py:360-364)."""
    fmts = formats or SUPPORTED_FORMATS
    out: List[Path] = []
    for p in sorted(Path(folder).iterdir()):
        if p.suffix.lower() in fmts:
            out.append(p)
    return out


class AsyncWriter:
    """Write-behind image encoder: PNG/JPG encode+write on a host thread
    pool so the device never waits for cv2.imwrite (which releases the GIL).

    The reference writes synchronously inside its per-image loop
    (six_stadigy.py:446-447, main.py:149-155) — at 1080p one PNG encode
    costs ~10x the whole six-strategy device program, so overlapping IO
    with compute is where the folder drivers' wall clock actually goes.

    In-flight submissions are bounded (default 16 frames) so host memory
    stays capped on large folders.  ``close()`` joins all writes and
    returns [(path, error_str)] for any that failed; callers patch their
    log rows before emitting the CSV."""

    def __init__(self, workers: int = 4, max_inflight: int = 16):
        import threading
        from concurrent.futures import ThreadPoolExecutor

        self._pool = ThreadPoolExecutor(max_workers=workers,
                                        thread_name_prefix="imwrite")
        self._slots = threading.Semaphore(max_inflight)
        self._lock = threading.Lock()
        self._errors: List[tuple] = []

    def write(self, path: str, img: np.ndarray) -> None:
        """Queue a float [0,1] RGB image for writing (blocks only when
        max_inflight writes are already queued)."""
        # u8 conversion happens on the worker; keep a reference to the
        # caller's array (device->host copies are already materialized)
        self._slots.acquire()

        def task():
            try:
                imwrite_unit(path, img)
            except Exception as e:  # noqa: BLE001 — reported via close()
                with self._lock:
                    self._errors.append((path, str(e)))
            finally:
                self._slots.release()

        self._pool.submit(task)

    def close(self) -> List[tuple]:
        """Join all pending writes; return [(path, error_str)] failures."""
        self._pool.shutdown(wait=True)
        return list(self._errors)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False


def decode_iter(files, log=print, min_size: int = 0):
    """Decode-ahead iterator: yields (path, float32 RGB [0,1]) in order
    while a background thread decodes the NEXT images (bounded queue of 8),
    overlapping host cv2.imdecode with device compute.  Unreadable files
    are logged and skipped (main.py:92-94 fault tolerance); images smaller
    than min_size on either side are logged and skipped too."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=8)
    _END = object()

    def producer():
        for path in files:
            img = imread_unit(str(path))
            q.put((path, img))
        q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        path, img = item
        if img is None:
            log(f"warning: unreadable {path.name}")
            continue
        if min_size and (img.shape[0] < min_size or img.shape[1] < min_size):
            log(f"warning: {path.name} too small, skipping")
            continue
        yield path, img
    t.join()
