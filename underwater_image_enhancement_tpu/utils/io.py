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
