"""Procedural underwater-imagery fixture.

The reference validates on UIEB (config.py:13 — raw-890/reference-890),
which is not present in this environment, so every parity gate elsewhere in
tests/ runs on random frames.  This module generates SEEDED, statistically
underwater-like scenes in pure numpy so the Phase-1 winner distributions,
cast detection, UIQM/UCIQE, and the full Phase1→Phase2→predict flow can be
exercised on something that actually resembles the target imagery:

- a textured seabed scene (multi-octave value noise: sand/rock albedo with a
  brightness gradient toward the top, like downwelling light),
- a smooth depth field (scene distance, meters) increasing toward the top of
  the frame (camera pitched forward),
- Koschmieder image formation  I_c = J_c * t_c + A_c * (1 - t_c)  with
  per-channel attenuation  t_c = exp(-beta_c * d):  red is absorbed fastest
  in water, so distant regions drift toward the blue/green veiling light A,
- three water types whose (beta, A) produce the reference's cast classes
  (six_stadigy.py:292-302 mean-RGB heuristic): 'blue' and 'green' casts plus
  a shallow 'clear' water that stays 'normal',
- mild sensor noise and u8 quantization (every real decoded image lives on
  the u8 grid, which several exact-parity paths key on).

Nothing here is derived from UIEB or the reference implementation — it is a
physically-motivated synthetic stand-in, documented in docs/PARITY.md
("Real-imagery proxy validation").
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# per-meter attenuation (R, G, B) and veiling light per water type.
# Red attenuates fastest in all of them (open-water optics); the green type
# has a secondary blue absorption band (coastal/algae-rich water).
WATER_TYPES: Dict[str, Dict[str, Tuple[float, float, float]]] = {
    "blue": {"beta": (0.85, 0.35, 0.14), "A": (0.10, 0.34, 0.58)},
    "green": {"beta": (0.75, 0.22, 0.50), "A": (0.14, 0.52, 0.28)},
    "clear": {"beta": (0.22, 0.16, 0.13), "A": (0.42, 0.46, 0.50)},
}


def _value_noise(rng: np.random.Generator, h: int, w: int,
                 octaves=(3, 6, 12, 24), amp_decay: float = 0.55
                 ) -> np.ndarray:
    """Multi-octave bilinear value noise in [0, 1], (h, w) float32."""
    field = np.zeros((h, w), np.float32)
    amp, total = 1.0, 0.0
    for g in octaves:
        grid = rng.random((g + 1, g + 1)).astype(np.float32)
        ys = np.linspace(0.0, g, h, endpoint=False)
        xs = np.linspace(0.0, g, w, endpoint=False)
        y0 = np.floor(ys).astype(np.int64)
        x0 = np.floor(xs).astype(np.int64)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        a = grid[y0][:, x0]
        b = grid[y0][:, x0 + 1]
        c = grid[y0 + 1][:, x0]
        d = grid[y0 + 1][:, x0 + 1]
        field += amp * (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
                        + c * fy * (1 - fx) + d * fy * fx)
        total += amp
        amp *= amp_decay
    field /= total
    lo, hi = float(field.min()), float(field.max())
    return (field - lo) / max(hi - lo, 1e-8)


def _scene_albedo(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Clean scene radiance J (h, w, 3): sandy seabed with rock patches and
    a downwelling-light gradient (brighter toward the image bottom, which is
    nearer/shallower for a forward-pitched camera)."""
    base = _value_noise(rng, h, w)
    rock = _value_noise(rng, h, w, octaves=(4, 8, 16))
    rock_mask = (rock > 0.62).astype(np.float32)
    # sand: warm bright albedo; rock: darker, slightly green-gray
    sand = np.stack([0.55 + 0.25 * base, 0.50 + 0.24 * base,
                     0.42 + 0.20 * base], axis=-1)
    rocks = np.stack([0.20 + 0.15 * rock, 0.22 + 0.16 * rock,
                      0.20 + 0.13 * rock], axis=-1)
    m = rock_mask[..., None]
    J = rocks * m + sand * (1.0 - m)
    light = (0.75 + 0.35 * np.linspace(0.0, 1.0, h,
                                       dtype=np.float32))[:, None, None]
    return np.clip(J * light, 0.0, 1.0)


def _depth_field(rng: np.random.Generator, h: int, w: int,
                 near: float, far: float) -> np.ndarray:
    """Scene distance (meters), (h, w): smooth noise plus a strong vertical
    ramp (top of frame = far water column)."""
    ramp = np.linspace(1.0, 0.0, h, dtype=np.float32)[:, None]
    bumps = _value_noise(rng, h, w, octaves=(2, 4, 8))
    d01 = np.clip(0.75 * ramp + 0.25 * bumps, 0.0, 1.0)
    return near + (far - near) * d01


def synth_underwater_pair(rng: np.random.Generator, h: int, w: int,
                          water: str) -> Tuple[np.ndarray, np.ndarray]:
    """(degraded, clean) pair: the Koschmieder-degraded frame and the clean
    scene albedo it was rendered from — the fixture's stand-in for a UIEB
    raw/reference pair (vgg_16_UIE.py:306-421's dataset contract).  Both
    (h, w, 3) float32 in [0,1] on the u8 grid."""
    spec = WATER_TYPES[water]
    J = _scene_albedo(rng, h, w)
    near, far = (0.4, 3.0) if water == "clear" else (0.8, 8.0)
    d = _depth_field(rng, h, w, near, far)[..., None]
    beta = np.asarray(spec["beta"], np.float32)
    A = np.asarray(spec["A"], np.float32)
    t = np.exp(-beta * d)  # (h, w, 3) per-channel transmission
    img = J * t + A * (1.0 - t)
    img = img + rng.normal(0.0, 0.004, img.shape).astype(np.float32)

    def q(x):
        return np.floor(np.clip(x, 0.0, 1.0) * 255.0).astype(np.float32) / 255.0

    return q(img), q(J)


def synth_underwater_frame(rng: np.random.Generator, h: int, w: int,
                           water: str) -> np.ndarray:
    """One (h, w, 3) float32 frame in [0,1] on the u8 grid."""
    return synth_underwater_pair(rng, h, w, water)[0]


def synth_underwater_set(seed: int = 0, n: int = 8, h: int = 96,
                         w: int = 128) -> Tuple[np.ndarray, List[str]]:
    """(frames (n, h, w, 3), water-type names): a deterministic mixed set
    cycling blue/green/clear (≈ bluish/greenish/normal cast classes)."""
    rng = np.random.default_rng(seed)
    order = ["blue", "green", "clear"]
    names = [order[i % len(order)] for i in range(n)]
    frames = np.stack([synth_underwater_frame(rng, h, w, t) for t in names])
    return frames, names


def synth_underwater_pair_set(seed: int = 0, n: int = 8, h: int = 96,
                              w: int = 128):
    """(degraded (n,h,w,3), clean (n,h,w,3), names): paired raw/reference
    sets for trainer convergence proofs (VERDICT r4 #8)."""
    rng = np.random.default_rng(seed)
    order = ["blue", "green", "clear"]
    names = [order[i % len(order)] for i in range(n)]
    pairs = [synth_underwater_pair(rng, h, w, t) for t in names]
    return (np.stack([p[0] for p in pairs]),
            np.stack([p[1] for p in pairs]), names)
