"""Parity validation harness — ``cli validate`` (UIEB-readiness).

One command over an image folder generates the tables ``docs/PARITY.md``
hand-assembles, as JSON + markdown artifacts:

- per-strategy PSNR of the TPU programs vs the float64 golden CPU oracles
  (``testing/golden.py``) on a sample of the folder's images — both the
  5 config-flavor strategies (enhancement_strategies.py:349-508) and the
  6 six-flavor recipes (six_stadigy.py:230-285);
- UIQM / UCIQE before vs after Phase-1 winner enhancement over the whole
  folder (the eval the reference runs on UIEB, quality_assessment.py:
  215-286 + config.py:13);
- the Phase-1 winner distribution (main.py:198-218's report);
- optional: accuracy of a trained Phase-2 classifier against the Phase-1
  labels (main.py:225-335's test metric, recomputed on this folder).

When the real UIEB set is available, ``cli validate --input uieb/`` is
the one-liner; the test suite runs it on the procedural underwater
fixture (testing/underwater.py).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    return 99.0 if mse < 1e-12 else 10.0 * np.log10(1.0 / mse)


def _oracle_psnrs(imgs: List[np.ndarray], fast: bool) -> Dict[str, Dict]:
    """Per-strategy PSNR vs the float64 golden oracles on sample images."""
    import jax.numpy as jnp

    from underwater_image_enhancement_tpu.pipeline.six import (
        SIX_STRATEGIES,
        SIX_STRATEGIES_FAST,
    )
    from underwater_image_enhancement_tpu.pipeline.strategies import (
        STRATEGY_FNS,
        STRATEGY_FNS_FAST,
    )
    from underwater_image_enhancement_tpu.testing import golden

    cfg_fns = STRATEGY_FNS_FAST if fast else STRATEGY_FNS
    six_fns = SIX_STRATEGIES_FAST if fast else SIX_STRATEGIES

    out: Dict[str, Dict] = {"config": {}, "six": {}}
    for name, fn in cfg_fns.items():
        vals = [_psnr(np.asarray(fn(jnp.asarray(im)[None])[0]),
                      golden.strategy_config(im, name)) for im in imgs]
        out["config"][name] = {"psnr_db_min": round(min(vals), 1),
                               "psnr_db_mean": round(float(np.mean(vals)), 1)}
    for name, fn in six_fns.items():
        vals = [_psnr(np.asarray(fn(jnp.asarray(im))),
                      golden.strategy_six(im, name)) for im in imgs]
        out["six"][name] = {"psnr_db_min": round(min(vals), 1),
                            "psnr_db_mean": round(float(np.mean(vals)), 1)}
    return out


def validate_folder(input_folder: str, output_folder: str,
                    oracle_samples: int = 3, fast: bool = False,
                    model: Optional[str] = None, batch_size: int = 8,
                    log=print) -> Dict:
    """Run the full validation; writes validation_report.{json,md} into
    ``output_folder`` and returns the report dict."""
    import jax.numpy as jnp

    from underwater_image_enhancement_tpu.metrics.uiqm import (
        uciqe_batch,
        uiqm_batch,
    )
    from underwater_image_enhancement_tpu.select.system import (
        SelfSupervisedSystem,
        _LABEL_ORDER,
    )
    from underwater_image_enhancement_tpu.pipeline.strategies import (
        STRATEGY_DISPLAY,
    )
    from underwater_image_enhancement_tpu.utils import io as uio
    from underwater_image_enhancement_tpu.utils.config import Config

    files = uio.collect_images(input_folder)
    if not files:
        raise ValueError(f"no images found in {input_folder}")
    outdir = Path(output_folder)
    outdir.mkdir(parents=True, exist_ok=True)

    sys_ = SelfSupervisedSystem(Config(fast_label=fast))
    names = [STRATEGY_DISPLAY[k] for k in _LABEL_ORDER]

    # Phase-1 labeling + before/after quality over the whole folder,
    # streamed in same-shape batches (the build_dataset pattern)
    winners: Dict[str, int] = {}
    uiqm_raw, uiqm_enh, uciqe_raw, uciqe_enh = [], [], [], []
    feats_all: List[np.ndarray] = []
    labels_all: List[str] = []
    samples: List[np.ndarray] = []
    pending: Dict[tuple, List[np.ndarray]] = {}

    def flush(batch_list):
        batch = np.stack(batch_list)
        feats, scores, best, best_imgs = sys_._label_batch_np(
            batch, return_all=False)
        jb = jnp.asarray(batch)
        je = jnp.asarray(best_imgs)
        uiqm_raw.extend(np.asarray(uiqm_batch(jb)).tolist())
        uiqm_enh.extend(np.asarray(uiqm_batch(je)).tolist())
        uciqe_raw.extend(np.asarray(uciqe_batch(jb)).tolist())
        uciqe_enh.extend(np.asarray(uciqe_batch(je)).tolist())
        for j in range(len(batch_list)):
            lab = names[int(best[j])]
            winners[lab] = winners.get(lab, 0) + 1
            labels_all.append(lab)
            feats_all.append(feats[j])

    for _, img in uio.decode_iter(files, log=lambda m: log(f"  {m}")):
        if len(samples) < oracle_samples:
            samples.append(img)
        buf = pending.setdefault(img.shape, [])
        buf.append(img)
        if len(buf) == max(1, batch_size):
            flush(buf)
            buf.clear()
    for buf in pending.values():
        if buf:
            flush(buf)

    n = len(labels_all)
    log(f"labeled {n} images; running {len(samples)} float64 oracle samples")
    report: Dict = {
        "n_images": n,
        "label_tier": "fast" if fast else "exact",
        "oracle_psnr": _oracle_psnrs(samples, fast),
        "quality": {
            "uiqm_raw_mean": round(float(np.mean(uiqm_raw)), 3),
            "uiqm_enhanced_mean": round(float(np.mean(uiqm_enh)), 3),
            "uciqe_raw_mean": round(float(np.mean(uciqe_raw)), 3),
            "uciqe_enhanced_mean": round(float(np.mean(uciqe_enh)), 3),
        },
        "winner_distribution": {
            k: {"count": v, "fraction": round(v / n, 3)}
            for k, v in sorted(winners.items())
        },
    }

    if model:
        from sklearn.metrics import accuracy_score

        sys_.load_model(model)
        X = sys_.scaler.transform(np.stack(feats_all))
        pred = sys_.classifier.predict(X)
        report["classifier"] = {
            "model": str(model),
            "accuracy_vs_phase1": round(
                float(accuracy_score(labels_all, pred)), 3),
        }

    (outdir / "validation_report.json").write_text(
        json.dumps(report, indent=2))
    (outdir / "validation_report.md").write_text(_to_markdown(report))
    log(f"report -> {outdir / 'validation_report.json'}")
    return report


def _to_markdown(r: Dict) -> str:
    lines = [f"# Validation report ({r['n_images']} images, "
             f"{r['label_tier']} tier)", ""]
    lines += ["## Strategy parity vs float64 golden oracles", "",
              "| flavor | strategy | PSNR min (dB) | PSNR mean (dB) |",
              "|---|---|---|---|"]
    for flavor in ("config", "six"):
        for name, v in r["oracle_psnr"][flavor].items():
            lines.append(f"| {flavor} | {name} | {v['psnr_db_min']} "
                         f"| {v['psnr_db_mean']} |")
    q = r["quality"]
    lines += ["", "## Quality before/after Phase-1 winner", "",
              "| metric | raw | enhanced |", "|---|---|---|",
              f"| UIQM | {q['uiqm_raw_mean']} | {q['uiqm_enhanced_mean']} |",
              f"| UCIQE | {q['uciqe_raw_mean']} "
              f"| {q['uciqe_enhanced_mean']} |"]
    lines += ["", "## Phase-1 winner distribution", "",
              "| strategy | count | fraction |", "|---|---|---|"]
    for k, v in r["winner_distribution"].items():
        lines.append(f"| {k} | {v['count']} | {v['fraction']} |")
    if "classifier" in r:
        c = r["classifier"]
        lines += ["", f"Classifier `{c['model']}` accuracy vs Phase-1 "
                  f"labels: **{c['accuracy_vs_phase1']}**"]
    return "\n".join(lines) + "\n"
