"""Framework configuration — dataclass-based with CLI overrides.

Mirrors the reference's static ``Config`` class (config.py:8-168: STRATEGIES,
QUALITY_WEIGHTS, CLASSIFIERS, paths, create_folders, validate) but as a
frozen-default dataclass that can be overridden per run (the reference had no
override mechanism, SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Any, Dict, List, Optional


# Strategy parameter sets, config.py:28-75 (the 5 "config flavor" strategies).
DEFAULT_STRATEGIES: Dict[str, Dict[str, Any]] = {
    "strong_dehazing": {
        "name": "StrongDehazing",
        "omega": 0.5,
        "guided_radius": 15,
        "L_low": 10,
        "L_high": 95,
        "gamma": 1.2,
        "apply_gamma": True,
    },
    "medium_dehazing": {
        "name": "MediumDehazing",
        "omega": 0.6,
        "guided_radius": 20,
        "L_low": 15,
        "L_high": 92,
        "apply_gamma": True,
    },
    "light_enhancement": {
        "name": "LightEnhancement",
        "omega": 0.4,
        "guided_radius": 10,
        "L_low": 15,
        "L_high": 95,
        "apply_gamma": False,
    },
    "clahe_enhancement": {
        "name": "CLAHEEnhancement",
        "clip_limit": 2.0,
        "tile_grid_size": (8, 8),
        "apply_gamma": False,
    },
    "histogram_equalization": {
        "name": "HistogramEqualization",
        "L_low": 10,
        "L_high": 95,
    },
}

# Quality metric weights, config.py:78-85.  NOTE: only 6 of the 8 metrics are
# weighted — colorfulness/naturalness get 0 via weights.get(key, 0)
# (quality_assessment.py:284); reproduced as-is.
DEFAULT_QUALITY_WEIGHTS: Dict[str, float] = {
    "contrast": 0.25,
    "sharpness": 0.20,
    "entropy": 0.15,
    "saturation": 0.15,
    "brightness": 0.15,
    "edge_density": 0.10,
}

# 8-metric default weights used when none are passed,
# quality_assessment.py:229-238.
FULL_QUALITY_WEIGHTS: Dict[str, float] = {
    "contrast": 0.20,
    "sharpness": 0.20,
    "entropy": 0.15,
    "saturation": 0.15,
    "brightness": 0.10,
    "edge_density": 0.10,
    "colorfulness": 0.05,
    "naturalness": 0.05,
}

# Classifier hyperparameters, config.py:100-119.
DEFAULT_CLASSIFIERS: Dict[str, Dict[str, Any]] = {
    "random_forest": {
        "n_estimators": 200,
        "max_depth": 20,
        "min_samples_split": 5,
        "random_state": 42,
    },
    "gradient_boosting": {
        "n_estimators": 100,
        "learning_rate": 0.1,
        "max_depth": 5,
        "random_state": 42,
    },
    "svm": {"kernel": "rbf", "C": 1.0, "gamma": "scale", "random_state": 42},
}

SUPPORTED_FORMATS: List[str] = [".jpg", ".jpeg", ".png", ".tif", ".tiff", ".bmp"]


@dataclasses.dataclass
class Config:
    """Run configuration.  Field defaults reproduce config.py values."""

    image_folder: str = "./data/raw"
    output_folder: str = "./results/self_supervised_v1"
    test_size: float = 0.2          # config.py:95
    random_seed: int = 42           # config.py:96
    cv_folds: int = 5               # config.py:97
    save_all_enhanced: bool = False  # config.py:123
    # config.py:89-92 — declared by the reference but never read there;
    # carried for config-surface parity
    use_deep_features: bool = False
    deep_feature_model: str = "vgg16"
    show_progress: bool = True       # config.py:126
    log_level: str = "INFO"
    strategies: Dict[str, Dict[str, Any]] = dataclasses.field(
        default_factory=lambda: {k: dict(v) for k, v in DEFAULT_STRATEGIES.items()}
    )
    quality_weights: Dict[str, float] = dataclasses.field(
        default_factory=lambda: dict(DEFAULT_QUALITY_WEIGHTS)
    )
    classifiers: Dict[str, Dict[str, Any]] = dataclasses.field(
        default_factory=lambda: {k: dict(v) for k, v in DEFAULT_CLASSIFIERS.items()}
    )
    # TPU-specific knobs (new capability)
    batch_size: int = 8
    dtype: str = "float32"
    data_parallel: bool = True
    # device count for Phase-1 data parallelism (None = all visible; 1
    # pins single-device dispatch — used by tests to compare outputs)
    n_devices: Optional[int] = None
    # Phase-1 throughput tier: label with STRATEGY_FNS_FAST (canonical
    # airlight descent, fast guided filter, histogram percentiles) —
    # near-tie winners may occasionally flip vs the exact parity tier
    fast_label: bool = False

    @property
    def feature_folder(self) -> str:
        return os.path.join(self.output_folder, "features")

    @property
    def strategy_folder(self) -> str:
        return os.path.join(self.output_folder, "strategy_results")

    @property
    def model_folder(self) -> str:
        return os.path.join(self.output_folder, "trained_models")

    @property
    def report_folder(self) -> str:
        return os.path.join(self.output_folder, "reports")

    def create_folders(self) -> None:
        """config.py:131-147."""
        for folder in (
            self.output_folder,
            self.feature_folder,
            self.strategy_folder,
            self.model_folder,
            self.report_folder,
        ):
            Path(folder).mkdir(parents=True, exist_ok=True)

    def validate(self) -> bool:
        """config.py:149-168: input folder exists and contains images."""
        if not os.path.exists(self.image_folder):
            return False
        files: List[Path] = []
        for fmt in SUPPORTED_FORMATS:
            files.extend(Path(self.image_folder).glob(f"*{fmt}"))
        return len(files) > 0

    def override(self, **kwargs) -> "Config":
        """Return a copy with the given fields replaced (CLI override hook)."""
        return dataclasses.replace(self, **kwargs)
