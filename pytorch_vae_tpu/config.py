"""YAML config system.

Reproduces the reference's 4-section config layout (model_params /
data_params / exp_params / trainer_params, plus logging_params) with
environment-variable expansion and epoch-indexed piecewise-linear schedules.

Reference parity:
  - env expansion:   experiment.py:509-518 (os.path.expandvars over the tree)
  - schedule interp: experiment.py:14-34 (value of first knot for
    epoch <= knot0, linear between knots, last value after the final knot)
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import yaml

Schedule = List[List[float]]  # [[epoch, value], ...]


def expand_env(obj: Any) -> Any:
    """Recursively expand $VARS in every string of a config tree."""
    if isinstance(obj, str):
        return os.path.expandvars(obj)
    if isinstance(obj, dict):
        return {k: expand_env(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [expand_env(v) for v in obj]
    return obj


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        cfg = yaml.safe_load(f)
    return expand_env(cfg)


def interpolate_schedule(
    schedules: Dict[str, Schedule], epoch: int
) -> Dict[str, float]:
    """Piecewise-linear epoch schedules (semantics match experiment.py:14-34).

    For each key: if epoch <= first knot's epoch, use the first value; between
    knots, linear interpolation; after the last knot, the last value.
    """
    out: Dict[str, float] = {}
    if not schedules:
        return out
    for key, pairs in schedules.items():
        if not pairs:
            continue
        val = float(pairs[0][1])
        if epoch <= pairs[0][0]:
            out[key] = val
            continue
        for i in range(1, len(pairs)):
            s0, v0 = pairs[i - 1]
            s1, v1 = pairs[i]
            if s0 <= epoch < s1:
                a = (epoch - s0) / max(1e-8, (s1 - s0))
                val = float(v0 + a * (v1 - v0))
                break
            val = float(v1)
        out[key] = val
    return out


def resolve_path(base_dir: str, p: str) -> str:
    """Join relative paths onto a base directory (experiment.py:37-38)."""
    return p if os.path.isabs(p) else os.path.join(base_dir, p)


def normalize_path(p: Optional[str]) -> Optional[str]:
    """Empty / whitespace-only strings mean 'unset' (experiment.py:41-46)."""
    if p is None:
        return None
    if isinstance(p, str) and p.strip() == "":
        return None
    return p


# Default loss-weight keys driven by exp_params + schedules
# (reference: experiment.py:82-105).
DEFAULT_WEIGHT_KEYS: Dict[str, float] = {
    "ss_weight": 1.0,
    "bond_length_weight": 0.0,
    "bond_angle_weight": 0.0,
    "bond_min_hinge_weight": 0.0,
    "bond_band_max_weight": 0.0,
    "xyz_tv_lambda": 0.0,
    "dir_weight": 0.0,
    "dih_weight": 0.0,
    "rmsd_weight": 1.0,
    "label_smoothing": 0.0,
    "usage_entropy_lambda": 0.0,
    "beta": 0.25,
    "pdm_weight": 0.0,
    "win_kabsch_weight": 0.0,
    "kappa_weight": 0.0,
    "tau_weight": 0.0,
    "lr_pdm_weight": 0.0,
    "repulsion_weight": 0.0,
    "mix_geom_weight": 0.0,
    "pdm_window": 8,
    "win_kabsch_size": 16,
    "win_kabsch_stride": 8,
    "lr_min_sep": 24,
    "lr_stride": 8,
    "lr_max_offsets": 8,
    "xyz_align_alpha": 0.7,
    "ss_tv_lambda": 0.0,
}

# Keys that are structural (window sizes / strides): changing them changes
# static shapes inside the jitted loss, so they are rounded to ints and
# treated as compile-time constants (experiment.py:317-318).
STATIC_WEIGHT_KEYS = (
    "pdm_window",
    "win_kabsch_size",
    "win_kabsch_stride",
    "lr_min_sep",
    "lr_stride",
    "lr_max_offsets",
)


def initial_weights(model_params: dict, exp_params: dict) -> Dict[str, float]:
    """Initial loss-weight dict from config (experiment.py:82-105)."""
    w = dict(DEFAULT_WEIGHT_KEYS)
    for k in w:
        if k in exp_params:
            w[k] = float(exp_params[k])
    # These come from model_params in the reference
    for k in ("label_smoothing", "usage_entropy_lambda", "beta",
              "xyz_align_alpha", "ss_tv_lambda"):
        if k in model_params:
            w[k] = float(model_params[k])
    return w


def weights_for_epoch(
    base: Dict[str, float], schedules: Dict[str, Schedule], epoch: int
) -> Dict[str, float]:
    """Apply epoch schedules on top of base weights; round static keys."""
    w = dict(base)
    for k, v in interpolate_schedule(schedules or {}, epoch).items():
        if k in w:
            w[k] = float(v)
    for k in STATIC_WEIGHT_KEYS:
        w[k] = int(round(float(w.get(k, 0))))
    return w


def schedule_max(schedules: Dict[str, Schedule], key: str,
                 default: float) -> float:
    """Max value a scheduled scalar ever takes (for static term gating)."""
    pairs = (schedules or {}).get(key)
    if not pairs:
        return default
    return max(float(v) for _, v in pairs)


def term_ever_active(base: Dict[str, float], schedules: Dict[str, Schedule],
                     key: str) -> bool:
    """True if a loss term's weight is ever nonzero across all epochs.

    Used to *statically* disable loss terms whose weight is identically zero,
    mirroring the reference's `if weight > 0` guards (models/vq_vae.py:1325-
    1330) without data-dependent control flow under jit.
    """
    if abs(float(base.get(key, 0.0))) > 0.0:
        return True
    pairs = (schedules or {}).get(key)
    if not pairs:
        return False
    return any(abs(float(v)) > 0.0 for _, v in pairs)
