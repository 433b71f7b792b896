"""Geometric / secondary-structure curve acceptance filter.

Re-implements the reference's filter semantics with vectorized numpy (the
reference's segment-clash check is an O(L^2 * S^2) Python double loop,
scripts/run_aeot_end2end.py:348-371 — here it's one broadcast distance
computation, ~100x faster at L=350).

Two threshold sets exist in the reference and BOTH are preserved
(SURVEY.md §2.3):
  - "end2end": the inlined copy the API actually uses
    (scripts/run_aeot_end2end.py:505-530, BOND_MIN_ALLOWED=1.4),
  - "standalone": prior/filter_curves.py (BOND_MIN_ALLOWED=2.2).

Rejection order matches the reference exactly: bad_shape, nan_inf,
too_short, too_long, bond_out, angle_out, point_collision,
segment_collision, ss_reject.
"""

from __future__ import annotations

import ctypes
import dataclasses
import os
import subprocess
from typing import Dict, List, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_native_lib = None
_native_tried = False


def _load_native():
    """Load (building on first use) the C++ filter kernels.

    The quadratic collision/clash checks run on the host while the TPU
    decodes the next batch; native/fastfilter.cpp makes them ~30x faster
    than the vectorized numpy forms at L=350. Falls back silently.
    """
    global _native_lib, _native_tried
    if _native_tried:
        return _native_lib
    _native_tried = True
    so = os.path.join(_NATIVE_DIR, "libfastfilter.so")
    try:
        if not os.path.exists(so):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        lib = ctypes.CDLL(so)
        lib.ff_point_collisions.restype = ctypes.c_int64
        lib.ff_point_collisions.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_float, ctypes.c_int64]
        lib.ff_segment_clashes.restype = ctypes.c_int64
        lib.ff_segment_clashes.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.c_float, ctypes.c_int64, ctypes.c_int64]
        _native_lib = lib
    except Exception:
        _native_lib = None
    return _native_lib


def _c_coords(coords: np.ndarray):
    c = np.ascontiguousarray(coords, np.float32)
    return c, c.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


@dataclasses.dataclass
class FilterParams:
    # length gates
    min_length: int = 32
    max_length: int = 0  # 0 = no cap
    # point collision
    min_pairwise_dist: float = 2.0
    neighbor_exclude: int = 2
    # bond length thresholds
    bond_min_allowed: float = 1.4
    bond_max_allowed: float = 7.5
    bond_good_min: float = 2.0
    bond_good_max: float = 7.2
    bond_frac_out_max: float = 0.90
    # bond angle thresholds (degrees)
    angle_min_allowed: float = 10.0
    angle_max_allowed: float = 180.0
    angle_good_min: float = 30.0
    angle_good_max: float = 180.0
    angle_frac_out_max: float = 0.90
    # segment clash
    seg_min_dist: float = 1.3
    seg_neighbor_exclude: int = 1
    seg_num_samples: int = 5
    # secondary structure / beta sheet
    beta_channel: int = 1
    min_beta_run: int = 0
    min_beta_total: int = 0
    min_beta_sheet_fraction: float = 0.0
    max_isolated_beta_strands: int = -1
    min_strand_len: int = 3
    sheet_min_dist: float = 4.0
    sheet_max_dist: float = 6.0


def end2end_params(**over) -> FilterParams:
    """Thresholds of the API-facing pipeline copy."""
    return dataclasses.replace(FilterParams(), **over)


def standalone_params(**over) -> FilterParams:
    """Thresholds of prior/filter_curves.py (stricter bond minimum)."""
    p = FilterParams(bond_min_allowed=2.2)
    return dataclasses.replace(p, **over)


# ---------------------------------------------------------------------
# statistics primitives (reference: run_aeot_end2end.py:271-443)
# ---------------------------------------------------------------------
def bond_length_stats(coords: np.ndarray, good_min: float = 2.0,
                      good_max: float = 7.2) -> Dict[str, float]:
    if coords.shape[0] < 2:
        return {"num": 0, "mean": 0.0, "std": 0.0, "min": 0.0, "max": 0.0,
                "frac_out": 0.0}
    d = np.linalg.norm(np.diff(coords, axis=0), axis=-1)
    return {
        "num": int(d.size), "mean": float(d.mean()), "std": float(d.std()),
        "min": float(d.min()), "max": float(d.max()),
        "frac_out": float(np.mean((d < good_min) | (d > good_max))),
    }


def bond_angle_stats(coords: np.ndarray, good_min_deg: float = 30.0,
                     good_max_deg: float = 180.0) -> Dict[str, float]:
    if coords.shape[0] < 3:
        return {"num": 0, "mean": 0.0, "std": 0.0, "min": 0.0, "max": 0.0,
                "frac_out": 0.0}
    v1 = coords[:-2] - coords[1:-1]
    v2 = coords[2:] - coords[1:-1]
    n1 = np.linalg.norm(v1, axis=-1)
    n2 = np.linalg.norm(v2, axis=-1)
    denom = n1 * n2
    ok = denom > 1e-6
    if not ok.any():
        return {"num": 0, "mean": 0.0, "std": 0.0, "min": 0.0, "max": 0.0,
                "frac_out": 0.0}
    cos = np.clip(np.einsum("ij,ij->i", v1[ok], v2[ok]) / denom[ok],
                  -1.0, 1.0)
    ang = np.degrees(np.arccos(cos))
    return {
        "num": int(ang.size), "mean": float(ang.mean()),
        "std": float(ang.std()), "min": float(ang.min()),
        "max": float(ang.max()),
        "frac_out": float(np.mean((ang < good_min_deg)
                                  | (ang > good_max_deg))),
    }


def radius_of_gyration(coords: np.ndarray) -> float:
    if coords.ndim != 2 or coords.shape[0] == 0:
        return 0.0
    diff = coords - coords.mean(axis=0)
    return float(np.sqrt(max(np.mean(np.sum(diff * diff, axis=-1)), 0.0)))


def self_collision_count(coords: np.ndarray, min_pairwise_dist: float,
                         neighbor_exclude: int) -> int:
    """Count of point pairs closer than the threshold, |i-j| > excl."""
    if coords.ndim != 2 or coords.shape[1] != 3:
        return 0
    L = coords.shape[0]
    if L <= neighbor_exclude + 1:
        return 0
    lib = _load_native()
    if lib is not None:
        c, ptr = _c_coords(coords)
        return int(lib.ff_point_collisions(
            ptr, L, float(min_pairwise_dist), int(neighbor_exclude)))
    d2 = np.sum(
        (coords[:, None, :] - coords[None, :, :]) ** 2, axis=-1)
    idx = np.arange(L)
    sep = np.abs(idx[:, None] - idx[None, :])
    hits = (sep > int(neighbor_exclude)) & (d2 < min_pairwise_dist**2)
    return int(hits.sum())


def segment_clash_count(coords: np.ndarray, min_seg_dist: float = 1.3,
                        neighbor_exclude_segments: int = 1,
                        num_samples: int = 5) -> int:
    """Clashing segment pairs via sampled points — fully vectorized.

    Counts ordered pairs (i, j), j > i + excl, whose sampled-point clouds
    come within min_seg_dist (reference semantics, vectorized: the [P, P]
    pair grid replaces the double loop).
    """
    if coords.ndim != 2 or coords.shape[1] != 3 or coords.shape[0] < 3:
        return 0
    lib = _load_native()
    if lib is not None:
        c, ptr = _c_coords(coords)
        return int(lib.ff_segment_clashes(
            ptr, coords.shape[0], float(min_seg_dist),
            int(neighbor_exclude_segments), int(num_samples)))
    n_seg = coords.shape[0] - 1
    t = np.linspace(0.0, 1.0, num_samples)[None, :, None]  # [1, S, 1]
    p0 = coords[:-1, None, :]
    p1 = coords[1:, None, :]
    pts = p0 + (p1 - p0) * t                               # [P, S, 3]
    # pairwise min distance between sampled clouds
    diff = pts[:, None, :, None, :] - pts[None, :, None, :, :]
    d2 = np.min(np.sum(diff * diff, axis=-1), axis=(2, 3))  # [P, P]
    ii = np.arange(n_seg)
    far = (ii[None, :] - ii[:, None]) > int(neighbor_exclude_segments)
    return int(np.sum(far & (d2 < min_seg_dist**2)))


def beta_stats(ss_one_hot: np.ndarray, beta_channel: int = 1,
               threshold: float = 0.5) -> Tuple[int, int]:
    """(total beta residues, longest consecutive run)."""
    if ss_one_hot.ndim != 2 or ss_one_hot.shape[1] <= beta_channel:
        return 0, 0
    beta = ss_one_hot[:, beta_channel] > threshold
    total = int(beta.sum())
    if total == 0:
        return 0, 0
    # longest run via edge detection
    padded = np.concatenate([[False], beta, [False]])
    edges = np.flatnonzero(np.diff(padded.astype(np.int8)))
    runs = edges[1::2] - edges[0::2]
    return total, int(runs.max()) if runs.size else 0


def _beta_runs(beta_mask: np.ndarray, min_strand_len: int
               ) -> List[Tuple[int, int]]:
    padded = np.concatenate([[False], beta_mask, [False]])
    edges = np.flatnonzero(np.diff(padded.astype(np.int8)))
    starts, ends = edges[0::2], edges[1::2] - 1
    return [(int(s), int(e)) for s, e in zip(starts, ends)
            if e - s + 1 >= min_strand_len]


def beta_strand_and_sheet_stats(
    coords: np.ndarray, ss_one_hot: np.ndarray, beta_channel: int = 1,
    threshold: float = 0.5, neighbor_exclude: int = 2,
    min_strand_len: int = 3, sheet_min_dist: float = 4.0,
    sheet_max_dist: float = 6.0,
) -> Dict[str, float]:
    """Strand runs (>= min_strand_len) and sheet partnering: a beta residue
    is 'in a sheet' if another beta residue sits 4.0-6.0 A away with
    sequence separation > neighbor_exclude (run_aeot_end2end.py:392-443).
    """
    empty = {"beta_total": 0, "beta_in_sheet": 0, "beta_sheet_fraction": 0.0,
             "n_strands_total": 0, "n_sheet_strands": 0,
             "n_isolated_strands": 0}
    L = ss_one_hot.shape[0]
    if ss_one_hot.ndim != 2 or ss_one_hot.shape[1] <= beta_channel or L == 0:
        return empty
    beta_mask = ss_one_hot[:, beta_channel] > threshold
    beta_total = int(beta_mask.sum())
    if beta_total == 0:
        return empty
    runs = _beta_runs(beta_mask, min_strand_len)
    out = dict(empty, beta_total=beta_total)
    if not runs:
        return out
    out["n_strands_total"] = len(runs)

    beta_idx = np.flatnonzero(beta_mask)
    bc = coords[beta_idx]
    dist = np.sqrt(np.sum((bc[:, None, :] - bc[None, :, :]) ** 2, axis=-1))
    sep = np.abs(beta_idx[:, None] - beta_idx[None, :])
    partner = ((dist >= sheet_min_dist) & (dist <= sheet_max_dist)
               & (sep > int(neighbor_exclude)))
    np.fill_diagonal(partner, False)
    has_partner = partner.any(axis=1)
    sheet_mask = np.zeros(L, bool)
    sheet_mask[beta_idx] = has_partner

    out["beta_in_sheet"] = int(sheet_mask.sum())
    out["beta_sheet_fraction"] = out["beta_in_sheet"] / beta_total
    for s, e in runs:
        if sheet_mask[s : e + 1].any():
            out["n_sheet_strands"] += 1
        else:
            out["n_isolated_strands"] += 1
    return out


# ---------------------------------------------------------------------
# full acceptance check
# ---------------------------------------------------------------------
REJECT_REASONS = ("too_short", "too_long", "bond_out", "angle_out",
                  "point_collision", "segment_collision", "ss_reject",
                  "bad_shape", "nan_inf", "other")


def curve_pass_filter(curve6: np.ndarray, params: FilterParams
                      ) -> Tuple[bool, Dict[str, object], str]:
    """(passed, stats, reject_reason); reason "" when accepted.

    (reference: curve_pass_filter, scripts/run_aeot_end2end.py:485-613)
    """
    p = params
    if curve6.ndim != 2 or curve6.shape[1] < 3:
        return False, {}, "bad_shape"
    if not np.isfinite(curve6[:, :3]).all():
        return False, {}, "nan_inf"
    L = int(curve6.shape[0])
    if L < p.min_length:
        return False, {}, "too_short"
    if p.max_length > 0 and L > p.max_length:
        return False, {}, "too_long"

    coords = curve6[:, :3].astype(np.float64)

    bl = bond_length_stats(coords, p.bond_good_min, p.bond_good_max)
    if bl["num"] > 0 and (bl["min"] < p.bond_min_allowed
                          or bl["max"] > p.bond_max_allowed
                          or bl["frac_out"] > p.bond_frac_out_max):
        return False, {}, "bond_out"

    ba = bond_angle_stats(coords, p.angle_good_min, p.angle_good_max)
    if ba["num"] > 0 and (ba["min"] < p.angle_min_allowed
                          or ba["max"] > p.angle_max_allowed
                          or ba["frac_out"] > p.angle_frac_out_max):
        return False, {}, "angle_out"

    n_collisions = self_collision_count(coords, p.min_pairwise_dist,
                                        p.neighbor_exclude)
    if n_collisions > 0:
        return False, {}, "point_collision"

    seg_clashes = segment_clash_count(coords, p.seg_min_dist,
                                      p.seg_neighbor_exclude,
                                      p.seg_num_samples)
    if seg_clashes > 0:
        return False, {}, "segment_collision"

    ss_reject = False
    beta_total = beta_max_run = beta_in_sheet = 0
    beta_sheet_fraction = 0.0
    n_strands_total = n_sheet_strands = n_isolated_strands = 0
    if curve6.shape[1] >= 6:
        ss_one_hot = curve6[:, 3:6]
        beta_total, beta_max_run = beta_stats(ss_one_hot, p.beta_channel)
        if p.min_beta_total > 0 and 0 < beta_total < p.min_beta_total:
            ss_reject = True
        if p.min_beta_run > 0 and beta_total > 0 \
                and beta_max_run < p.min_beta_run:
            ss_reject = True
        st = beta_strand_and_sheet_stats(
            coords, ss_one_hot, p.beta_channel, 0.5, p.neighbor_exclude,
            p.min_strand_len, p.sheet_min_dist, p.sheet_max_dist)
        beta_sheet_fraction = float(st["beta_sheet_fraction"])
        beta_in_sheet = int(st["beta_in_sheet"])
        n_strands_total = int(st["n_strands_total"])
        n_sheet_strands = int(st["n_sheet_strands"])
        n_isolated_strands = int(st["n_isolated_strands"])
        if p.min_beta_sheet_fraction > 0.0 and beta_total > 0 \
                and beta_sheet_fraction < p.min_beta_sheet_fraction:
            ss_reject = True
        if p.max_isolated_beta_strands >= 0 \
                and n_isolated_strands > p.max_isolated_beta_strands:
            ss_reject = True
    if ss_reject:
        return False, {}, "ss_reject"

    stats = {
        "length_recon": L,
        "rg": radius_of_gyration(coords),
        "bond_mean": bl["mean"], "bond_std": bl["std"],
        "bond_min": bl["min"], "bond_max": bl["max"],
        "bond_frac_out": bl["frac_out"],
        "angle_mean": ba["mean"], "angle_std": ba["std"],
        "angle_min": ba["min"], "angle_max": ba["max"],
        "angle_frac_out": ba["frac_out"],
        "beta_total": beta_total, "beta_max_run": beta_max_run,
        "beta_in_sheet": beta_in_sheet,
        "beta_sheet_fraction": beta_sheet_fraction,
        "beta_strands_total": n_strands_total,
        "beta_strands_sheet": n_sheet_strands,
        "beta_strands_isolated": n_isolated_strands,
        "n_self_clash_pairs": n_collisions,
        "n_seg_clash_pairs": seg_clashes,
    }
    return True, stats, ""
