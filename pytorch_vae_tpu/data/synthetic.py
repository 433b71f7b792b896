"""Synthetic protein-like curve corpus generator.

The reference trains on a private PDB-derived curve set (dataset.py reads
pre-extracted .npy dicts); no curve data ships with the repo or this image.
This generator fabricates a structurally honest stand-in so every stage of
the pipeline (stage-1 AE, stage-2 VQ, AE-OT generation, filtering) can be
trained and exercised end-to-end.

Geometry is built to *pass the generation filter with margin*
(pipelines/filtering.py FilterParams: non-neighbor pairs >= 2.0 Å, bonds
in [1.4, 7.5] Å, vertex angles >= 10°): like real proteins, chains have
excluded volume. Construction is incremental and self-avoiding — every
placed point must clear all earlier points (|i-j| > 2) by `clearance` Å,
with rotation/direction retries and whole-curve restarts on dead ends:

- C-alpha spacing ~3.8 Å,
- three secondary-structure classes whose geometry *matches* the label
  (ideal alpha-helix, extended beta-strand, smooth coil), so SS
  prediction is learnable and correlated with shape,
- segment-level composition with rigid random placement per segment and
  small coordinate noise.

Files are written in the reference on-disk format: 0-d object .npy dicts
with "curve_coords" [L,3] f32 and "ss_one_hot" [L,3] f32, plus
train_list.txt / val_list.txt (dataset.py:57-90 semantics).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

__all__ = ["make_synthetic_curve_dir", "synthetic_curve"]

BOND = 3.8  # target C-alpha spacing, Å

# SS class order matches the reference one-hot convention: helix/sheet/coil
HELIX, SHEET, COIL = 0, 1, 2


def _unit(v: np.ndarray) -> np.ndarray:
    return v / (np.linalg.norm(v) + 1e-9)


def _rotation_to(direction: np.ndarray, rng: np.random.Generator
                 ) -> np.ndarray:
    """Rotation taking +z to `direction`, with a random roll about it."""
    z = np.array([0.0, 0.0, 1.0])
    d = _unit(direction)
    v = np.cross(z, d)
    c = float(np.dot(z, d))
    if np.linalg.norm(v) < 1e-8:
        base = np.eye(3) if c > 0 else np.diag([1.0, -1.0, -1.0])
    else:
        vx = np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        base = np.eye(3) + vx + vx @ vx / (1.0 + c)
    phi = rng.uniform(0, 2 * np.pi)
    roll = np.array([[np.cos(phi), -np.sin(phi), 0],
                     [np.sin(phi), np.cos(phi), 0],
                     [0, 0, 1.0]])
    return base @ roll


def _helix(n: int) -> np.ndarray:
    """Ideal alpha-helix CA trace: r=2.3 Å, 100 deg/res, 1.5 Å rise (+z).

    Consecutive-CA distance comes out ~3.8 Å, matching real helices.
    """
    t = np.arange(n) * np.deg2rad(100.0)
    pts = np.stack(
        [2.3 * np.cos(t), 2.3 * np.sin(t), 1.5 * np.arange(n)], axis=1)
    return pts - pts[0]


def _strand(n: int, rng: np.random.Generator) -> np.ndarray:
    """Extended beta-strand along +z: ~3.3 Å rise, alternating pleat."""
    z = 3.3 * np.arange(n, dtype=np.float64)
    pleat = 0.95 * ((np.arange(n) % 2) * 2 - 1)
    wobble = rng.normal(scale=0.06, size=(n, 2))
    pts = np.stack([pleat + wobble[:, 0], wobble[:, 1], z], axis=1)
    return pts - pts[0]


def _clear(cand: np.ndarray, pts: np.ndarray, start_index: int,
           clearance: float) -> bool:
    """True if every candidate point keeps `clearance` from all existing
    points more than 2 indices away (FilterParams.neighbor_exclude=2)."""
    for k, p in enumerate(cand):
        idx = start_index + k
        prior = pts[: max(0, idx - 2)]
        if prior.size and np.min(
                np.linalg.norm(prior - p[None], axis=1)) < clearance:
            return False
    return True


def _try_build(rng: np.random.Generator, L: int, clearance: float
               ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    pts = np.zeros((1, 3))
    labels = [COIL]
    d = _unit(rng.normal(size=3))
    while pts.shape[0] < L:
        remaining = L - pts.shape[0]
        kind = int(rng.choice([HELIX, SHEET, COIL], p=[0.4, 0.25, 0.35]))
        if kind == COIL:
            # step-wise self-avoiding walk with bounded turning
            n = int(np.clip(rng.integers(3, 14), 1, remaining))
            placed = 0
            for _ in range(n):
                ok = False
                for _trial in range(24):
                    nd = _unit(d + 0.55 * rng.normal(size=3))
                    if float(np.dot(nd, d)) < -0.3:  # vertex angle >= ~72°
                        continue
                    cand = pts[-1] + BOND * nd
                    if _clear(cand[None], pts, pts.shape[0], clearance):
                        pts = np.concatenate([pts, cand[None]])
                        labels.append(COIL)
                        d = nd
                        ok = True
                        placed += 1
                        break
                if not ok:
                    break
            if placed == 0:
                return None  # dead end: restart the whole curve
            continue
        # rigid ideal segment (helix or strand), rotation retries
        if kind == HELIX:
            n = int(np.clip(rng.integers(6, 22), 2, remaining))
            seg = _helix(n)
        else:
            n = int(np.clip(rng.integers(4, 12), 2, remaining))
            seg = _strand(n, rng)
        attached = False
        for _trial in range(24):
            join_dir = _unit(d + 0.6 * rng.normal(size=3))
            if float(np.dot(join_dir, d)) < -0.3:
                continue
            R = _rotation_to(join_dir, rng)
            cand = seg @ R.T + pts[-1] + BOND * join_dir
            if _clear(cand, pts, pts.shape[0], clearance):
                pts = np.concatenate([pts, cand])
                labels.extend([kind] * n)
                d = _unit(pts[-1] - pts[-2])
                attached = True
                break
        if not attached:
            return None
    coords = pts[:L]
    ss = np.eye(3, dtype=np.float32)[np.asarray(labels[:L])]
    return coords, ss


def synthetic_curve(
    rng: np.random.Generator, min_len: int = 60, max_len: int = 350,
    clearance: float = 3.2,
) -> Tuple[np.ndarray, np.ndarray]:
    """One curve -> (coords [L,3] f32 Å, ss_one_hot [L,3] f32).

    Self-avoiding by construction; coordinate noise (0.1 Å) stays well
    inside the clearance margin over the filter's 2.0 Å pairwise gate.
    """
    L = int(rng.integers(min_len, max_len + 1))
    for _attempt in range(50):
        built = _try_build(rng, L, clearance)
        if built is not None:
            coords, ss = built
            coords = coords + rng.normal(scale=0.1, size=coords.shape)
            return coords.astype(np.float32), ss
    # unreachable in practice; a lone helix is always self-avoiding
    coords = _helix(L) + rng.normal(scale=0.1, size=(L, 3))
    return coords.astype(np.float32), np.tile(
        np.eye(3, dtype=np.float32)[HELIX], (L, 1))


def make_synthetic_curve_dir(
    out_dir: str,
    n_train: int,
    n_val: int,
    seed: int = 0,
    min_len: int = 60,
    max_len: int = 350,
) -> None:
    """Write a reference-format curve corpus + train/val list files."""
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    names = []
    for i in range(n_train + n_val):
        coords, ss = synthetic_curve(rng, min_len=min_len, max_len=max_len)
        name = f"curve_{i:05d}.npy"
        np.save(os.path.join(out_dir, name),
                {"curve_coords": coords, "ss_one_hot": ss},
                allow_pickle=True)
        names.append(name)
    with open(os.path.join(out_dir, "train_list.txt"), "w") as f:
        f.write("\n".join(names[:n_train]) + "\n")
    with open(os.path.join(out_dir, "val_list.txt"), "w") as f:
        f.write("\n".join(names[n_train:]) + "\n")
