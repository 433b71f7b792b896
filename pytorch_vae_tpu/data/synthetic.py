"""Synthetic protein-like curve corpus generator.

The reference trains on a private PDB-derived curve set (dataset.py reads
pre-extracted .npy dicts); no curve data ships with the repo or this image.
This generator fabricates a structurally honest stand-in so every stage of
the pipeline (stage-1 AE, stage-2 VQ, AE-OT generation, filtering) can be
trained and exercised end-to-end:

- C-alpha spacing ~3.8 Å (bond_length_stats good band 2.0-7.2,
  pipelines/filtering.py:80-84, is easily satisfiable by a good decoder),
- three secondary-structure classes with geometry that *matches* the label
  (ideal alpha-helix, extended beta-strand, smooth coil), so SS prediction
  is learnable and correlated with shape,
- segment-level composition with random rigid placement per segment, smooth
  joins, and small coordinate noise.

Files are written in the reference on-disk format: 0-d object .npy dicts
with "curve_coords" [L,3] f32 and "ss_one_hot" [L,3] f32, plus
train_list.txt / val_list.txt (dataset.py:57-90 semantics).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

__all__ = ["make_synthetic_curve_dir", "synthetic_curve"]

BOND = 3.8  # target C-alpha spacing, Å

# SS class order matches the reference one-hot convention: helix/sheet/coil
HELIX, SHEET, COIL = 0, 1, 2


def _unit(v: np.ndarray) -> np.ndarray:
    return v / (np.linalg.norm(v) + 1e-9)


def _random_rotation(rng: np.random.Generator) -> np.ndarray:
    """Uniform random 3x3 rotation (QR of a Gaussian, sign-fixed)."""
    m = rng.normal(size=(3, 3))
    q, r = np.linalg.qr(m)
    q *= np.sign(np.diag(r))
    if np.linalg.det(q) < 0:
        q[:, 0] = -q[:, 0]
    return q


def _helix(n: int) -> np.ndarray:
    """Ideal alpha-helix CA trace: r=2.3 Å, 100 deg/res, 1.5 Å rise.

    Consecutive-CA distance comes out ~3.8 Å, matching real helices.
    """
    t = np.arange(n) * np.deg2rad(100.0)
    return np.stack(
        [2.3 * np.cos(t), 2.3 * np.sin(t), 1.5 * np.arange(n)], axis=1)


def _strand(n: int, rng: np.random.Generator) -> np.ndarray:
    """Extended beta-strand: ~3.3 Å rise with alternating pleat."""
    z = 3.3 * np.arange(n, dtype=np.float64)
    pleat = 0.95 * ((np.arange(n) % 2) * 2 - 1)
    wobble = rng.normal(scale=0.08, size=(n, 2))
    return np.stack([pleat + wobble[:, 0], wobble[:, 1], z], axis=1)


def _coil(n: int, rng: np.random.Generator) -> np.ndarray:
    """Smooth random walk, fixed 3.8 Å steps, bounded turning rate."""
    pts = np.zeros((n, 3))
    d = _unit(rng.normal(size=3))
    for i in range(1, n):
        d = _unit(d + 0.55 * rng.normal(size=3))
        pts[i] = pts[i - 1] + BOND * d
    return pts


def synthetic_curve(
    rng: np.random.Generator, min_len: int = 60, max_len: int = 350
) -> Tuple[np.ndarray, np.ndarray]:
    """One curve -> (coords [L,3] f32 Å, ss_one_hot [L,3] f32)."""
    L = int(rng.integers(min_len, max_len + 1))
    coords = np.zeros((0, 3))
    labels = np.zeros((0,), np.int64)
    while coords.shape[0] < L:
        remaining = L - coords.shape[0]
        kind = int(rng.choice([HELIX, SHEET, COIL], p=[0.4, 0.25, 0.35]))
        if kind == HELIX:
            n = int(np.clip(rng.integers(6, 22), 2, remaining))
            seg = _helix(n)
        elif kind == SHEET:
            n = int(np.clip(rng.integers(4, 12), 2, remaining))
            seg = _strand(n, rng)
        else:
            n = int(np.clip(rng.integers(3, 14), 2, remaining))
            seg = _coil(n, rng)
        seg = seg @ _random_rotation(rng).T
        if coords.shape[0] == 0:
            coords = seg
        else:
            # join: place the segment one bond away from the current end,
            # continuing roughly along the current direction
            tail_dir = _unit(coords[-1] - coords[-2]) \
                if coords.shape[0] >= 2 else _unit(rng.normal(size=3))
            join_dir = _unit(tail_dir + 0.8 * rng.normal(size=3))
            seg = seg - seg[0] + coords[-1] + BOND * join_dir
            coords = np.concatenate([coords, seg], axis=0)
        labels = np.concatenate([labels, np.full(n, kind, np.int64)])
    coords = coords[:L] + rng.normal(scale=0.12, size=(L, 3))
    ss = np.eye(3, dtype=np.float32)[labels[:L]]
    return coords.astype(np.float32), ss


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
