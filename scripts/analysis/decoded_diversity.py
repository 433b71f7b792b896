#!/usr/bin/env python
"""Geometric diversity and novelty of kept generated curves.

The bank-growth line (BASELINE.md) measures diversity as UNIQUE OT
candidate pairs after the angular filter — a latent-space proxy. This
tool measures what users actually get: the spread of decoded geometry.
Each curve is arc-length-resampled to a fixed point count, centered,
and compared with Kabsch-aligned RMSD (numpy SVD, independent of the
jax ops under test):

  - diversity: mean pairwise aligned RMSD over a random subsample of
    kept curves, and the mean nearest-neighbor RMSD within the set
    (low NN-RMSD = many near-duplicates even if latent pairs differ)
  - novelty:  mean/min aligned RMSD from each generated curve to its
    nearest neighbor in a reference corpus (the training set) —
    distinguishes "diverse because novel" from "diverse because noisy"

No reference analog: upstream compared generation runs by eyeballing
renders (scripts/playground/). Usage:

  python scripts/analysis/decoded_diversity.py \
      --run_dir results/aeot_runs/r3_ft6_bankx \
      --ref_npy_dir data/synth_curves [--n 300] [--ref_n 500] \
      [--resample 64] [--seed 0] [--out stats.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def resample_polyline(coords: np.ndarray, k: int) -> np.ndarray:
    """Arc-length resample [L,3] -> [k,3] (linear along the polyline)."""
    seg = np.linalg.norm(np.diff(coords, axis=0), axis=-1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    total = s[-1]
    if total <= 0:
        return np.repeat(coords[:1], k, axis=0)
    t = np.linspace(0.0, total, k)
    out = np.empty((k, 3), np.float64)
    for d in range(3):
        out[:, d] = np.interp(t, s, coords[:, d])
    return out - out.mean(axis=0)


def aligned_rmsd_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise Kabsch-aligned RMSD between two stacks of centered
    [k,3] point sets: a [N,k,3] vs b [M,k,3] -> [N,M]."""
    # cross-covariance per pair: H = a_i^T b_j  -> batch via einsum
    H = np.einsum("nki,mkj->nmij", a, b)           # [N,M,3,3]
    U, S, Vt = np.linalg.svd(H)
    det = np.linalg.det(np.einsum("nmij,nmjk->nmik", U, Vt))
    S_corr = S.copy()
    S_corr[..., -1] *= np.sign(det)
    # rmsd^2 = (tr(a a^T) + tr(b b^T) - 2 * sum singular)/k
    na = np.einsum("nki,nki->n", a, a)             # [N]
    nb = np.einsum("mki,mki->m", b, b)             # [M]
    k = a.shape[1]
    sq = (na[:, None] + nb[None, :] - 2.0 * S_corr.sum(-1)) / k
    return np.sqrt(np.clip(sq, 0.0, None))


def load_curves(paths: list, k: int) -> np.ndarray:
    out = []
    for p in paths:
        arr = np.load(p, allow_pickle=True)
        if isinstance(arr, np.ndarray) and arr.dtype == object:
            arr = arr.item()["curve_coords"]
        arr = np.asarray(arr, np.float64)
        if arr.ndim != 2:
            continue
        coords = arr[:, :3]
        if coords.shape[0] >= 2 and np.isfinite(coords).all():
            out.append(resample_polyline(coords, k))
    return np.stack(out) if out else np.empty((0, k, 3))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", type=str, required=True,
                    help="aeot run dir (reads filtered_npy/) or a "
                         "directory of .npy curves")
    ap.add_argument("--ref_npy_dir", type=str, default="",
                    help="reference corpus for the novelty metric")
    ap.add_argument("--n", type=int, default=300)
    ap.add_argument("--ref_n", type=int, default=500)
    ap.add_argument("--resample", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    gen_dir = os.path.join(args.run_dir, "filtered_npy")
    if not os.path.isdir(gen_dir):
        gen_dir = args.run_dir
    paths = sorted(os.path.join(gen_dir, f) for f in os.listdir(gen_dir)
                   if f.endswith(".npy"))
    if not paths:
        raise SystemExit(f"no .npy curves under {gen_dir}")
    if len(paths) > args.n:
        paths = [paths[i] for i in
                 rng.choice(len(paths), args.n, replace=False)]
    gen = load_curves(paths, args.resample)

    d = aligned_rmsd_matrix(gen, gen)
    np.fill_diagonal(d, np.inf)
    nn = d.min(axis=1)
    finite = d[np.isfinite(d)]
    res = {
        "run_dir": args.run_dir,
        "n_curves": int(gen.shape[0]),
        "resample_points": args.resample,
        "diversity": {
            "mean_pairwise_rmsd": float(finite.mean()),
            "median_pairwise_rmsd": float(np.median(finite)),
            "mean_nn_rmsd": float(nn.mean()),
            "p10_nn_rmsd": float(np.percentile(nn, 10)),
            "frac_near_duplicate_lt_0p5": float((nn < 0.5).mean()),
        },
    }
    if args.ref_npy_dir:
        ref_paths = sorted(
            os.path.join(args.ref_npy_dir, f)
            for f in os.listdir(args.ref_npy_dir) if f.endswith(".npy"))
        if len(ref_paths) > args.ref_n:
            ref_paths = [ref_paths[i] for i in
                         rng.choice(len(ref_paths), args.ref_n,
                                    replace=False)]
        ref = load_curves(ref_paths, args.resample)
        dn = aligned_rmsd_matrix(gen, ref).min(axis=1)
        res["novelty_vs_ref"] = {
            "ref_dir": args.ref_npy_dir,
            "n_ref": int(ref.shape[0]),
            "mean_nn_rmsd": float(dn.mean()),
            "median_nn_rmsd": float(np.median(dn)),
            "p10_nn_rmsd": float(np.percentile(dn, 10)),
            "frac_memorized_lt_0p5": float((dn < 0.5).mean()),
        }
    line = json.dumps(res)
    print(line)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
