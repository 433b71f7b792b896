#!/usr/bin/env python
"""Extract embedding "island" curve lists from a cached 2-D atlas.

Parity target: scripts/playground/extract_umap_island_paths.py — KMeans
on the UMAP/t-SNE x-coordinate (or the full 2-D embedding with --use_2d),
pick the left-most cluster, and write its member curve paths to a txt
list for downstream probing.

Works on this framework's atlas caches (scripts/analysis/latent_atlas.py
.npz with `emb_2d` [+ optional `names`]) and on reference-style caches
(`tsne_2d`/`umap_2d` + `rel_paths`).

Usage:
  python scripts/analysis/island_paths.py --cache results/atlas/atlas.npz \
      --n_clusters 2 --out results/atlas/left_island.txt
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _kmeans_1d(x: np.ndarray, k: int, iters: int = 50, seed: int = 42):
    """Plain numpy KMeans (1-D or 2-D rows); returns (labels, centers)."""
    rng = np.random.default_rng(seed)
    x = np.asarray(x, np.float64)
    centers = x[rng.choice(x.shape[0], size=k, replace=False)]
    labels = np.zeros(x.shape[0], np.int64)
    for _ in range(iters):
        d = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        new = np.argmin(d, axis=1)
        if np.array_equal(new, labels):
            break
        labels = new
        for c in range(k):
            m = labels == c
            if m.any():
                centers[c] = x[m].mean(0)
    return labels, centers


def load_cache(path: str):
    cache = np.load(path, allow_pickle=True)
    emb = None
    for key in ("xy", "emb_2d", "umap_2d", "tsne_2d"):
        if key in cache.files:
            emb = np.asarray(cache[key], np.float64)
            break
    if emb is None:
        raise RuntimeError(
            f"No 2-D embedding in {path}; expected one of "
            f"emb_2d/umap_2d/tsne_2d, found {cache.files}")
    names = None
    for key in ("names", "rel_paths"):
        if key in cache.files:
            names = [str(s) for s in cache[key]]
            break
    return emb, names


def main() -> None:
    ap = argparse.ArgumentParser(
        "Extract left-island curve paths from a cached 2-D embedding")
    ap.add_argument("--cache", type=str, required=True)
    ap.add_argument("--n_clusters", type=int, default=2)
    ap.add_argument("--use_2d", action="store_true",
                    help="cluster the full 2-D embedding instead of x")
    ap.add_argument("--out", type=str, default="",
                    help="default: <cache_dir>/left_island_curves.txt")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    emb, names = load_cache(args.cache)
    x = emb if args.use_2d else emb[:, :1]
    n = x.shape[0]
    k = min(max(args.n_clusters, 2), n)
    labels, centers = _kmeans_1d(x, k, seed=args.seed)
    left = int(np.argmin(centers[:, 0]))
    idx = np.where(labels == left)[0]
    print(f"[island] left-most cluster {left} "
          f"(center x={centers[left, 0]:.3f}), size {idx.shape[0]}/{n}")

    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(args.cache)),
        "left_island_curves.txt")
    with open(out, "w") as f:
        f.write("# Left island curves (x-split KMeans)\n")
        f.write("# global_index\tpath\n")
        for i in idx:
            name = names[i] if names and i < len(names) else f"idx_{i}"
            f.write(f"{i}\t{name}\n")
    print(f"[island] saved -> {out}")


if __name__ == "__main__":
    main()
