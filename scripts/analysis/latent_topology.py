#!/usr/bin/env python
"""Latent-space topology analysis: connectivity + persistence profile.

Counterpart of scripts/playground/latent_topology_analysis.py: quantifies
the shape of the latent bank beyond clustering —

  - single-linkage merge profile: number of connected components as a
    function of the distance threshold (a Betti-0 persistence curve),
    with the merge heights ("deaths") of every component,
  - mutual-kNN graph component analysis at a chosen k (islands in the
    latent manifold that OT interpolation would have to bridge),
  - per-component stats: size, latent radius, mean curve length.

Writes topology.json (+ optional persistence plot).

Usage:
  python scripts/analysis/latent_topology.py \
      --latents results/latents.npz --out results/topology.json \
      [--knn 10] [--plot results/topology.png]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


class _DSU:
    def __init__(self, n: int):
        self.p = list(range(n))

    def find(self, a: int) -> int:
        while self.p[a] != a:
            self.p[a] = self.p[self.p[a]]
            a = self.p[a]
        return a

    def union(self, a: int, b: int) -> bool:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return False
        self.p[ra] = rb
        return True


def mst_merge_heights(x: np.ndarray) -> np.ndarray:
    """Single-linkage merge distances (Prim MST edge weights, sorted):
    the Betti-0 persistence deaths of the latent point cloud."""
    n = x.shape[0]
    in_tree = np.zeros(n, bool)
    d = np.full(n, np.inf)
    in_tree[0] = True
    d = np.linalg.norm(x - x[0], axis=1)
    d[0] = np.inf
    heights = []
    for _ in range(n - 1):
        j = int(np.argmin(d))
        heights.append(float(d[j]))
        in_tree[j] = True
        dj = np.linalg.norm(x - x[j], axis=1)
        d = np.minimum(d, dj)
        d[in_tree] = np.inf
    return np.sort(np.asarray(heights))


def mutual_knn_components(x: np.ndarray, k: int) -> np.ndarray:
    """Component id per point of the mutual-kNN graph."""
    from sklearn.neighbors import NearestNeighbors

    nn = NearestNeighbors(n_neighbors=k + 1).fit(x)
    _d, idx = nn.kneighbors(x)
    idx = idx[:, 1:]
    neigh = [set(row.tolist()) for row in idx]
    dsu = _DSU(x.shape[0])
    for i, row in enumerate(idx):
        for j in row:
            if i in neigh[j]:  # mutual edge
                dsu.union(i, int(j))
    roots = {}
    comp = np.zeros(x.shape[0], np.int64)
    for i in range(x.shape[0]):
        r = dsu.find(i)
        comp[i] = roots.setdefault(r, len(roots))
    return comp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--latents", type=str, required=True)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--knn", type=int, default=10)
    ap.add_argument("--max_points", type=int, default=4096,
                    help="subsample cap (MST is O(n^2))")
    ap.add_argument("--plot", type=str, default="")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from pytorch_vae_tpu.pipelines.aeot import load_latent_bank

    bank = load_latent_bank(args.latents)
    x = np.asarray(bank["latents"], np.float64)
    lengths = np.asarray(bank.get("lengths", np.zeros(len(x))))
    if len(x) > args.max_points:
        sel = np.random.default_rng(args.seed).choice(
            len(x), args.max_points, replace=False)
        x, lengths = x[sel], lengths[sel]

    heights = mst_merge_heights(x)
    comp = mutual_knn_components(x, args.knn)
    n_comp = int(comp.max()) + 1
    comps = []
    for c in range(n_comp):
        m = comp == c
        center = x[m].mean(0)
        comps.append({
            "size": int(m.sum()),
            "latent_radius": float(
                np.linalg.norm(x[m] - center, axis=1).mean()),
            "mean_length": float(lengths[m].mean()) if m.any() else 0.0,
        })
    comps.sort(key=lambda c: -c["size"])

    # components alive at threshold t = count of merge heights > t, +1
    qs = [50, 75, 90, 95, 99]
    prof = {f"p{q}": float(np.percentile(heights, q)) for q in qs}
    report = {
        "n_points": int(x.shape[0]),
        "dim": int(x.shape[1]),
        "merge_height_percentiles": prof,
        "max_merge_height": float(heights[-1]),
        # a big last-merge gap = well-separated islands
        "last_gap_ratio": float(heights[-1] / (heights[-2] + 1e-12)),
        "mutual_knn_k": args.knn,
        "n_components_mutual_knn": n_comp,
        "components": comps[:20],
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"[topology] {report['n_points']} pts, "
          f"{n_comp} mutual-kNN components -> {args.out}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 4))
        ts = np.concatenate([[0.0], heights])
        counts = np.arange(len(x), 0, -1)
        ax.step(ts, counts, where="post")
        ax.set_xlabel("distance threshold")
        ax.set_ylabel("# connected components (Betti-0)")
        ax.set_yscale("log")
        ax.set_title("latent single-linkage persistence")
        fig.tight_layout()
        fig.savefig(args.plot, dpi=130)
        print(f"[topology] plot -> {args.plot}")


if __name__ == "__main__":
    main()
