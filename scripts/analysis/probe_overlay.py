#!/usr/bin/env python
"""Render base-vs-probe overlay images from a probe cache.

Parity target: scripts/playground/render_pdb_probe_overlay.py +
render_base_probe_overlay.py (consolidated): scatter the base latent
cloud (subsampled, optionally density-shaded) and overlay probe points
per group with a legend, for either the t-SNE or UMAP projection stored
in the cache.

Accepted cache keys: base_{tsne,umap}_2d or xy/emb_2d for the base;
probe_{tsne,umap}_2d or probe_xy for probes; optional probe_groups,
probe_names, base_lengths.

Usage:
  python scripts/analysis/probe_overlay.py --npz probe_cache.npz \
      --proj umap --out overlay.png [--max_base 200000] [--density] \
      [--legend] [--base_alpha 0.3] [--probe_size 14]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _first(cache, *keys):
    for k in keys:
        if k in cache.files:
            return np.asarray(cache[k])
    return None


def main() -> None:
    ap = argparse.ArgumentParser("probe overlay renderer")
    ap.add_argument("--npz", type=str, required=True)
    ap.add_argument("--proj", type=str, default="umap",
                    choices=["umap", "tsne", "any"])
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--max_base", type=int, default=200_000)
    ap.add_argument("--density", action="store_true",
                    help="shade base points by local 2-D density")
    ap.add_argument("--legend", action="store_true")
    ap.add_argument("--base_alpha", type=float, default=0.3)
    ap.add_argument("--probe_size", type=float, default=14.0)
    ap.add_argument("--probe_alpha", type=float, default=0.85)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cache = np.load(args.npz, allow_pickle=True)
    proj_keys = {
        "umap": ("base_umap_2d", "umap_2d", "xy", "emb_2d"),
        "tsne": ("base_tsne_2d", "tsne_2d", "xy", "emb_2d"),
        "any": ("base_umap_2d", "base_tsne_2d", "umap_2d", "tsne_2d",
                "xy", "emb_2d"),
    }[args.proj]
    base = _first(cache, *proj_keys)
    if base is None:
        raise RuntimeError(
            f"No base embedding for proj={args.proj} in {args.npz} "
            f"(keys: {cache.files})")
    probe = _first(cache, f"probe_{args.proj}_2d", "probe_umap_2d",
                   "probe_tsne_2d", "probe_xy")

    rng = np.random.default_rng(args.seed)
    if base.shape[0] > args.max_base:
        sel = rng.choice(base.shape[0], args.max_base, replace=False)
        base = base[sel]

    fig, ax = plt.subplots(figsize=(8, 7))
    if args.density:
        # grid-count density shading (reference uses gaussian_kde; a 2-D
        # histogram lookup is equivalent at this scale and dependency-free)
        H, xe, ye = np.histogram2d(base[:, 0], base[:, 1], bins=120)
        xi = np.clip(np.searchsorted(xe, base[:, 0]) - 1, 0, 119)
        yi = np.clip(np.searchsorted(ye, base[:, 1]) - 1, 0, 119)
        dens = H[xi, yi]
        order = np.argsort(dens)
        sc = ax.scatter(base[order, 0], base[order, 1], s=4,
                        c=dens[order], cmap="Blues",
                        alpha=args.base_alpha)
        fig.colorbar(sc, label="local density")
    else:
        ax.scatter(base[:, 0], base[:, 1], s=4, c="#9ab0c4",
                   alpha=args.base_alpha,
                   label=f"base ({base.shape[0]})")

    if probe is not None and probe.size:
        groups = _first(cache, "probe_groups")
        names = _first(cache, "probe_names", "probe_paths")
        if groups is None:
            groups = np.zeros(probe.shape[0], np.int64)
        cmap = plt.get_cmap("tab10")
        uniq = list(dict.fromkeys(groups.tolist()))
        for gi, g in enumerate(uniq):
            m = np.asarray(groups) == g
            label = str(g) if names is None else \
                os.path.basename(str(names[np.argmax(m)]))
            ax.scatter(probe[m, 0], probe[m, 1], s=args.probe_size,
                       color=cmap(gi % 10), alpha=args.probe_alpha,
                       edgecolors="k", linewidths=0.3,
                       label=f"probe {label} ({int(m.sum())})", zorder=5)

    if args.legend:
        ax.legend(fontsize=8, markerscale=1.5)
    ax.set_title(f"probe overlay ({args.proj})")
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    fig.tight_layout()
    fig.savefig(args.out, dpi=140)
    print(f"[overlay] {base.shape[0]} base + "
          f"{0 if probe is None else probe.shape[0]} probe -> {args.out}")


if __name__ == "__main__":
    main()
