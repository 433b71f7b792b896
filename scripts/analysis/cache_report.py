#!/usr/bin/env python
"""Full analysis report over a cached 2-D latent atlas.

Parity target: scripts/playground/analyze_tsne_cache.py +
analyze_tsne_cache2.py (consolidated, flag-driven) — given an embedding
cache, emit the reference's plot suite + cluster summary under
<out>/analysis/:

  plain.png, len_continuous.png, len_highlight_<a>_<b>.png,
  helix_frac.png / sheet_frac.png / loop_frac.png, ss_argmax.png,
  class.png (if labels), clusters.png, hist_<field>_cluster_<id>.png,
  cluster_summary.txt

Accepts this framework's atlas caches (latent_atlas.py: xy/latents/
lengths/names) and reference-style caches (tsne_2d/umap_2d, rel_paths,
helix_frac/sheet_frac/loop_frac, labels). SS fractions are taken from
the cache when present, else computed from the curve files when
--data_dir is given.

Usage:
  python scripts/analysis/cache_report.py --cache results/atlas/atlas.npz \
      --out results/atlas [--data_dir data/curves] [--clusters 6] \
      [--highlight 40 120] [--labels mapping.tsv]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from island_paths import _kmeans_1d, load_cache  # noqa: E402


def _cache_field(cache, *keys):
    for k in keys:
        if k in cache.files:
            return np.asarray(cache[k])
    return None


def _ss_fracs_from_files(data_dir, names):
    from pytorch_vae_tpu.data.curves import load_curve_npy

    out = np.full((len(names), 3), np.nan, np.float64)
    for i, n in enumerate(names):
        p = os.path.join(data_dir, str(n))
        if not os.path.isfile(p):
            continue
        try:
            _, ss = load_curve_npy(p)
        except (ValueError, OSError):
            continue
        out[i] = np.asarray(ss).mean(axis=0)
    return out


def main() -> None:
    ap = argparse.ArgumentParser("atlas cache analysis report")
    ap.add_argument("--cache", type=str, required=True)
    ap.add_argument("--out", type=str, default="",
                    help="default: <cache_dir>")
    ap.add_argument("--data_dir", type=str, default="",
                    help="curve dir to compute SS fractions from names")
    ap.add_argument("--clusters", type=int, default=6)
    ap.add_argument("--highlight", type=float, nargs=2, default=None,
                    metavar=("MIN", "MAX"),
                    help="length range to highlight")
    ap.add_argument("--labels", type=str, default="",
                    help="name->class mapping (json/tsv)")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    emb, names = load_cache(args.cache)
    cache = np.load(args.cache, allow_pickle=True)
    lengths = _cache_field(cache, "lengths", "base_lengths")
    out_dir = os.path.join(
        args.out or os.path.dirname(os.path.abspath(args.cache)),
        "analysis")
    os.makedirs(out_dir, exist_ok=True)

    ss = None
    hf = _cache_field(cache, "helix_frac")
    if hf is not None:
        ss = np.stack([hf, _cache_field(cache, "sheet_frac"),
                       _cache_field(cache, "loop_frac")], axis=1)
    elif args.data_dir and names:
        ss = _ss_fracs_from_files(args.data_dir, names)

    def scat(c, title, fname, cmap="viridis", discrete=None):
        fig, ax = plt.subplots(figsize=(7, 6))
        if discrete is not None:
            cmap_d = plt.get_cmap("tab10")
            for ci, cl in enumerate(discrete):
                m = np.asarray(c) == cl
                ax.scatter(emb[m, 0], emb[m, 1], s=6, alpha=0.7,
                           color=cmap_d(ci % 10),
                           label=f"{cl} ({int(m.sum())})")
            ax.legend(fontsize=8)
        elif c is None:
            ax.scatter(emb[:, 0], emb[:, 1], s=5, alpha=0.6)
        else:
            sc = ax.scatter(emb[:, 0], emb[:, 1], s=5, c=c,
                            cmap=cmap, alpha=0.7)
            fig.colorbar(sc)
        ax.set_title(title)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, fname), dpi=120)
        plt.close(fig)

    scat(None, "atlas (plain)", "plain.png")
    if lengths is not None and np.ptp(lengths) > 0:
        scat(lengths, "curve length", "len_continuous.png")
        if args.highlight:
            lo, hi = args.highlight
            m = (lengths >= lo) & (lengths <= hi)
            fig, ax = plt.subplots(figsize=(7, 6))
            ax.scatter(emb[~m, 0], emb[~m, 1], s=4, c="#c8c8c8",
                       alpha=0.4)
            ax.scatter(emb[m, 0], emb[m, 1], s=8, c="#e5654f", alpha=0.9,
                       label=f"len in [{lo:g}, {hi:g}] ({int(m.sum())})")
            ax.legend()
            ax.set_title("length highlight")
            fig.tight_layout()
            fig.savefig(os.path.join(
                out_dir, f"len_highlight_{lo:g}_{hi:g}.png"), dpi=120)
            plt.close(fig)
    if ss is not None and np.isfinite(ss).any():
        for i, nm in enumerate(("helix_frac", "sheet_frac", "loop_frac")):
            scat(ss[:, i], nm, f"{nm}.png", cmap="plasma")
        arg = np.argmax(np.nan_to_num(ss), axis=1)
        scat([("helix", "sheet", "loop")[a] for a in arg],
             "dominant SS", "ss_argmax.png",
             discrete=("helix", "sheet", "loop"))

    labels = None
    if args.labels and names:
        from latent_atlas import load_labels

        labels = load_labels(args.labels, names)
        scat(labels, "class", "class.png", discrete=sorted(set(labels)))

    # clusters on the full 2-D embedding + per-cluster stats
    k = min(max(args.clusters, 2), emb.shape[0])
    cl, _ = _kmeans_1d(emb, k, seed=args.seed)
    scat([str(c) for c in cl], "clusters", "clusters.png",
         discrete=[str(c) for c in range(k)])
    with open(os.path.join(out_dir, "cluster_summary.txt"), "w") as f:
        f.write(f"# {emb.shape[0]} points, {k} clusters\n")
        for c in range(k):
            m = cl == c
            line = f"cluster {c}: n={int(m.sum())}"
            if lengths is not None:
                line += (f" len_mean={float(np.mean(lengths[m])):.1f}"
                         f" len_std={float(np.std(lengths[m])):.1f}")
                fig, ax = plt.subplots(figsize=(5, 3))
                ax.hist(np.asarray(lengths)[m], bins=20)
                ax.set_title(f"lengths, cluster {c}")
                fig.tight_layout()
                fig.savefig(os.path.join(
                    out_dir, f"hist_length_cluster_{c}.png"), dpi=100)
                plt.close(fig)
            if ss is not None and np.isfinite(ss[m]).any():
                mm = np.nanmean(ss[m], axis=0)
                line += (f" helix={mm[0]:.2f} sheet={mm[1]:.2f}"
                         f" loop={mm[2]:.2f}")
            f.write(line + "\n")
    print(f"[report] -> {out_dir} "
          f"({len(os.listdir(out_dir))} artifacts)")


if __name__ == "__main__":
    main()
