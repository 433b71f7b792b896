#!/usr/bin/env python
"""Latent atlas: 2D embedding of the latent bank + codebook overlay +
probe-curve projection.

Consolidates the reference's playground atlas tools
(scripts/playground/visualize_latent_and_codebook*.py,
analyze_tsne_cache*.py, probe_pdb_in_tsne*.py, probe_pdb_unified.py):

  - embed the latent bank in 2D (PCA, or t-SNE via scikit-learn),
  - cache the embedding (+ fitted PCA basis) to .npz for re-use,
  - overlay VQ codebook vectors (projected through the same basis),
  - project probe curves (encoded on the fly) into a cached atlas.

t-SNE cannot embed new points, so probe projection uses the PCA basis —
for t-SNE atlases probes are projected by nearest-neighbor anchoring
(mean of the 5 nearest bank points in latent space), which is also how
the reference's probe tools localized PDBs in a cached t-SNE map.

Usage:
  python scripts/analysis/latent_atlas.py --latents results/latents.npz \
      --out results/atlas --method pca [--ckpt ... --config ... ]
  python scripts/analysis/latent_atlas.py --cache results/atlas/atlas.npz \
      --probe curve.npy --config ... --ckpt ... --out results/atlas
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def embed(latents: np.ndarray, method: str, seed: int):
    from sklearn.decomposition import PCA

    n_comp = min(50, latents.shape[1], latents.shape[0])
    pca = PCA(n_components=n_comp, random_state=seed)
    reduced = pca.fit_transform(latents)
    if method == "pca":
        return reduced[:, :2], pca
    if method == "umap":
        # native minimal UMAP (umap-learn is not in this image); replaces
        # the reference's probe_pdb_in_umap.py embedding backend
        from umap_min import fit_umap

        return fit_umap(reduced, seed=seed), pca
    from sklearn.manifold import TSNE

    ts = TSNE(n_components=2, random_state=seed, init="pca",
              perplexity=min(30, max(5, latents.shape[0] // 4 - 1)))
    return ts.fit_transform(reduced), pca


def load_labels(path: str, names) -> list:
    """name -> class labels (e.g. CATH classes), json {name: label} or
    tsv/csv 'name<sep>label' lines (reference visualize_tsne_cath_seq.py
    colored atlases by CATH class parsed from a mapping)."""
    import json as _json

    if path.endswith(".json"):
        table = _json.load(open(path))
    else:
        table = {}
        for line in open(path):
            parts = line.replace(",", "\t").split("\t")
            if len(parts) >= 2:
                table[parts[0].strip()] = parts[1].strip()
    return [table.get(str(n), "?") for n in names]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--latents", type=str, default="")
    ap.add_argument("--cache", type=str, default="",
                    help="reuse a previously computed atlas.npz")
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--method", type=str, default="pca",
                    choices=["pca", "tsne", "umap"])
    ap.add_argument("--labels", type=str, default="",
                    help="name->class mapping (json/tsv) for CATH-style "
                         "class coloring; needs 'names' in the bank")
    ap.add_argument("--config", type=str, default="")
    ap.add_argument("--ckpt", type=str, default="",
                    help="with --config: overlay the VQ codebook / encode "
                         "probes")
    ap.add_argument("--probe", type=str, nargs="*", default=[],
                    help="curve .npy files to project into the atlas")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    from pytorch_vae_tpu.pipelines.aeot import load_latent_bank

    names = None
    if args.cache and os.path.exists(args.cache):
        cache = dict(np.load(args.cache, allow_pickle=True))
        xy = cache["xy"]
        latents = cache["latents"]
        lengths = cache.get("lengths")
        names = cache.get("names")
        print(f"[atlas] loaded cache: {xy.shape[0]} points")
    else:
        bank = load_latent_bank(args.latents)
        latents = np.asarray(bank["latents"], np.float32)
        lengths = np.asarray(bank.get("lengths", np.zeros(len(latents))))
        names = bank.get("names")
        xy, _pca = embed(latents, args.method, args.seed)
        np.savez(os.path.join(args.out, "atlas.npz"), xy=xy,
                 latents=latents, lengths=lengths, method=args.method,
                 **({"names": names} if names is not None else {}))
        print(f"[atlas] embedded {xy.shape[0]} points with {args.method}")

    labels = None
    if args.labels:
        if names is None:
            names = [str(i) for i in range(len(latents))]
        labels = load_labels(args.labels, names)

    bundle = None
    code_xy = None
    if args.config and args.ckpt:
        from pytorch_vae_tpu.pipelines.inference import AEBundle

        bundle = AEBundle.from_checkpoint(args.config, args.ckpt)
        if bundle.vq_state is not None:
            emb = np.asarray(bundle.vq_state.embedding)
            # tile token codes into flat-latent space by repeating across
            # token slots, then anchor at nearest bank points
            code_flat = np.tile(emb, (1, bundle.latent_tokens))
            code_xy = _nearest_anchor(code_flat, latents, xy)

    probe_xy = []
    probe_names = []
    if args.probe:
        assert bundle is not None, "--probe needs --config/--ckpt"
        from pytorch_vae_tpu.data.curves import load_curve_npy

        for p in args.probe:
            coords, ss = load_curve_npy(p)
            coords = coords - coords.mean(axis=0, keepdims=True)
            L = coords.shape[0]
            pad_to = int(bundle.model.max_seq_len)
            x = np.zeros((1, pad_to, 6), np.float32)
            x[0, :L, :3] = coords
            x[0, :L, 3:] = ss
            mask = np.zeros((1, pad_to), bool)
            mask[0, :L] = True
            z = bundle.encode_tokens(x, mask).reshape(1, -1)
            probe_xy.append(_nearest_anchor(z, latents, xy)[0])
            probe_names.append(os.path.basename(p))

    # plot
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 7))
    if labels is not None:
        # CATH-style class coloring (visualize_tsne_cath_seq.py)
        classes = sorted(set(labels))
        cmap = plt.get_cmap("tab10")
        for ci, cl in enumerate(classes):
            m = np.asarray([la == cl for la in labels])
            ax.scatter(xy[m, 0], xy[m, 1], s=8, alpha=0.7,
                       color=cmap(ci % 10), label=f"class {cl} ({m.sum()})")
    else:
        c = lengths if lengths is not None and np.ptp(lengths) > 0 else None
        sc = ax.scatter(xy[:, 0], xy[:, 1], s=6, c=c, cmap="viridis",
                        alpha=0.6, label="latents")
        if c is not None:
            fig.colorbar(sc, label="curve length")
    if code_xy is not None:
        ax.scatter(code_xy[:, 0], code_xy[:, 1], s=14, c="#e5654f",
                   marker="x", label="codebook")
    for (px, py), name in zip(probe_xy, probe_names):
        ax.scatter([px], [py], s=90, c="#ffd24d", marker="*",
                   edgecolors="k", zorder=5)
        ax.annotate(name, (px, py), fontsize=8)
    ax.legend()
    ax.set_title(f"latent atlas ({args.method})")
    out_png = os.path.join(args.out, "atlas.png")
    fig.tight_layout()
    fig.savefig(out_png, dpi=130)
    print(f"[atlas] plot -> {out_png}")


def _nearest_anchor(q: np.ndarray, bank: np.ndarray, xy: np.ndarray,
                    k: int = 5) -> np.ndarray:
    """Project query latents into 2D by averaging their k nearest bank
    points' embedding coordinates."""
    d2 = (np.sum(q * q, 1, keepdims=True) - 2 * q @ bank.T
          + np.sum(bank * bank, 1)[None])
    idx = np.argsort(d2, axis=1)[:, :k]
    return xy[idx].mean(axis=1)


if __name__ == "__main__":
    main()
