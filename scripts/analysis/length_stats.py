#!/usr/bin/env python
"""Per-directory chain-length statistics for PDB / curve collections.

Parity target: scripts/playground/analyze_probe_pdb_lengths.py — the
reference shells out to an external prp-data env to count residues per
PDB, then plots per-directory length histograms. This rebuild parses CA
traces natively (serving/pdb_utils.parse_pdb_ca_trace) and also accepts
curve .npy dirs, emitting overlay histograms + a stats json.

Usage:
  python scripts/analysis/length_stats.py \
      --dirs runA/pdbs runB/pdbs --out results/length_stats
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def dir_lengths(d: str) -> np.ndarray:
    from pytorch_vae_tpu.data.curves import load_curve_npy
    from pytorch_vae_tpu.serving.pdb_utils import parse_pdb_ca_trace

    out = []
    for f in sorted(os.listdir(d)):
        p = os.path.join(d, f)
        try:
            if f.endswith(".pdb"):
                out.append(len(parse_pdb_ca_trace(open(p).read())["xyz"]))
            elif f.endswith(".npy"):
                coords, _ = load_curve_npy(p)
                out.append(coords.shape[0])
        except (ValueError, OSError, KeyError):
            continue
    return np.asarray(out, np.int64)


def main() -> None:
    ap = argparse.ArgumentParser("PDB/curve length statistics")
    ap.add_argument("--dirs", type=str, nargs="+", required=True)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--bins", type=int, default=30)
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(args.out, exist_ok=True)
    stats = {}
    fig, ax = plt.subplots(figsize=(8, 5))
    cmap = plt.get_cmap("tab10")
    for i, d in enumerate(args.dirs):
        ls = dir_lengths(d)
        name = os.path.basename(os.path.normpath(d))
        if not ls.size:
            print(f"[warn] no parsable files in {d}")
            stats[name] = {"n": 0}
            continue
        stats[name] = {
            "n": int(ls.size), "min": int(ls.min()), "max": int(ls.max()),
            "mean": float(ls.mean()), "median": float(np.median(ls)),
            "std": float(ls.std()),
        }
        ax.hist(ls, bins=args.bins, alpha=0.55, color=cmap(i % 10),
                label=f"{name} (n={ls.size})")
        print(f"[len] {name}: n={ls.size} mean={ls.mean():.1f} "
              f"range=[{ls.min()}, {ls.max()}]")
    ax.set_xlabel("chain length (residues)")
    ax.set_ylabel("count")
    ax.legend()
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "length_hist.png"), dpi=130)
    with open(os.path.join(args.out, "length_stats.json"), "w") as f:
        json.dump(stats, f, indent=2)
    print(f"[len] -> {args.out}")


if __name__ == "__main__":
    main()
