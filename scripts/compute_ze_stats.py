#!/usr/bin/env python
"""Streaming per-dimension mean/std over extracted z_e latent files.

Parity target: scripts/compute_ze_stats.py (reference :59-149) — walks a
manifest of per-sample latent npys and accumulates Welford-style streaming
statistics without loading everything in memory.

Usage:
  python scripts/compute_ze_stats.py --manifest results/codes/manifest.jsonl \
      --base_dir results/codes --out results/ze_stats.npz
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", type=str, required=True)
    ap.add_argument("--base_dir", type=str, default="")
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--key", type=str, default="latents_path")
    args = ap.parse_args()

    count = 0
    mean = None
    m2 = None
    n_files = 0
    for line in open(args.manifest):
        line = line.strip()
        if not line:
            continue
        rec = json.loads(line)
        if args.key not in rec:
            continue
        path = (os.path.join(args.base_dir, rec[args.key])
                if args.base_dir else rec[args.key])
        z = np.load(path).reshape(-1, np.load(path).shape[-1])
        n_files += 1
        for row in z:  # Welford update per token vector
            count += 1
            if mean is None:
                mean = np.zeros_like(row, np.float64)
                m2 = np.zeros_like(row, np.float64)
            delta = row - mean
            mean += delta / count
            m2 += delta * (row - mean)

    if count == 0:
        raise RuntimeError("no latent rows found")
    std = np.sqrt(m2 / max(count - 1, 1))
    np.savez(args.out, mean=mean.astype(np.float32),
             std=std.astype(np.float32), count=count, files=n_files)
    print(f"[done] {n_files} files, {count} token vectors")
    print(f"  mean-norm={np.linalg.norm(mean):.4f} "
          f"std-mean={std.mean():.4f} -> {args.out}")


if __name__ == "__main__":
    main()
