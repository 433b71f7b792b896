#!/usr/bin/env python
"""Merge stage-1 latent banks into one OT candidate bank.

Why this exists: the OT generator interpolates between top-k candidate
cells of the latent bank, and the angular pair-dedup SATURATES on a small
bank — on the 3,276-cell r3 corpus only ~1,871 unique candidate pairs
survive the filter even at 400k samples (CLAUDE.md round-3 findings). The
bank does not have to be the training set: any corpus encoded by the same
checkpoint is a valid source of OT cells. This tool concatenates banks
produced by scripts/extract_ae_latents.py (e.g. the train split plus an
extraction-only synthetic corpus) and recomputes the per-dim mean/std the
OT pipeline normalizes with.

The reference has no counterpart (its bank is always the train split,
scripts/extract_ae_latents.py:143-154); this is a documented capability
extension addressing a measured limitation.

Usage:
  python scripts/analysis/merge_latent_banks.py \
      --banks results/synth_latents_r3e.npz results/synth_latents_r3x.npz \
      --out results/synth_latents_r3m.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))


def load_bank(path: str) -> dict:
    if path.endswith(".pt"):
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
        return {k: (v.numpy() if hasattr(v, "numpy") else v)
                for k, v in raw.items()}
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def merge_banks(banks: list) -> dict:
    """Concatenate banks; scalar metadata must agree across inputs."""
    first = banks[0]
    for key in ("latent_tokens", "code_dim"):
        vals = {int(b[key]) for b in banks if key in b}
        if len(vals) > 1:
            raise ValueError(f"Banks disagree on {key}: {sorted(vals)}")
    latents = np.concatenate([b["latents"] for b in banks], axis=0)
    lengths = np.concatenate([b["lengths"] for b in banks], axis=0)
    if latents.shape[0] != lengths.shape[0]:
        raise ValueError("latents/lengths row mismatch after merge")
    out = {
        "latents": latents.astype(np.float32),
        "lengths": lengths.astype(np.int32),
        "mean": latents.astype(np.float64).mean(axis=0).astype(np.float32),
        "std": (latents.astype(np.float64).std(axis=0) + 1e-6).astype(
            np.float32),
        "kept": int(sum(int(b.get("kept", b["latents"].shape[0]))
                        for b in banks)),
        "skipped": int(sum(int(b.get("skipped", 0)) for b in banks)),
        "len_min": int(min(int(b.get("len_min", 1)) for b in banks)),
        "len_max": int(max(int(b.get("len_max", 0)) for b in banks)),
    }
    for key in ("latent_tokens", "code_dim"):
        if key in first:
            out[key] = int(first[key])
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--banks", type=str, nargs="+", required=True,
                    help="two or more .npz/.pt banks from "
                         "extract_ae_latents.py, same checkpoint")
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args()
    if len(args.banks) < 2:
        ap.error("--banks needs at least two banks to merge")

    banks = [load_bank(p) for p in args.banks]
    merged = merge_banks(banks)
    out_dir = os.path.dirname(args.out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    np.savez(args.out, **merged)
    sizes = " + ".join(str(b["latents"].shape[0]) for b in banks)
    print(f"[Info] Merged {sizes} = {merged['latents'].shape[0]} cells "
          f"-> {args.out}")
    print(f"[Info] Latent shape: {merged['latents'].shape}")


if __name__ == "__main__":
    main()
