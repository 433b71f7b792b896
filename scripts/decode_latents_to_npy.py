#!/usr/bin/env python
"""Decode a latent bank (.npz / .pt) into per-curve [L, 6] npy files.

Parity target: scripts/decode_latents_pt_to_npy.py (variable lengths,
optional min-max de-normalization, per-curve manifest).

Usage:
  python scripts/decode_latents_to_npy.py --config configs/stage1_ae.yaml \
      --ckpt checkpoints/stage1_ae/last --latents results/latents.npz \
      --out_dir results/decoded [--denorm minmax --batch_size 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--latents", type=str, required=True,
                    help="latent bank with latents [N, Dflat] + lengths [N]")
    ap.add_argument("--out_dir", type=str, required=True)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--denorm", type=str, default="none",
                    choices=["none", "minmax", "meanstd"],
                    help="undo a latent normalization using bank stats")
    ap.add_argument("--name_pattern", type=str, default="decoded_{i:06d}.npy")
    ap.add_argument("--save_dict", action="store_true",
                    help="save reference-style dict npys "
                         "(curve_coords + ss_one_hot) instead of [L, 6]")
    args = ap.parse_args()

    from pytorch_vae_tpu.pipelines.aeot import load_latent_bank
    from pytorch_vae_tpu.pipelines.inference import AEBundle

    bundle = AEBundle.from_checkpoint(args.config, args.ckpt)
    bank = load_latent_bank(args.latents)
    z = np.asarray(bank["latents"], np.float32)
    lengths = np.asarray(bank["lengths"]).reshape(-1).astype(np.int64)
    if z.shape[1] != bundle.flat_dim:
        raise RuntimeError(f"latent dim {z.shape[1]} != model flat dim "
                           f"{bundle.flat_dim}")

    if args.denorm == "meanstd" and "mean" in bank and "std" in bank:
        z = z * np.asarray(bank["std"]) + np.asarray(bank["mean"])
    elif args.denorm == "minmax" and "min" in bank and "max" in bank:
        lo, hi = np.asarray(bank["min"]), np.asarray(bank["max"])
        z = z * (hi - lo) + lo

    os.makedirs(args.out_dir, exist_ok=True)
    manifest = os.path.join(args.out_dir, "manifest.jsonl")
    pad_to = int(bundle.model.max_seq_len)
    lengths = np.clip(lengths, 1, pad_to)
    n = z.shape[0]
    with open(manifest, "w") as mf:
        for i0 in range(0, n, args.batch_size):
            i1 = min(n, i0 + args.batch_size)
            zt = z[i0:i1].reshape(i1 - i0, bundle.latent_tokens,
                                  bundle.code_dim)
            curves = bundle.decode_curve6(zt, lengths[i0:i1], pad_to=pad_to)
            for bi, c in enumerate(curves):
                gi = i0 + bi
                path = os.path.join(args.out_dir,
                                    args.name_pattern.format(i=gi))
                if args.save_dict:
                    np.save(path, {"curve_coords": c[:, :3],
                                   "ss_one_hot": c[:, 3:6]},
                            allow_pickle=True)
                else:
                    np.save(path, c, allow_pickle=False)
                mf.write(json.dumps({"i": gi, "path": path,
                                     "length": int(lengths[gi])}) + "\n")
            print(f"[progress] {i1}/{n}", flush=True)
    print(f"[done] decoded {n} curves -> {args.out_dir}")


if __name__ == "__main__":
    main()
