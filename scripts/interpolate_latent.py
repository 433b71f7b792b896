#!/usr/bin/env python
"""Latent interpolation between two curves: z = a*z_A + (1-a)*z_B.

Parity target: scripts/interpolate_latent.py (reference :352-369 —
encode both curves, mix latents over an alpha grid, optionally quantize,
decode, save the interpolated curves).

Usage:
  python scripts/interpolate_latent.py --config configs/stage1_ae.yaml \
      --ckpt checkpoints/stage1_ae/last \
      --curve_a a.npy --curve_b b.npy --out_dir results/interp \
      [--steps 7 --quantize]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _encode_one(bundle, path):
    from pytorch_vae_tpu.data.curves import load_curve_npy

    coords, ss = load_curve_npy(path)
    coords = coords - coords.mean(axis=0, keepdims=True)
    L = coords.shape[0]
    pad_to = int(bundle.model.max_seq_len)
    x = np.zeros((1, pad_to, 6), np.float32)
    x[0, :L, :3] = coords
    x[0, :L, 3:] = ss
    mask = np.zeros((1, pad_to), bool)
    mask[0, :L] = True
    return bundle.encode_tokens(x, mask)[0], L


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--curve_a", type=str, required=True)
    ap.add_argument("--curve_b", type=str, required=True)
    ap.add_argument("--out_dir", type=str, required=True)
    ap.add_argument("--steps", type=int, default=7)
    ap.add_argument("--quantize", action="store_true",
                    help="snap each interpolant through the quantizer")
    args = ap.parse_args()

    from pytorch_vae_tpu.pipelines.inference import AEBundle

    bundle = AEBundle.from_checkpoint(args.config, args.ckpt)
    z_a, L_a = _encode_one(bundle, args.curve_a)
    z_b, L_b = _encode_one(bundle, args.curve_b)

    os.makedirs(args.out_dir, exist_ok=True)
    manifest = os.path.join(args.out_dir, "manifest.jsonl")
    alphas = np.linspace(0.0, 1.0, args.steps)
    z_mix = np.stack([a * z_a + (1 - a) * z_b for a in alphas])
    if args.quantize and bundle.vq_state is not None:
        z_mix, _ = bundle.quantize(z_mix)
    lengths = np.round(alphas * L_a + (1 - alphas) * L_b).astype(np.int64)
    curves = bundle.decode_curve6(z_mix, lengths,
                                  pad_to=int(bundle.model.max_seq_len))
    with open(manifest, "w") as mf:
        for i, (a, c) in enumerate(zip(alphas, curves)):
            path = os.path.join(args.out_dir, f"interp_{i:02d}.npy")
            np.save(path, c, allow_pickle=False)
            mf.write(json.dumps({"i": i, "alpha": float(a), "path": path,
                                 "length": int(lengths[i])}) + "\n")
            print(f"alpha={a:.2f} L={lengths[i]} -> {path}")


if __name__ == "__main__":
    main()
