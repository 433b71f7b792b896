#!/usr/bin/env python
"""Decode generated z_e token tensors into per-curve .npy files.

Parity target: scripts/decode_gen_features_to_npy.py:83-157 — load a
generated-features tensor [N, n_tokens, code_dim] (z_e tokens produced by
an external generator), decode every sample at ONE fixed --target_len with
an all-True mask, and save the RAW decoder output (xyz + SS logits, NOT
argmax one-hot — the reference saves `out.cpu().numpy()` directly) as
out_dir/curve_{i:05d}.npy, shape [target_len, 6].

Accepts .pt (torch tensor, loaded via the cpu torch wheel), .npy, or .npz
(key 'features' or the first array) inputs.

Usage:
  python scripts/decode_gen_features_to_npy.py \
      --config configs/stage2_vq.yaml --ckpt checkpoints/stage2_vq/last \
      --features gen_features.pt --out_dir gen_npy \
      --target_len 40 [--batch_size 64] [--quantize]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_features(path: str) -> np.ndarray:
    if path.endswith(".pt") or path.endswith(".pth"):
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        if not torch.is_tensor(obj):
            raise RuntimeError(f"expected a Tensor in {path}, "
                               f"got {type(obj).__name__}")
        return obj.to(torch.float32).numpy()
    if path.endswith(".npz"):
        z = np.load(path)
        key = "features" if "features" in z.files else z.files[0]
        return np.asarray(z[key], np.float32)
    return np.asarray(np.load(path), np.float32)


def main() -> None:
    ap = argparse.ArgumentParser(
        "Decode generated z_e features to per-curve .npy files")
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--features", "--features_pt", dest="features",
                    type=str, required=True,
                    help=".pt/.npy/.npz tensor [N, n_tokens, code_dim]")
    ap.add_argument("--out_dir", type=str, required=True)
    ap.add_argument("--target_len", type=int, default=80,
                    help="output curve length (decoder mask length)")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--quantize", action="store_true",
                    help="pass z_e through the quantizer before decoding "
                         "(the reference decodes z_e directly)")
    args = ap.parse_args()

    from pytorch_vae_tpu.pipelines.inference import AEBundle

    bundle = AEBundle.from_checkpoint(args.config, args.ckpt)

    feats = load_features(args.features)
    if feats.ndim != 3:
        raise RuntimeError(f"expected [N, n_tokens, code_dim], "
                           f"got shape {feats.shape}")
    n, n_tok, d = feats.shape
    if (n_tok, d) != (bundle.latent_tokens, bundle.code_dim):
        raise RuntimeError(
            f"feature tokens {(n_tok, d)} do not match the model's "
            f"({bundle.latent_tokens}, {bundle.code_dim})")
    print(f"[Features] shape={feats.shape}")

    os.makedirs(args.out_dir, exist_ok=True)
    b = int(args.batch_size)
    L_out = int(args.target_len)
    mask = np.ones((b, L_out), bool)

    idx_global = 0
    for start in range(0, n, b):
        chunk = feats[start : start + b]
        bsz = chunk.shape[0]
        if bsz < b:  # keep a single compiled shape: pad the tail batch
            chunk = np.concatenate(
                [chunk, np.zeros((b - bsz, n_tok, d), np.float32)])
        z = chunk
        if args.quantize:
            z, _ = bundle.quantize(z)
        out = bundle.decode(z, mask)[:bsz]  # [bsz, L_out, 6] raw logits
        for i in range(bsz):
            np.save(os.path.join(args.out_dir,
                                 f"curve_{idx_global:05d}.npy"),
                    np.asarray(out[i], np.float32), allow_pickle=False)
            idx_global += 1
        print(f"[Decode] processed {min(start + b, n)}/{n}", flush=True)

    print(f"[Done] total curves saved: {n} to {args.out_dir}")


if __name__ == "__main__":
    main()
