#!/usr/bin/env python
"""Extract flattened stage-1 AE latents for the whole train split.

TPU-native equivalent of the reference scripts/extract_ae_latents.py:
encodes every curve in the train list, keeps a [len_min, len_max] length
window, and saves a latent bank with the same keys the OT pipeline consumes
(latents [N, tokens*D], lengths [N], mean/std per dim, latent_tokens,
code_dim, kept/skipped — reference :143-154).

Output format: .npz (or torch .pt with --pt for bit-compat with the
reference pipeline inputs).

Usage:
  python scripts/extract_ae_latents.py --config configs/stage1_ae.yaml \
      --ckpt checkpoints/stage1_ae/last --out results/latents.npz \
      [--len_min 1 --len_max 80 --batch_size 128]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--len_min", type=int, default=1)
    ap.add_argument("--len_max", type=int, default=80,
                    help="keep samples with length <= len_max (0 = no cap)")
    ap.add_argument("--split", type=str, default="train",
                    choices=["train", "val"])
    ap.add_argument("--npy_dir", type=str, default=None,
                    help="override data_params.npy_dir — extract from a "
                         "corpus the model was never trained on (bank "
                         "growth: the OT latent bank does not have to be "
                         "the training set)")
    ap.add_argument("--pt", action="store_true",
                    help="save a torch .pt dict instead of .npz")
    args = ap.parse_args()

    from pytorch_vae_tpu import config as cfglib
    from pytorch_vae_tpu.data.curves import CurveDataset, pad_batch
    from pytorch_vae_tpu.pipelines.inference import AEBundle

    bundle = AEBundle.from_checkpoint(args.config, args.ckpt)
    cfg = bundle.config
    dp = cfg["data_params"]
    npy_dir = args.npy_dir or dp["npy_dir"]
    list_name = dp["train_list"] if args.split == "train" else dp["val_list"]
    ds = CurveDataset(
        npy_dir,
        list_path=cfglib.resolve_path(npy_dir, list_name),
        train=args.split == "train",
        max_seq_len=int(cfg["model_params"].get("max_seq_len", 350)))

    all_latents, all_lengths = [], []
    kept = skipped = 0
    pad_to = int(cfg["model_params"].get("max_seq_len", 350))
    bs = args.batch_size
    for i0 in range(0, len(ds), bs):
        samples = [ds[i] for i in range(i0, min(len(ds), i0 + bs))]
        lengths = np.asarray([s.shape[0] for s in samples])
        keep = lengths >= args.len_min
        if args.len_max > 0:
            keep &= lengths <= args.len_max
        skipped += int((~keep).sum())
        if not keep.any():
            continue
        samples = [s for s, k in zip(samples, keep) if k]
        lengths = lengths[keep]
        kept += len(samples)
        x, mask = pad_batch(samples, pad_to=pad_to)
        z = bundle.encode_tokens(x, mask)  # [B, N, D]
        all_latents.append(z.reshape(z.shape[0], -1))
        all_lengths.append(lengths)

    if not all_latents:
        raise RuntimeError("No samples matched the requested length range.")
    latents = np.concatenate(all_latents, axis=0).astype(np.float32)
    lengths = np.concatenate(all_lengths, axis=0).astype(np.int32)
    mean = latents.mean(axis=0)
    std = latents.std(axis=0) + 1e-6

    out_dir = os.path.dirname(args.out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    payload = {
        "latents": latents, "lengths": lengths, "mean": mean, "std": std,
        "latent_tokens": bundle.latent_tokens, "code_dim": bundle.code_dim,
        "len_min": args.len_min, "len_max": args.len_max,
        "kept": kept, "skipped": skipped,
    }
    if args.pt:
        import torch

        torch.save({k: (torch.from_numpy(v) if isinstance(v, np.ndarray)
                        else v) for k, v in payload.items()}, args.out)
    else:
        np.savez(args.out, **payload)

    print(f"[Info] Kept {kept} samples, skipped {skipped} samples.")
    print(f"[Info] Saved {latents.shape[0]} samples to {args.out}")
    print(f"[Info] Latent shape: {latents.shape}")
    print(f"[Info] Lengths: min={lengths.min()}, "
          f"mean={lengths.mean():.2f}, max={lengths.max()}")


if __name__ == "__main__":
    main()
