#!/usr/bin/env python
"""Export per-token z_e vectors for the whole dataset, sharded into chunks.

Parity target: scripts/playground/export_ze_tokens.py (z_e token export
with sharding). Each output shard is an .npz with tokens [M, D], their
(sample, token) provenance, and lengths.

Usage:
  python scripts/analysis/export_ze_tokens.py --config configs/stage1_ae.yaml \
      --ckpt checkpoints/stage1_ae/last --out_dir results/ze_tokens \
      [--shard_size 50000 --split train]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--out_dir", type=str, required=True)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--shard_size", type=int, default=50_000)
    ap.add_argument("--split", type=str, default="train",
                    choices=["train", "val"])
    args = ap.parse_args()

    from pytorch_vae_tpu import config as cfglib
    from pytorch_vae_tpu.data.curves import CurveDataset, pad_batch
    from pytorch_vae_tpu.pipelines.inference import AEBundle

    bundle = AEBundle.from_checkpoint(args.config, args.ckpt)
    cfg = bundle.config
    dp = cfg["data_params"]
    list_name = dp["train_list"] if args.split == "train" else dp["val_list"]
    ds = CurveDataset(
        dp["npy_dir"],
        list_path=cfglib.resolve_path(dp["npy_dir"], list_name),
        train=args.split == "train",
        max_seq_len=int(bundle.model.max_seq_len))

    os.makedirs(args.out_dir, exist_ok=True)
    pad_to = int(bundle.model.max_seq_len)
    shard_tokens, shard_src, shard_tok = [], [], []
    shard_id = n_tokens_total = 0

    def flush():
        nonlocal shard_id, shard_tokens, shard_src, shard_tok
        if not shard_tokens:
            return
        path = os.path.join(args.out_dir, f"ze_shard_{shard_id:04d}.npz")
        np.savez(path,
                 tokens=np.concatenate(shard_tokens).astype(np.float32),
                 sample_idx=np.asarray(shard_src, np.int64),
                 token_idx=np.asarray(shard_tok, np.int64))
        print(f"[shard {shard_id}] {len(shard_src)} tokens -> {path}")
        shard_id += 1
        shard_tokens, shard_src, shard_tok = [], [], []

    for i0 in range(0, len(ds), args.batch_size):
        ids = list(range(i0, min(len(ds), i0 + args.batch_size)))
        samples = [ds[i] for i in ids]
        x, mask = pad_batch(samples, pad_to=pad_to)
        z = bundle.encode_tokens(x, mask)  # [B, N, D]
        N = z.shape[1]
        for bi, sid in enumerate(ids):
            shard_tokens.append(z[bi])
            shard_src.extend([sid] * N)
            shard_tok.extend(range(N))
            n_tokens_total += N
        if len(shard_src) >= args.shard_size:
            flush()
    flush()
    meta = {"n_tokens": n_tokens_total, "n_shards": shard_id,
            "code_dim": bundle.code_dim,
            "latent_tokens": bundle.latent_tokens}
    with open(os.path.join(args.out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(f"[done] {n_tokens_total} tokens in {shard_id} shards")


if __name__ == "__main__":
    main()
