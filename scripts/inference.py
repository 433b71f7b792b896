#!/usr/bin/env python
"""Simple batch inference: reconstruct or sample curves from a checkpoint.

The reference's scripts/inference.py targeted an older model API and was
dead code (SURVEY.md C20); this version provides the same intent —
a minimal "load checkpoint, run the model" entry — against the current API.

Usage:
  # reconstruct curves from a directory
  python scripts/inference.py --config configs/stage1_ae.yaml \
      --ckpt checkpoints/stage1_ae/last --mode reconstruct \
      --in data/curves --out results/inference [--limit 16]
  # unconditional samples from a stage-2 codebook
  python scripts/inference.py --config configs/stage2_vq.yaml \
      --ckpt checkpoints/stage2_vq/last --mode sample \
      --num 16 --length 128 --out results/samples
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--mode", type=str, default="reconstruct",
                    choices=["reconstruct", "sample"])
    ap.add_argument("--in", dest="inp", type=str, default="")
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--num", type=int, default=16)
    ap.add_argument("--length", type=int, default=128)
    ap.add_argument("--limit", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from pytorch_vae_tpu.data.curves import load_curve_npy, pad_batch
    from pytorch_vae_tpu.pipelines.inference import AEBundle

    bundle = AEBundle.from_checkpoint(args.config, args.ckpt)
    os.makedirs(args.out, exist_ok=True)

    if args.mode == "sample":
        assert bundle.vq_state is not None, \
            "sampling needs a stage-2 (use_vq) checkpoint"
        out = bundle.model.apply(
            {"params": bundle.params}, bundle.vq_state, args.num,
            jax.random.PRNGKey(args.seed), args.length, method="sample")
        out = np.asarray(out)
        ss_idx = np.argmax(out[..., 3:], axis=-1)
        for i in range(args.num):
            c = np.concatenate(
                [out[i, :, :3],
                 np.eye(3, dtype=np.float32)[ss_idx[i]]], axis=-1)
            np.save(os.path.join(args.out, f"sample_{i:04d}.npy"), c,
                    allow_pickle=False)
        print(f"[done] {args.num} samples of length {args.length} "
              f"-> {args.out}")
        return

    files = sorted(Path(args.inp).glob("*.npy"))[: args.limit]
    if not files:
        raise FileNotFoundError(f"no .npy curves under {args.inp}")
    pad_to = int(bundle.model.max_seq_len)
    samples = []
    for f in files:
        coords, ss = load_curve_npy(str(f))
        coords = coords - coords.mean(axis=0, keepdims=True)
        samples.append(np.concatenate([coords, ss], -1)[:pad_to])
    lengths = np.asarray([s.shape[0] for s in samples])
    x, mask = pad_batch(samples, pad_to=pad_to)
    z = bundle.encode_tokens(x, mask)
    if bundle.vq_state is not None:
        z, _ = bundle.quantize(z)
    curves = bundle.decode_curve6(z, lengths, pad_to=pad_to)
    for f, c in zip(files, curves):
        np.save(os.path.join(args.out, f"{f.stem}_recon.npy"), c,
                allow_pickle=False)
    print(f"[done] reconstructed {len(files)} curves -> {args.out}")


if __name__ == "__main__":
    main()
