#!/usr/bin/env python
"""Batch-reconstruct a dataset split through a trained model and save the
reconstructions + per-sample RMSD report.

Parity target: scripts/playground/reconstruct_and_save_vqvae.py.

Usage:
  python scripts/analysis/reconstruct_dataset.py --config configs/... \
      --ckpt checkpoints/.../last --out_dir results/recons [--split val]
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
    ap.add_argument("--split", type=str, default="val",
                    choices=["train", "val"])
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--quantize", action="store_true",
                    help="decode from quantized latents (stage-2 models)")
    args = ap.parse_args()

    from pytorch_vae_tpu import config as cfglib
    from pytorch_vae_tpu.data.curves import CurveDataset, pad_batch
    from pytorch_vae_tpu.pipelines.inference import AEBundle
    from pytorch_vae_tpu.serving.pdb_utils import kabsch_align_np

    bundle = AEBundle.from_checkpoint(args.config, args.ckpt)
    cfg = bundle.config
    dp = cfg["data_params"]
    list_name = dp["train_list"] if args.split == "train" else dp["val_list"]
    ds = CurveDataset(
        dp["npy_dir"],
        list_path=cfglib.resolve_path(dp["npy_dir"], list_name),
        train=False, max_seq_len=int(bundle.model.max_seq_len))

    os.makedirs(args.out_dir, exist_ok=True)
    pad_to = int(bundle.model.max_seq_len)
    report = []
    for i0 in range(0, len(ds), args.batch_size):
        ids = list(range(i0, min(len(ds), i0 + args.batch_size)))
        samples = [ds[i] for i in ids]
        lengths = np.asarray([s.shape[0] for s in samples])
        x, mask = pad_batch(samples, pad_to=pad_to)
        z = bundle.encode_tokens(x, mask)
        if args.quantize and bundle.vq_state is not None:
            z, _ = bundle.quantize(z)
        curves = bundle.decode_curve6(z, lengths, pad_to=pad_to)
        for bi, sid in enumerate(ids):
            name = os.path.splitext(os.path.basename(ds.file_paths[sid]))[0]
            c = curves[bi]
            np.save(os.path.join(args.out_dir, f"{name}_recon.npy"), c,
                    allow_pickle=False)
            gt = samples[bi]
            L = lengths[bi]
            _, _, rmsd = kabsch_align_np(c[:L, :3], gt[:L, :3])
            ss_acc = float(np.mean(
                np.argmax(c[:L, 3:6], -1) == np.argmax(gt[:L, 3:6], -1)))
            report.append({"name": name, "length": int(L),
                           "rmsd_aligned": rmsd, "ss_acc": ss_acc})
    agg = {
        "n": len(report),
        "rmsd_mean": float(np.mean([r["rmsd_aligned"] for r in report])),
        "ss_acc_mean": float(np.mean([r["ss_acc"] for r in report])),
    }
    with open(os.path.join(args.out_dir, "report.json"), "w") as f:
        json.dump({"aggregate": agg, "per_sample": report}, f, indent=2)
    print(f"[done] {agg}")


if __name__ == "__main__":
    main()
