#!/usr/bin/env python
"""Bond-length band statistics of model decodes vs ground truth.

Makes the stage-2 quality metric reproducible: the round-3 fine-tune
(BASELINE.md "Stage-2 physics-pinned fine-tune") reported the fraction
of quantized-decode bonds inside the legal [2.2, 5.5] A band, measured
ad hoc. This tool encodes a dataset split, optionally routes it through
the quantizer (the stage-2 generation path), decodes at true lengths,
and prints bond-length stats for decode and truth as one JSON line.

Reference analog: the bond statistics the filter computes per curve
(scripts/run_aeot_end2end.py:271-443) applied dataset-wide to decodes.

Usage:
  python scripts/analysis/bond_band_stats.py --config configs/synth_vq_ft.yaml \
      --ckpt checkpoints/synth_vq_ft/last [--split val] [--quantize auto] \
      [--band_min 2.2 --band_max 5.5] [--limit 512] [--out stats.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def bond_stats(curves, band_min: float, band_max: float) -> dict:
    """curves: list of [L_i, >=3] arrays; consecutive-point distances."""
    bl = np.concatenate([
        np.linalg.norm(np.diff(c[:, :3], axis=0), axis=-1)
        for c in curves if c.shape[0] >= 2])
    return {
        "num_bonds": int(bl.size),
        "mean": float(bl.mean()),
        "std": float(bl.std()),
        "min": float(bl.min()),
        "max": float(bl.max()),
        "frac_in_band": float(((bl >= band_min) & (bl <= band_max)).mean()),
        "frac_below": float((bl < band_min).mean()),
        "frac_above": float((bl > band_max).mean()),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, required=True)
    ap.add_argument("--ckpt", type=str, required=True)
    ap.add_argument("--split", type=str, default="val",
                    choices=["train", "val"])
    ap.add_argument("--quantize", type=str, default="auto",
                    choices=["auto", "on", "off"],
                    help="route z_e through the quantizer before decode "
                         "(auto = on iff the model has one)")
    ap.add_argument("--band_min", type=float, default=2.2)
    ap.add_argument("--band_max", type=float, default=5.5)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--limit", type=int, default=0,
                    help="cap the number of curves (0 = all)")
    ap.add_argument("--out", type=str, default="",
                    help="also write the JSON to this path")
    args = ap.parse_args()

    from pytorch_vae_tpu import config as cfglib
    from pytorch_vae_tpu.data.curves import CurveDataset, pad_batch
    from pytorch_vae_tpu.pipelines.inference import AEBundle

    bundle = AEBundle.from_checkpoint(args.config, args.ckpt)
    cfg = bundle.config
    dp = cfg["data_params"]
    list_name = dp["train_list"] if args.split == "train" else dp["val_list"]
    pad_to = int(cfg["model_params"].get("max_seq_len", 350))
    ds = CurveDataset(
        dp["npy_dir"],
        list_path=cfglib.resolve_path(dp["npy_dir"], list_name),
        train=args.split == "train", max_seq_len=pad_to)
    n = len(ds) if args.limit <= 0 else min(len(ds), args.limit)
    use_vq = (bundle.vq_state is not None if args.quantize == "auto"
              else args.quantize == "on")

    dec_curves, true_curves = [], []
    for i0 in range(0, n, args.batch_size):
        samples = [ds[i] for i in range(i0, min(n, i0 + args.batch_size))]
        lengths = np.asarray([s.shape[0] for s in samples])
        x, mask = pad_batch(samples, pad_to=pad_to)
        z = bundle.encode_tokens(x, mask)
        if use_vq:
            z, _ = bundle.quantize(z)
        dec_curves.extend(bundle.decode_curve6(z, lengths, pad_to=pad_to))
        true_curves.extend(samples)

    result = {
        "config": args.config, "ckpt": args.ckpt, "split": args.split,
        "quantized": bool(use_vq), "n_curves": len(dec_curves),
        "band": [args.band_min, args.band_max],
        "decode": bond_stats(dec_curves, args.band_min, args.band_max),
        "truth": bond_stats(true_curves, args.band_min, args.band_max),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
