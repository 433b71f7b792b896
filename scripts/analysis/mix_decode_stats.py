#!/usr/bin/env python
"""Geometry quality of decodes of INTERPOLATED latents (the AE-OT
generation region), measured directly — no OT stage needed.

AE-OT generation decodes convex combinations of bank latents
(pipelines/aeot.py::sample_extended; reference run_aeot_end2end.py
top-2 path), a region recon-side losses never see. This tool encodes a
dataset split, convex-combines latent pairs (random or nearest — the
two partner modes of the mixup-geometry training loss), decodes the
mixes, and runs the AE-OT filter's per-curve checks on them. The
per-reject-class counts predict the end2end keep-rate A/B without
running the OT stage, so checkpoints can be compared on CPU.

Usage:
  python scripts/analysis/mix_decode_stats.py --config cfg.yaml \
      --ckpt ckpt/last [--n_mix 256] [--pairs random|nearest] \
      [--split val] [--seed 0] [--out stats.json]
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
    ap.add_argument("--split", type=str, default="val",
                    choices=["train", "val"])
    ap.add_argument("--n_mix", type=int, default=256)
    ap.add_argument("--pairs", type=str, default="random",
                    choices=["random", "nearest"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()

    from pytorch_vae_tpu import config as cfglib
    from pytorch_vae_tpu.data.curves import CurveDataset, pad_batch
    from pytorch_vae_tpu.pipelines import filtering
    from pytorch_vae_tpu.pipelines.inference import AEBundle

    rng = np.random.default_rng(args.seed)
    bundle = AEBundle.from_checkpoint(args.config, args.ckpt)
    cfg = bundle.config
    dp = cfg["data_params"]
    list_name = dp["train_list"] if args.split == "train" else dp["val_list"]
    pad_to = int(cfg["model_params"].get("max_seq_len", 350))
    ds = CurveDataset(
        dp["npy_dir"],
        list_path=cfglib.resolve_path(dp["npy_dir"], list_name),
        train=args.split == "train", max_seq_len=pad_to)

    # encode the split into a latent bank with lengths
    zs, lengths = [], []
    for i0 in range(0, len(ds), args.batch_size):
        samples = [ds[i] for i in range(i0, min(len(ds), i0 + args.batch_size))]
        x, mask = pad_batch(samples, pad_to=pad_to)
        zs.append(bundle.encode_tokens(x, mask))
        lengths.extend(s.shape[0] for s in samples)
    z = np.concatenate(zs, axis=0)            # [N, T, D]
    lengths = np.asarray(lengths)
    n = z.shape[0]

    ia = rng.integers(0, n, size=args.n_mix)
    if args.pairs == "nearest":
        zf = z.reshape(n, -1)
        sq = np.sum(zf * zf, axis=1)
        ib = np.empty_like(ia)
        for j, i in enumerate(ia):             # O(n) per probe, n is small
            d2 = sq + sq[i] - 2.0 * (zf @ zf[i])
            d2[i] = np.inf
            ib[j] = int(np.argmin(d2))
    else:
        ib = rng.integers(0, n, size=args.n_mix)
        ib = np.where(ib == ia, (ib + 1) % n, ib)
    w = rng.uniform(size=(args.n_mix, 1, 1)).astype(np.float32)
    z_mix = w * z[ia] + (1.0 - w) * z[ib]
    # generated length: interpolate the pair lengths (matches the
    # end2end path's per-sample length model closely enough for stats)
    mix_len = np.maximum(
        2, np.round(w[:, 0, 0] * lengths[ia]
                    + (1.0 - w[:, 0, 0]) * lengths[ib])).astype(np.int64)

    params = filtering.end2end_params()
    counts = {"pass": 0, "bond_out": 0, "angle_out": 0,
              "point_collision": 0, "segment_collision": 0, "other": 0}
    bond_all = []
    for i0 in range(0, args.n_mix, args.batch_size):
        sl = slice(i0, min(args.n_mix, i0 + args.batch_size))
        curves = bundle.decode_curve6(z_mix[sl], mix_len[sl], pad_to=pad_to)
        for c in curves:
            ok, _stats, reason = filtering.curve_pass_filter(c, params)
            if ok:
                counts["pass"] += 1
            else:
                counts[reason if reason in counts else "other"] = \
                    counts.get(reason if reason in counts else "other", 0) + 1
            bond_all.append(
                np.linalg.norm(np.diff(c[:, :3], axis=0), axis=-1))
    bl = np.concatenate(bond_all)
    result = {
        "config": args.config, "ckpt": args.ckpt, "pairs": args.pairs,
        "n_mix": args.n_mix, "seed": args.seed,
        "keep_rate": counts["pass"] / args.n_mix,
        "reject_counts": {k: v for k, v in counts.items() if k != "pass"},
        "mix_bond": {"mean": float(bl.mean()), "min": float(bl.min()),
                     "max": float(bl.max()),
                     "frac_legal": float(((bl >= params.bond_min_allowed)
                                          & (bl <= params.bond_max_allowed)
                                          ).mean())},
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
