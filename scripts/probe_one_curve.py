#!/usr/bin/env python
"""Round-trip one real curve through encode -> (quantize) -> decode, with
RMSD/SS accuracy report and optional plots.

Parity target: scripts/probe_one_curve_fixed.py — the manual smoke test of
the full model path on a single sample (SURVEY.md §4 "manual probe
scripts = smoke tests").

Usage:
  python scripts/probe_one_curve.py --config configs/stage2_vq.yaml \
      --ckpt checkpoints/stage2_vq/last --curve data/curves/curve_00000.npy \
      [--plot out.png]
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
    ap.add_argument("--curve", type=str, required=True)
    ap.add_argument("--plot", type=str, default="")
    args = ap.parse_args()

    from pytorch_vae_tpu.data.curves import load_curve_npy
    from pytorch_vae_tpu.pipelines.inference import AEBundle
    from pytorch_vae_tpu.serving.pdb_utils import kabsch_align_np

    bundle = AEBundle.from_checkpoint(args.config, args.ckpt)
    coords, ss = load_curve_npy(args.curve)
    coords = coords - coords.mean(axis=0, keepdims=True)
    L = coords.shape[0]
    pad_to = int(bundle.model.max_seq_len)
    x = np.zeros((1, pad_to, 6), np.float32)
    x[0, :L, :3] = coords
    x[0, :L, 3:] = ss
    mask = np.zeros((1, pad_to), bool)
    mask[0, :L] = True

    z_e = bundle.encode_tokens(x, mask)
    print(f"[probe] z_e tokens: {z_e.shape}, "
          f"norm mean {np.linalg.norm(z_e[0], axis=-1).mean():.3f}")
    if bundle.vq_state is not None:
        z_q, idx = bundle.quantize(z_e)
        n_unique = len(np.unique(np.asarray(idx)))
        print(f"[probe] quantized: {n_unique} unique codes, "
              f"commit MSE {np.mean((z_q - z_e) ** 2):.5f}")
        z_dec = z_q
    else:
        z_dec = z_e

    recons = bundle.decode(z_dec, mask)[0]
    re_xyz = recons[:L, :3]
    re_ss = np.argmax(recons[:L, 3:], axis=-1)
    gt_ss = np.argmax(ss, axis=-1)

    rmsd_raw = float(np.sqrt(np.mean(np.sum((re_xyz - coords) ** 2, -1))))
    R, t, rmsd_aln = kabsch_align_np(re_xyz, coords)
    ss_acc = float(np.mean(re_ss == gt_ss))
    print(f"[probe] L={L} RMSD raw={rmsd_raw:.3f} A aligned={rmsd_aln:.3f} A"
          f"  SS acc={ss_acc:.3f}")

    if args.plot:
        from scripts.visualize_curves import render  # type: ignore

        aligned = re_xyz @ R + t
        both = np.concatenate([coords, aligned], axis=0)
        ss_both = np.concatenate([gt_ss, re_ss + 0])
        render(both, ss_both, args.plot,
               title=f"gt+recon rmsd={rmsd_aln:.2f}A")
        print(f"[probe] plot -> {args.plot}")


if __name__ == "__main__":
    main()
