#!/usr/bin/env python
"""Alternative OMT sampling path: extended top-k neighbor sampling.

Parity target: scripts/sample_with_aeot_omt.py — sampling through a
`SemiDiscreteOMT.sample_extended(k_neighbors, theta_deg)` surface with
optional latent normalization and length sampling from the stored discrete
length distribution (reference :98-123, 205-218). The OT implementation is
native (pipelines/aeot.py) rather than the absent external module.

Usage:
  python scripts/sample_with_aeot_omt.py --config configs/stage1_ae.yaml \
      --ckpt checkpoints/stage1_ae/last --features results/latents.npz \
      --ot_h results/h.npz --out_dir results/omt_samples \
      --num_samples 100 --k_neighbors 3 --theta_deg 25
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
    ap.add_argument("--features", type=str, required=True)
    ap.add_argument("--ot_h", type=str, required=True)
    ap.add_argument("--out_dir", type=str, required=True)
    ap.add_argument("--num_samples", type=int, default=100,
                    help="source samples drawn (output count is after the "
                         "angle filter + dedup)")
    ap.add_argument("--k_neighbors", type=int, default=2)
    ap.add_argument("--theta_deg", type=float, default=20.0)
    ap.add_argument("--normalize_latents", action="store_true",
                    help="z-score the bank with its stored mean/std before "
                         "OT, then de-normalize the interpolants")
    ap.add_argument("--length_mode", type=str, default="interp",
                    choices=["interp", "distribution"],
                    help="interp: convex-combine pair lengths; "
                         "distribution: draw from the bank's empirical "
                         "length distribution")
    ap.add_argument("--source", type=str, default="uniform01",
                    choices=["uniform01", "uniform", "gaussian"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch_size", type=int, default=64)
    args = ap.parse_args()

    import jax

    from pytorch_vae_tpu.pipelines.aeot import (
        SemiDiscreteOT,
        load_latent_bank,
        load_potential,
    )
    from pytorch_vae_tpu.pipelines.inference import AEBundle

    bundle = AEBundle.from_checkpoint(args.config, args.ckpt)
    bank = load_latent_bank(args.features)
    P = np.asarray(bank["latents"], np.float32)
    lengths_bank = np.asarray(bank["lengths"]).reshape(-1).astype(np.int64)
    if P.shape[1] != bundle.flat_dim:
        raise RuntimeError(f"bank dim {P.shape[1]} != model "
                           f"{bundle.flat_dim}")
    mean = np.asarray(bank.get("mean", np.zeros(P.shape[1])), np.float32)
    std = np.asarray(bank.get("std", np.ones(P.shape[1])), np.float32)
    if args.normalize_latents:
        P_ot = (P - mean) / std
    else:
        P_ot = P
    h = load_potential(args.ot_h, n=P.shape[0])
    ot = SemiDiscreteOT(P=P_ot, h=h, source=args.source)

    out = ot.sample_extended(jax.random.PRNGKey(args.seed),
                             args.num_samples, args.k_neighbors,
                             args.theta_deg)
    lat = out["latents"]
    pairs = out["pair_idx"]
    w = out["weights"]
    if args.normalize_latents:
        lat = lat * std + mean
    M = lat.shape[0]
    print(f"[info] {M} samples after angle filter + dedup "
          f"(k={args.k_neighbors}, theta={args.theta_deg} deg)")
    if M == 0:
        return

    if args.length_mode == "interp":
        lens = np.round(lengths_bank[pairs[:, 0]] * w
                        + lengths_bank[pairs[:, 1]] * (1 - w))
    else:
        rng = np.random.default_rng(args.seed)
        lens = rng.choice(lengths_bank, size=M)
    lens = np.clip(lens, 1, int(bundle.model.max_seq_len)).astype(np.int64)

    os.makedirs(args.out_dir, exist_ok=True)
    manifest = os.path.join(args.out_dir, "manifest.jsonl")
    pad_to = int(bundle.model.max_seq_len)
    with open(manifest, "w") as mf:
        for i0 in range(0, M, args.batch_size):
            i1 = min(M, i0 + args.batch_size)
            zt = lat[i0:i1].reshape(i1 - i0, bundle.latent_tokens,
                                    bundle.code_dim)
            curves = bundle.decode_curve6(zt, lens[i0:i1], pad_to=pad_to)
            for bi, c in enumerate(curves):
                gi = i0 + bi
                path = os.path.join(args.out_dir, f"omt_{gi:06d}.npy")
                np.save(path, {"curve_coords": c[:, :3],
                               "ss_one_hot": c[:, 3:6]}, allow_pickle=True)
                mf.write(json.dumps({
                    "i": gi, "path": path, "length": int(lens[gi]),
                    "pair": [int(pairs[gi, 0]), int(pairs[gi, 1])],
                    "weight": float(w[gi])}) + "\n")
    print(f"[done] saved {M} samples -> {args.out_dir}")


if __name__ == "__main__":
    main()
