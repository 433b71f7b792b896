#!/usr/bin/env python
"""Train the semi-discrete OT potential h over a latent bank.

The reference relied on an externally-trained h.pt from the AE-OT repo
(scripts/run_aeot_end2end.py:33, --ot_h). This native trainer makes the
pipeline self-contained: Adam ascent on the dual potential until every
Brenier cell receives ~uniform measure (pipelines/aeot.py).

Usage:
  python scripts/train_ot_potential.py --features results/latents.npz \
      --out results/h.npz [--iters 2000 --batch 8192 --source uniform01]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--features", type=str, required=True,
                    help="latent bank (.npz or reference .pt)")
    ap.add_argument("--out", type=str, required=True, help="output h (.npz)")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--lr", type=float, default=1e-2)
    ap.add_argument("--source", type=str, default="uniform01",
                    choices=["uniform01", "uniform", "gaussian"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from pytorch_vae_tpu.pipelines.aeot import (
        SemiDiscreteOT,
        load_latent_bank,
    )

    bank = load_latent_bank(args.features)
    P = np.asarray(bank["latents"], np.float32)
    print(f"[OT] bank: {P.shape[0]} cells, dim {P.shape[1]}")
    ot = SemiDiscreteOT(P=P, h=np.zeros(P.shape[0], np.float32),
                        source=args.source)
    h = ot.train_potential(jax.random.PRNGKey(args.seed), iters=args.iters,
                           batch=args.batch, lr=args.lr, verbose=True)
    out_dir = os.path.dirname(args.out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    np.savez(args.out, h=h, source=args.source)
    print(f"[OT] saved potential to {args.out} "
          f"(|h| mean {np.abs(h).mean():.4f})")


if __name__ == "__main__":
    main()
