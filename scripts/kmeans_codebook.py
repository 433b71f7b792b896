#!/usr/bin/env python
"""K-means codebook initialization from extracted latents.

The reference's stage-2 runs warm-start with kmeans centroids computed
offline (`--init_codebook scripts/kmeans_residual_centroids_L4x1024x512.npy`,
run.py usage header) but the kmeans producer itself was never committed.
This native version computes either:

  - flat kmeans:      [K, D] centroids over all latent token vectors, or
  - residual kmeans:  [L, K_per, D] — level l clusters the residuals left
    after snapping to levels < l, matching residual-VQ structure.

Runs as jit-compiled kmeans iterations on TPU (distance matmul on the MXU
via the same fused nearest-code kernel the quantizer uses).

Usage:
  python scripts/kmeans_codebook.py --latents results/latents.npz \
      --out centroids.npy --codes 1024 --levels 4 --code_dim 512
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def kmeans(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Standard kmeans with kmeans++-lite init and dead-centroid respawn."""
    import jax
    import jax.numpy as jnp

    from pytorch_vae_tpu.ops.vq_pallas import nearest_codes

    rng = np.random.default_rng(seed)
    n = x.shape[0]
    cent = x[rng.choice(n, size=min(k, n), replace=False)].copy()
    if cent.shape[0] < k:  # fewer points than centroids: pad with noise
        extra = cent[rng.integers(0, cent.shape[0], k - cent.shape[0])]
        cent = np.concatenate([cent, extra + rng.normal(
            scale=1e-3, size=extra.shape).astype(np.float32)])

    assign = jax.jit(lambda f, e: nearest_codes(f, e)[0])
    xj = jnp.asarray(x)
    for it in range(iters):
        idx = np.asarray(assign(xj, jnp.asarray(cent)))
        sums = np.zeros_like(cent)
        counts = np.zeros(k)
        np.add.at(sums, idx, x)
        np.add.at(counts, idx, 1.0)
        dead = counts == 0
        nz = ~dead
        cent[nz] = sums[nz] / counts[nz, None]
        if dead.any():  # respawn dead centroids on random points
            cent[dead] = x[rng.integers(0, n, int(dead.sum()))]
    return cent


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--latents", type=str, required=True,
                    help="latent bank (.npz/.pt with latents [N, Dflat]) or "
                         "an extract_code_indices latents/ dir")
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--codes", type=int, required=True,
                    help="codes per level (K or K_per)")
    ap.add_argument("--levels", type=int, default=1,
                    help=">1 produces residual centroids [L, K_per, D]")
    ap.add_argument("--code_dim", type=int, required=True,
                    help="token code dimension D (flat latents are "
                         "reshaped to [-1, D])")
    ap.add_argument("--iters", type=int, default=25)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max_points", type=int, default=200_000)
    args = ap.parse_args()

    from pytorch_vae_tpu.pipelines.aeot import load_latent_bank

    if os.path.isdir(args.latents):
        rows = [np.load(os.path.join(args.latents, f))
                for f in sorted(os.listdir(args.latents))
                if f.endswith(".npy")]
        x = np.concatenate([r.reshape(-1, args.code_dim) for r in rows])
    else:
        bank = load_latent_bank(args.latents)
        x = np.asarray(bank["latents"], np.float32)
        x = x.reshape(-1, args.code_dim)
    rng = np.random.default_rng(args.seed)
    if x.shape[0] > args.max_points:
        x = x[rng.choice(x.shape[0], args.max_points, replace=False)]
    print(f"[kmeans] {x.shape[0]} token vectors of dim {x.shape[1]}")

    if args.levels <= 1:
        C = kmeans(x, args.codes, args.iters, args.seed)
    else:
        # residual kmeans: cluster what the previous levels left behind
        levels = []
        resid = x.copy()
        for lvl in range(args.levels):
            C_l = kmeans(resid, args.codes, args.iters, args.seed + lvl)
            levels.append(C_l)
            # subtract nearest centroid from each point
            import jax
            import jax.numpy as jnp

            from pytorch_vae_tpu.ops.vq_pallas import nearest_codes

            idx = np.asarray(jax.jit(
                lambda f, e: nearest_codes(f, e)[0])(
                jnp.asarray(resid), jnp.asarray(C_l)))
            resid = resid - C_l[idx]
            print(f"[kmeans] level {lvl}: residual RMS "
                  f"{np.sqrt((resid ** 2).mean()):.5f}")
        C = np.stack(levels)  # [L, K_per, D]

    np.save(args.out, C.astype(np.float32))
    print(f"[done] centroids {C.shape} -> {args.out}")


if __name__ == "__main__":
    main()
