#!/usr/bin/env python
"""Generation quality of unconditional VQ sampling (random codebook codes).

The reference exposes `VQVAE.sample` (models/vq_vae.py:1394-1422: one
random code per RVQ level, summed, decoded) but never measures what it
produces. This tool makes that a number: sample N curves via the model's
own `sample` path, run each through the AE-OT hard filter, and report
the keep-rate, reject taxonomy, and bond-band stats — the same metrics
the stage-2 capacity A/B uses for quantized-decode quality
(scripts/analysis/bond_band_stats.py), applied to pure code sampling.

Lengths are drawn (with replacement) from the chosen split's true length
distribution, mirroring how run_aeot_end2end interpolates bank lengths.

Usage:
  python scripts/analysis/vq_sample_quality.py \
      --config configs/synth_vq_ft2.yaml --ckpt checkpoints/synth_vq_ft2/last \
      [--n 512] [--seed 0] [--split val] [--out stats.json]
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
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--split", type=str, default="val",
                    choices=["train", "val"],
                    help="split whose length distribution to sample")
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--band_min", type=float, default=2.2)
    ap.add_argument("--band_max", type=float, default=5.5)
    ap.add_argument("--min_length", type=int, default=32,
                    help="filter's minimum length gate (fixtures use "
                         "shorter curves)")
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--prior_dir", type=str, default="",
                    help="trained code prior (scripts/train_code_prior.py "
                         "artifact); when set, codes are sampled from the "
                         "learned autoregressive prior instead of uniformly "
                         "— same decode/filter/stats, directly comparable")
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--top_k", type=int, default=0)
    args = ap.parse_args()

    from pytorch_vae_tpu import config as cfglib
    from pytorch_vae_tpu.data.curves import CurveDataset
    from pytorch_vae_tpu.pipelines.filtering import (REJECT_REASONS,
                                                     curve_pass_filter,
                                                     end2end_params)
    from pytorch_vae_tpu.pipelines.inference import AEBundle
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bond_band_stats import bond_stats  # noqa: E402

    bundle = AEBundle.from_checkpoint(args.config, args.ckpt)
    if bundle.vq_state is None:
        raise SystemExit("model has no quantizer; VQ sampling undefined")
    cfg = bundle.config
    dp = cfg["data_params"]
    list_name = dp["train_list"] if args.split == "train" else dp["val_list"]
    ds = CurveDataset(
        dp["npy_dir"],
        list_path=cfglib.resolve_path(dp["npy_dir"], list_name))
    true_lens = np.asarray([ds[i].shape[0] for i in range(len(ds))],
                           np.int64)  # ds[i] is the [L, 6] curve itself

    rng = np.random.default_rng(args.seed)
    lengths = rng.choice(true_lens, size=args.n, replace=True)
    m = bundle.model
    emb = np.asarray(bundle.vq_state.embedding)  # [Q*K, D] or [K, D]
    K = int(m.codebook_size)
    Q = int(m.num_quantizers) if m.is_residual else 1

    prior_sample = None
    if args.prior_dir:
        import jax
        import jax.numpy as jnp
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))))
        from sample_code_prior import load_prior  # noqa: E402

        from pytorch_vae_tpu.models.code_prior import sample_codes
        pm, pvars, pmeta = load_prior(args.prior_dir)
        if (pm.num_q, pm.k_per, pm.n_tokens) != \
                (Q, K, bundle.latent_tokens):
            raise RuntimeError(
                "prior/model shape mismatch: prior %r vs model %r" % (
                    (pm.num_q, pm.k_per, pm.n_tokens),
                    (Q, K, bundle.latent_tokens)))
        jit_sample = jax.jit(lambda k, l: sample_codes(
            pm, pvars, k, l, temperature=args.temperature,
            top_k=args.top_k))
        pkey = jax.random.PRNGKey(args.seed)

        def prior_sample(ls):
            nonlocal pkey
            pkey, sub = jax.random.split(pkey)
            # pad a final partial batch to batch_size (repeat last length)
            # so jit_sample sees ONE static shape — a shape change would
            # recompile, costly on the remote-compile axon backend
            # (mirrors run_aeot_end2end.py's fixed-chunk sampling)
            n = len(ls)
            if n < args.batch_size:
                ls = np.concatenate(
                    [ls, np.full(args.batch_size - n, ls[-1], ls.dtype)])
            flat = np.asarray(jit_sample(sub, jnp.asarray(ls)))  # [B, M*Q]
            # token-major global flat -> summed code vectors [B, M, D]
            return emb[flat.reshape(len(ls), bundle.latent_tokens, Q)
                       ].sum(axis=2).astype(np.float32)[:n]

    params = end2end_params(min_length=args.min_length)
    kept, rejects = 0, {r: 0 for r in REJECT_REASONS}
    kept_curves = []
    for lo in range(0, args.n, args.batch_size):
        ls = lengths[lo: lo + args.batch_size]
        B = len(ls)
        if prior_sample is not None:
            z_q = prior_sample(ls)
        else:
            # one random code per level, summed (VQVAE.sample semantics,
            # reference models/vq_vae.py:1403-1414) — host-side so the
            # tool runs on any backend without tracing the sample method
            z_q = np.zeros((B, bundle.latent_tokens, bundle.code_dim),
                           np.float32)
            for lvl in range(Q):
                idx = rng.integers(0, K, size=(B, bundle.latent_tokens))
                z_q += emb[lvl * K: (lvl + 1) * K][idx]
        curves = bundle.decode_curve6(
            z_q, ls, pad_to=int(m.max_seq_len))
        for c in curves:
            ok, _stats, reason = curve_pass_filter(c, params)
            if ok:
                kept += 1
                kept_curves.append(c)
            else:
                rejects[reason] += 1

    all_curves = kept_curves if kept_curves else []
    res = {
        "config": args.config,
        "ckpt": args.ckpt,
        "n_sampled": args.n,
        "sampler": ({"prior_dir": args.prior_dir,
                     "temperature": args.temperature, "top_k": args.top_k}
                    if args.prior_dir else "uniform"),
        "codebook": {"levels": Q, "codes_per_level": K,
                     "bits_per_curve":
                         int(bundle.latent_tokens * Q * np.log2(K))},
        "kept": kept,
        "keep_rate": kept / args.n,
        "reject_counts": {k: v for k, v in rejects.items() if v},
        "kept_bond_stats": (bond_stats(all_curves, args.band_min,
                                       args.band_max)
                            if all_curves else None),
    }
    line = json.dumps(res)
    print(line)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
