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
    ap.add_argument("--top_p", type=float, default=0.0,
                    help="nucleus sampling mass in (0,1); 0 disables")
    ap.add_argument("--prior_params", type=str, default="best",
                    choices=["best", "final"],
                    help="which prior params to sample (sample_code_prior."
                         "load_prior): 'final' is the memorizing model — "
                         "the generatively useful one on a tiny corpus")
    ap.add_argument("--recon", action="store_true",
                    help="reconstruction-ceiling arm: encode+quantize+"
                         "decode the split's REAL curves through the same "
                         "filter/stats — no sampler can beat this")
    ap.add_argument("--novelty_codes_dir", type=str, default="",
                    help="extract_code_indices.py dir of TRAINING codes "
                         "for novelty metrics (default: the prior's own "
                         "source codes_dir when --prior_dir is set)")
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
        pm, pvars, pmeta = load_prior(args.prior_dir,
                                      which=args.prior_params)
        if not args.novelty_codes_dir:
            src_codes = (pmeta.get("source") or {}).get("codes_dir", "")
            if src_codes and os.path.isdir(src_codes):
                args.novelty_codes_dir = src_codes
        if (pm.num_q, pm.k_per, pm.n_tokens) != \
                (Q, K, bundle.latent_tokens):
            raise RuntimeError(
                "prior/model shape mismatch: prior %r vs model %r" % (
                    (pm.num_q, pm.k_per, pm.n_tokens),
                    (Q, K, bundle.latent_tokens)))
        jit_sample = jax.jit(lambda k, l: sample_codes(
            pm, pvars, k, l, temperature=args.temperature,
            top_k=args.top_k, top_p=args.top_p))
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
            flat = flat[:n]
            # token-major global flat -> summed code vectors [B, M, D]
            z = emb[flat.reshape(n, bundle.latent_tokens, Q)
                    ].sum(axis=2).astype(np.float32)
            return z, flat

    pad_to = int(m.max_seq_len)
    params = end2end_params(min_length=args.min_length)
    kept, rejects = 0, {r: 0 for r in REJECT_REASONS}
    all_curves, all_codes = [], []

    if args.recon:
        # ceiling arm: real curves through encode -> quantize -> decode
        from pytorch_vae_tpu.data.curves import pad_batch
        n_eff = min(args.n, len(ds))
        for lo in range(0, n_eff, args.batch_size):
            samples = [ds[i][:pad_to] for i in range(lo, min(
                n_eff, lo + args.batch_size))]  # head-truncate like
            # bond_band_stats' max_seq_len so pad_batch never overflows
            ls = np.asarray([s.shape[0] for s in samples])
            x, mask = pad_batch(samples, pad_to=pad_to)
            z_e = bundle.encode_tokens(x, mask)
            z_q, idx = bundle.quantize(z_e)
            # level-major flat [Q*B*N] -> token-major global flat [B, M*Q]
            if Q > 1:
                per = np.asarray(idx).reshape(Q, len(samples),
                                              bundle.latent_tokens)
                flat = (per + (np.arange(Q)[:, None, None] * K)
                        ).transpose(1, 2, 0).reshape(len(samples), -1)
            else:
                flat = np.asarray(idx).reshape(len(samples), -1)
            all_codes.append(flat.astype(np.int32))
            all_curves.extend(bundle.decode_curve6(z_q, ls, pad_to=pad_to))
    else:
        for lo in range(0, args.n, args.batch_size):
            ls = lengths[lo: lo + args.batch_size]
            B = len(ls)
            if prior_sample is not None:
                z_q, flat = prior_sample(ls)
            else:
                # one random code per level, summed (VQVAE.sample
                # semantics, reference models/vq_vae.py:1403-1414) —
                # host-side so the tool runs on any backend without
                # tracing the sample method
                z_q = np.zeros((B, bundle.latent_tokens, bundle.code_dim),
                               np.float32)
                per = np.zeros((B, bundle.latent_tokens, Q), np.int32)
                for lvl in range(Q):
                    idx = rng.integers(0, K, size=(B, bundle.latent_tokens))
                    z_q += emb[lvl * K: (lvl + 1) * K][idx]
                    per[:, :, lvl] = idx + lvl * K
                flat = per.reshape(B, -1)
            all_codes.append(np.asarray(flat, np.int32))
            all_curves.extend(bundle.decode_curve6(z_q, ls, pad_to=pad_to))

    kept_curves = []
    for c in all_curves:
        ok, _stats, reason = curve_pass_filter(c, params)
        if ok:
            kept += 1
            kept_curves.append(c)
        else:
            rejects[reason] += 1

    # distributional bond stats over ALL decodes (the strict any-bond-out
    # filter saturates at 0 keep whenever the stage-2 decoder's own
    # reconstruction floor is below 100% in-band — these distinguish the
    # arms even then)
    per_curve_frac, per_curve_legal = [], []
    for c in all_curves:
        bl = np.linalg.norm(np.diff(c[:, :3], axis=0), axis=-1)
        inb = (bl >= args.band_min) & (bl <= args.band_max)
        per_curve_frac.append(float(inb.mean()))
        per_curve_legal.append(bool(inb.all()))
    pcf = np.asarray(per_curve_frac)

    novelty = None
    codes_arr = np.concatenate(all_codes) if all_codes else None
    if args.novelty_codes_dir and codes_arr is not None:
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from train_code_prior import load_codes_dir  # noqa: E402
        train_codes, _tl, _tm = load_codes_dir(args.novelty_codes_dir)
        if train_codes.shape[1] == codes_arr.shape[1]:
            best_ov = np.zeros(len(codes_arr))
            for lo in range(0, len(codes_arr), 64):
                chunk = codes_arr[lo: lo + 64]
                ov = (chunk[:, None, :] == train_codes[None]).mean(-1)
                best_ov[lo: lo + len(chunk)] = ov.max(1)
            novelty = {
                "train_sequences": int(len(train_codes)),
                "exact_match_frac": float((best_ov == 1.0).mean()),
                "nn_token_overlap": {
                    "mean": float(best_ov.mean()),
                    "p50": float(np.quantile(best_ov, 0.5)),
                    "p90": float(np.quantile(best_ov, 0.9)),
                    "max": float(best_ov.max()),
                },
            }

    if args.recon:
        sampler = "reconstruction_ceiling"
    elif args.prior_dir:
        sampler = {"prior_dir": args.prior_dir,
                   "params": args.prior_params,
                   "temperature": args.temperature, "top_k": args.top_k,
                   "top_p": args.top_p}
    else:
        sampler = "uniform"
    res = {
        "config": args.config,
        "ckpt": args.ckpt,
        "n_sampled": len(all_curves),
        "sampler": sampler,
        "codebook": {"levels": Q, "codes_per_level": K,
                     "bits_per_curve":
                         int(bundle.latent_tokens * Q * np.log2(K))},
        "kept": kept,
        "keep_rate": kept / max(1, len(all_curves)),
        "reject_counts": {k: v for k, v in rejects.items() if v},
        "decode_bond_stats": bond_stats(all_curves, args.band_min,
                                        args.band_max),
        "per_curve_frac_in_band": {
            "mean": float(pcf.mean()),
            "p10": float(np.quantile(pcf, 0.1)),
            "p50": float(np.quantile(pcf, 0.5)),
            "p90": float(np.quantile(pcf, 0.9)),
        },
        "curve_bond_legal_rate": float(np.mean(per_curve_legal)),
        "novelty": novelty,
        "kept_bond_stats": (bond_stats(kept_curves, args.band_min,
                                       args.band_max)
                            if kept_curves else None),
    }
    line = json.dumps(res)
    print(line)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
