#!/usr/bin/env python
"""Sample RVQ code sequences from a trained code prior.

Completes the learned unconditional generation path for stage-2 models
(train_code_prior.py docstring has the why). Output is a
decode_with_vqvae.py-compatible directory: indices/gen_*.npy token-major
global-flat [M*Q] int32 + manifest.jsonl with per-sample lengths drawn
from the training length histogram (or a fixed --length).

Usage:
  python scripts/sample_code_prior.py --prior_dir results/prior_huge \
      --n 256 --out_dir results/prior_huge/samples \
      [--temperature 1.0 --top_k 0 --top_p 0.0 --seed 0]
  python scripts/decode_with_vqvae.py --config ... --ckpt ... \
      --manifest results/prior_huge/samples/manifest.jsonl \
      --base_dir results/prior_huge/samples --out_dir ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_prior(prior_dir: str, which: str = "best"):
    """which: 'best' = best-val params (prior.npz), 'final' = last-epoch
    params (prior_final.npz — on a memorizable corpus this is the
    generatively useful selection; see train_code_prior.py)."""
    from flax.traverse_util import unflatten_dict

    from pytorch_vae_tpu.models.code_prior import CodePrior

    meta = json.load(open(os.path.join(prior_dir, "meta.json")))
    model = CodePrior(**meta["model"])
    fname = {"best": "prior.npz", "final": "prior_final.npz"}[which]
    path = os.path.join(prior_dir, fname)
    if not os.path.exists(path):
        raise SystemExit(f"{path} not found (which={which!r}; priors "
                         "trained before the final-params save only have "
                         "prior.npz)")
    raw = np.load(path)
    params = unflatten_dict({tuple(k.split("/")): raw[k] for k in raw.files})
    return model, {"params": params}, meta


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prior_dir", type=str, required=True)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--out_dir", type=str, required=True)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--top_k", type=int, default=0)
    ap.add_argument("--top_p", type=float, default=0.0,
                    help="nucleus sampling mass in (0,1); 0 disables")
    ap.add_argument("--length", type=int, default=0,
                    help="fixed curve length; 0 = draw from train histogram")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--params", type=str, default="best",
                    choices=["best", "final"],
                    help="which saved params to sample from (load_prior)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pytorch_vae_tpu.models.code_prior import sample_codes

    model, variables, meta = load_prior(args.prior_dir, which=args.params)
    rng = np.random.default_rng(args.seed)
    if args.length:
        lengths = np.full(args.n, args.length, np.int32)
    else:
        hist = np.asarray(meta["length_hist"], np.float64)
        lengths = rng.choice(len(hist), size=args.n,
                             p=hist / hist.sum()).astype(np.int32)

    os.makedirs(os.path.join(args.out_dir, "indices"), exist_ok=True)
    sample_jit = jax.jit(
        lambda k, l: sample_codes(model, variables, k, l,
                                  temperature=args.temperature,
                                  top_k=args.top_k, top_p=args.top_p))
    key = jax.random.PRNGKey(args.seed)
    manifest = os.path.join(args.out_dir, "manifest.jsonl")
    with open(manifest, "w") as mf:
        for start in range(0, args.n, args.batch):
            sel = slice(start, min(start + args.batch, args.n))
            key, sub = jax.random.split(key)
            codes = np.asarray(sample_jit(sub, jnp.asarray(lengths[sel])))
            for i in range(codes.shape[0]):
                name = f"gen_{start + i:05d}"
                np.save(os.path.join(args.out_dir, "indices",
                                     f"{name}.npy"), codes[i])
                mf.write(json.dumps(
                    {"name": name, "length": int(lengths[sel][i]),
                     "indices_path": f"indices/{name}.npy"}) + "\n")
    with open(os.path.join(args.out_dir, "meta.json"), "w") as f:
        json.dump({"prior_dir": os.path.abspath(args.prior_dir),
                   "params": args.params,
                   "n": args.n, "temperature": args.temperature,
                   "top_k": args.top_k, "top_p": args.top_p,
                   "seed": args.seed,
                   "source": meta.get("source")}, f, indent=1)
    print(f"[done] {args.n} sampled sequences -> {args.out_dir} "
          f"(decode with scripts/decode_with_vqvae.py)")


if __name__ == "__main__":
    main()
