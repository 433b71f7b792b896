#!/usr/bin/env python
"""Train the autoregressive code prior on extracted RVQ indices.

New capability beyond the reference framework (which samples stage-2
codes uniformly per level — reference vqvae.py sample(); measured 0-1.2%
keep, results/mixstats_r3/vqsample_*.json): fit models/code_prior.py's
causal LM to the token-major sequences exported by
scripts/extract_code_indices.py, giving VQ models a real unconditional
generation path (sample_code_prior.py -> decode_with_vqvae.py -> filter).

Usage:
  python scripts/train_code_prior.py --codes_dir results/codes_huge \
      --out results/prior_huge [--epochs 200 --batch 64 --lr 3e-4]

Artifact: <out>/prior.npz (flat params) + <out>/meta.json (model config,
length histogram for sampling, provenance, metrics) + train_log.jsonl.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_codes_dir(codes_dir: str):
    """manifest.jsonl + indices/*.npy -> (codes [N,T] global-flat, len [N])."""
    manifest = os.path.join(codes_dir, "manifest.jsonl")
    meta = json.load(open(os.path.join(codes_dir, "meta.json")))
    Q = int(meta["num_quantizers"])
    K = int(meta["codes_per_level"])
    rows, lens = [], []
    with open(manifest) as f:
        for line in f:
            rec = json.loads(line)
            idx = np.load(os.path.join(codes_dir, rec["indices_path"]))
            rows.append(np.asarray(idx, np.int32).reshape(-1))
            lens.append(int(rec["length"]))
    codes = np.stack(rows)
    # normalize to global flat indices (decode_with_vqvae.py's heuristic:
    # all-values-below-K means per-level layout)
    if Q > 1 and codes.max() < K:
        codes = codes + (np.arange(codes.shape[1], dtype=np.int32) % Q) * K
    return codes, np.asarray(lens, np.int32), meta


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--codes_dir", type=str, required=True,
                    help="extract_code_indices.py output dir")
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--weight_decay", type=float, default=1e-2)
    ap.add_argument("--d_model", type=int, default=256)
    ap.add_argument("--n_layers", type=int, default=4)
    ap.add_argument("--n_heads", type=int, default=4)
    ap.add_argument("--dropout", type=float, default=0.1)
    ap.add_argument("--val_frac", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from flax.traverse_util import flatten_dict

    from pytorch_vae_tpu.models.code_prior import CodePrior, code_prior_loss

    codes, lengths, src_meta = load_codes_dir(args.codes_dir)
    N, T = codes.shape
    Q = int(src_meta["num_quantizers"])
    K = int(src_meta["codes_per_level"])
    M = T // Q
    assert M * Q == T, (M, Q, T)
    lmin, lmax = int(lengths.min()), int(lengths.max())

    rng = np.random.default_rng(args.seed)
    perm = rng.permutation(N)
    n_val = max(1, int(round(args.val_frac * N)))
    vi, ti = perm[:n_val], perm[n_val:]
    print(f"[data] {len(ti)} train / {len(vi)} val sequences, T={T} "
          f"(M={M} x Q={Q}), K={K}, lengths {lmin}-{lmax}")

    model = CodePrior(n_tokens=M, num_q=Q, k_per=K, d_model=args.d_model,
                      n_layers=args.n_layers, n_heads=args.n_heads,
                      dropout=args.dropout, min_len=lmin,
                      max_len=max(lmax, lmin + 1))
    key = jax.random.PRNGKey(args.seed)
    variables = model.init(key, jnp.zeros((1, T), jnp.int32),
                           jnp.zeros((1,), jnp.int32))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    print(f"[model] {n_params:,} params")

    steps_per_epoch = max(1, len(ti) // args.batch)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, warmup_steps=min(100, steps_per_epoch),
        decay_steps=max(2, args.epochs * steps_per_epoch))
    tx = optax.adamw(sched, weight_decay=args.weight_decay)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def train_step(params, opt_state, batch_codes, batch_len, dkey):
        def loss_fn(p):
            return code_prior_loss(model, {"params": p}, batch_codes,
                                   batch_len, rngs={"dropout": dkey},
                                   deterministic=False)
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, aux

    @jax.jit
    def eval_step(params, batch_codes, batch_len):
        _, aux = code_prior_loss(model, {"params": params}, batch_codes,
                                 batch_len, deterministic=True)
        return aux

    os.makedirs(args.out, exist_ok=True)
    log_path = os.path.join(args.out, "train_log.jsonl")
    params = variables["params"]
    best = float("inf")
    best_params = params
    with open(log_path, "w") as logf:
        for epoch in range(args.epochs):
            order = rng.permutation(len(ti))
            tl = []
            for s in range(steps_per_epoch):
                sel = ti[order[s * args.batch:(s + 1) * args.batch]]
                if len(sel) == 0:
                    continue
                key, dkey = jax.random.split(key)
                params, opt_state, aux = train_step(
                    params, opt_state, jnp.asarray(codes[sel]),
                    jnp.asarray(lengths[sel]), dkey)
                tl.append(float(aux["loss"]))
            va = eval_step(params, jnp.asarray(codes[vi]),
                           jnp.asarray(lengths[vi]))
            row = {"epoch": epoch, "train_loss": float(np.mean(tl)),
                   "val_loss": float(va["loss"]),
                   "val_acc": float(va["acc"]),
                   "val_ppl_per_pos": float(va["ppl_per_pos"])}
            logf.write(json.dumps(row) + "\n")
            logf.flush()
            if row["val_loss"] < best:
                best = row["val_loss"]
                best_params = jax.tree_util.tree_map(np.asarray, params)
            if epoch % 10 == 0 or epoch == args.epochs - 1:
                print(f"[ep {epoch:4d}] train {row['train_loss']:.4f} "
                      f"val {row['val_loss']:.4f} acc {row['val_acc']:.3f}")

    # Save BOTH selections. On a memorizable (tiny) corpus the best-val
    # model is near-uniform (val never beats ln K by much) while the
    # FINAL model memorizes the training sequences — for unconditional
    # *generation* the final model at reduced temperature is the useful
    # sampler, and the honest tradeoff (novelty vs geometry quality) is
    # measured downstream by vq_sample_quality's novelty metrics.
    flat = {"/".join(k): np.asarray(v) for k, v in
            flatten_dict(best_params).items()}
    np.savez(os.path.join(args.out, "prior.npz"), **flat)
    flat_final = {"/".join(k): np.asarray(v) for k, v in
                  flatten_dict(jax.tree_util.tree_map(
                      np.asarray, params)).items()}
    np.savez(os.path.join(args.out, "prior_final.npz"), **flat_final)
    hist = np.bincount(lengths, minlength=lmax + 1)
    out_meta = {
        "model": {"n_tokens": M, "num_q": Q, "k_per": K,
                  "d_model": args.d_model, "n_layers": args.n_layers,
                  "n_heads": args.n_heads, "dropout": args.dropout,
                  "n_len_buckets": model.n_len_buckets,
                  "min_len": lmin, "max_len": max(lmax, lmin + 1)},
        "length_hist": hist.tolist(),
        "source": {"codes_dir": os.path.abspath(args.codes_dir),
                   **{k: src_meta.get(k) for k in
                      ("config", "ckpt", "ckpt_sha256")}},
        "best_val_loss": best,
        "final_train_loss": row["train_loss"],
        "final_val_loss": row["val_loss"],
        "uniform_nats_per_pos": float(np.log(K)),
    }
    with open(os.path.join(args.out, "meta.json"), "w") as f:
        json.dump(out_meta, f, indent=1)
    print(f"[done] best val {best:.4f} nats/pos "
          f"(uniform = {np.log(K):.4f}) -> {args.out}")


if __name__ == "__main__":
    main()
