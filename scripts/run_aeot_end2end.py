#!/usr/bin/env python
"""End-to-end AE-OT generation pipeline (one-shot).

OT-sample latents -> decode to curves -> filter once -> save outputs.
TPU-native rebuild of the reference pipeline with the same CLI surface and
output tree (scripts/run_aeot_end2end.py):

  run_dir/
    filtered_npy/              accepted curves as [L, 6] npy
    filtered_manifest.jsonl    one JSON record per accepted curve
    rejected_npy/ + rejected_manifest.jsonl
    summary.json               counts, reject histogram, timing_sec
    args.json

The OT stage runs natively (pipelines/aeot.py — no external pyOMT_raw);
--ot_h accepts both our .npz potentials and the reference's torch h.pt,
--features_pt both .npz banks and the reference's features .pt.

Example:
  python scripts/run_aeot_end2end.py \
    --ae_config configs/stage1_ae.yaml --ae_ckpt checkpoints/stage1_ae/last \
    --features_pt results/latents.npz --ot_h results/h.npz \
    --out_root results/aeot_runs --run_name demo --n_generate 500 \
    --num_gen_x 20000 --ot_bat_size_n 10000 --ot_thresh 0.3 \
    --select_random --seed 42
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sanitize_name(name: str) -> str:
    name = re.sub(r"[^A-Za-z0-9._-]+", "_", str(name).strip()).strip("._-")
    return name or "task"


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ae_config", type=str, required=True)
    ap.add_argument("--ae_ckpt", type=str, required=True)
    ap.add_argument("--features_pt", type=str, default="",
                    help="latent bank (.npz or reference .pt); required "
                         "unless --prior_dir selects the code-prior path")
    ap.add_argument("--ot_h", type=str, default="",
                    help="OT potential (.npz or reference h.pt); required "
                         "unless --prior_dir selects the code-prior path")
    # learned code-prior sampler (stage-2 models; replaces the OT stage
    # with autoregressive code sampling — scripts/train_code_prior.py)
    ap.add_argument("--prior_dir", type=str, default="",
                    help="trained code-prior artifact dir; when set, "
                         "candidates come from prior-sampled RVQ codes "
                         "instead of OT-interpolated bank latents")
    ap.add_argument("--prior_temperature", type=float, default=1.0)
    ap.add_argument("--prior_top_k", type=int, default=0)
    ap.add_argument("--out_root", type=str, required=True)
    ap.add_argument("--run_name", type=str, default="")
    ap.add_argument("--n_generate", type=int, required=True)
    ap.add_argument("--select_random", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    # OT sampling
    ap.add_argument("--num_gen_x", type=int, default=100000)
    ap.add_argument("--ot_bat_size_n", type=int, default=10000)
    ap.add_argument("--ot_thresh", type=float, default=0.3)
    ap.add_argument("--ot_source", type=str, default="uniform01",
                    choices=["uniform01", "uniform", "gaussian"])
    # extensions beyond the reference's fixed top-2 / 1-weight scheme:
    # lift candidate diversity on small banks (see pipelines/aeot.py)
    ap.add_argument("--ot_topk", type=int, default=2,
                    help="pair the top-1 OT cell with each of the next "
                         "k-1 cells (reference behavior: 2)")
    ap.add_argument("--ot_samples_per_pair", type=int, default=1,
                    help="independent convex weights per unique pair "
                         "(reference behavior: 1)")
    # decoding
    ap.add_argument("--decode_batch_size", type=int, default=64)
    ap.add_argument("--latent_key", type=str, default="latents")
    ap.add_argument("--min_len_clamp", type=int, default=1)
    ap.add_argument("--max_len_clamp", type=int, default=0)
    ap.add_argument("--gen_len_fallback", type=int, default=128)
    # filtering (end2end threshold set)
    ap.add_argument("--min_length", type=int, default=32)
    ap.add_argument("--max_length", type=int, default=0)
    ap.add_argument("--min_pairwise_dist", type=float, default=2.0)
    ap.add_argument("--neighbor_exclude", type=int, default=2)
    ap.add_argument("--min_beta_run", type=int, default=0)
    ap.add_argument("--min_beta_total", type=int, default=0)
    ap.add_argument("--beta_channel", type=int, default=1)
    ap.add_argument("--min_beta_sheet_fraction", type=float, default=0.0)
    ap.add_argument("--max_isolated_beta_strands", type=int, default=-1)
    ap.add_argument("--min_strand_len", type=int, default=3)
    # output
    ap.add_argument("--name_pattern", type=str,
                    default="{run_name}_gen_{idx:06d}.npy")
    ap.add_argument("--save_raw_decoded", action="store_true")
    # compat no-ops (accepted for API parity with the reference CLI)
    ap.add_argument("--repo_root", type=str, default="")
    ap.add_argument("--ot_root", type=str, default="")
    ap.add_argument("--gpu_id", type=int, default=0)
    ap.add_argument("--ot_device", type=str, default="")
    ap.add_argument("--decode_device", type=str, default="")
    return ap.parse_args(argv)


def run(args, bundle=None) -> dict:
    """Execute the pipeline; returns the summary dict it also writes.

    `bundle` lets a persistent caller (scripts/aeot_worker.py) reuse a
    loaded AE across jobs — the warm-serving path that skips the 200-870 s
    per-process backend init this image pays on first device contact.
    """
    import jax

    from pytorch_vae_tpu.pipelines import filtering
    from pytorch_vae_tpu.pipelines.aeot import (
        SemiDiscreteOT,
        load_latent_bank,
        load_potential,
        ot_generate_latents,
    )
    from pytorch_vae_tpu.pipelines.inference import AEBundle

    out_root = Path(args.out_root)
    out_root.mkdir(parents=True, exist_ok=True)
    run_name = args.run_name.strip() or time.strftime("%Y%m%d_%H%M%S")
    run_dir = out_root / run_name
    run_dir.mkdir(parents=True, exist_ok=True)
    file_run_name = sanitize_name(run_name)

    raw_dir = run_dir / "decoded_npy" if args.save_raw_decoded else None
    if raw_dir is not None:
        raw_dir.mkdir(exist_ok=True)
    filtered_dir = run_dir / "filtered_npy"
    filtered_dir.mkdir(exist_ok=True)
    rejected_dir = run_dir / "rejected_npy"
    rejected_dir.mkdir(exist_ok=True)
    manifest_path = run_dir / "filtered_manifest.jsonl"
    rejected_manifest_path = run_dir / "rejected_manifest.jsonl"
    summary_path = run_dir / "summary.json"
    with (run_dir / "args.json").open("w") as f:
        json.dump(vars(args), f, indent=2)

    t0 = time.time()
    if bundle is None:
        print("[info] Loading AE ...")
        bundle = AEBundle.from_checkpoint(args.ae_config, args.ae_ckpt)
    flat_dim = bundle.flat_dim
    print(f"[info] AE latent_tokens={bundle.latent_tokens} "
          f"code_dim={bundle.code_dim} flat_dim={flat_dim}")

    # First device contact dials the TPU relay — measured 200-870 s of
    # pure backend/tunnel init on this image (r3 instrumentation), which
    # previously landed inside the OT stage's wall clock. Pay and report
    # it as its own timing bucket so stage timings reflect actual work.
    import jax as _jax

    t_init0 = time.time()
    float(_jax.device_put(np.float32(0.0)) + 1.0)
    t_backend_init = time.time() - t_init0
    print(f"[info] device backend ready in {t_backend_init:.1f}s")

    # 1) candidate latents ONCE: OT interpolation (default) or the
    # learned code prior (--prior_dir: sample legal RVQ sequences, map
    # through the codebook — the unconditional path uniform sampling
    # can't provide, see models/code_prior.py)
    t_ot0 = time.time()
    if args.prior_dir:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from sample_code_prior import load_prior

        from pytorch_vae_tpu.models.code_prior import sample_codes

        if bundle.vq_state is None:
            raise RuntimeError("--prior_dir needs a stage-2 (VQ) model")
        pm, pvars, pmeta = load_prior(args.prior_dir)
        Qn = int(bundle.model.num_quantizers)
        if (pm.num_q, pm.k_per, pm.n_tokens) != (
                Qn, int(bundle.model.codebook_size), bundle.latent_tokens):
            raise RuntimeError(
                f"prior/model mismatch: prior (Q={pm.num_q}, K={pm.k_per}, "
                f"M={pm.n_tokens}) vs model (Q={Qn}, "
                f"K={int(bundle.model.codebook_size)}, "
                f"M={bundle.latent_tokens})")
        emb = np.asarray(bundle.vq_state.embedding)
        hist = np.asarray(pmeta["length_hist"], np.float64)
        rng = np.random.default_rng(args.seed)
        n_cand = int(args.n_generate)
        lengths = rng.choice(len(hist), size=n_cand,
                             p=hist / hist.sum()).astype(np.int64)
        jit_sample = jax.jit(lambda k, l: sample_codes(
            pm, pvars, k, l, temperature=args.prior_temperature,
            top_k=args.prior_top_k))
        key = jax.random.PRNGKey(args.seed)
        chunks = []
        cb = 256  # fixed chunk so the sampler compiles once (pad last)
        for i0 in range(0, n_cand, cb):
            ls = lengths[i0:i0 + cb]
            pad = cb - len(ls)
            ls_p = (np.concatenate([ls, np.full(pad, int(ls[-1]),
                                                np.int64)])
                    if pad else ls)
            key, sub = jax.random.split(key)
            flat = np.asarray(jit_sample(sub, ls_p))[: len(ls)]
            # token-major global flat -> summed code vectors [B, M, D]
            chunks.append(
                emb[flat.reshape(len(ls), bundle.latent_tokens, Qn)]
                .sum(axis=2).astype(np.float32))
        z_in = np.concatenate(chunks).reshape(n_cand, -1)
        print(f"[info] code prior sampled {n_cand} candidates "
              f"(T={args.prior_temperature}, top_k={args.prior_top_k})")
    else:
        if not args.features_pt or not args.ot_h:
            raise SystemExit(
                "--features_pt and --ot_h are required without --prior_dir")
        bank = load_latent_bank(args.features_pt)
        P = np.asarray(bank[args.latent_key], np.float32)
        lengths_bank = np.asarray(bank["lengths"]).reshape(-1)
        h = load_potential(args.ot_h, n=P.shape[0])
        ot = SemiDiscreteOT(P=P, h=h, source=args.ot_source)
        ot_out = ot_generate_latents(
            ot, lengths_bank, int(args.num_gen_x), int(args.ot_bat_size_n),
            float(args.ot_thresh), jax.random.PRNGKey(args.seed),
            k_neighbors=int(args.ot_topk),
            samples_per_pair=int(args.ot_samples_per_pair))
        z_in = ot_out["latents"]
        lengths = ot_out["lengths"]
    t_ot1 = time.time()
    # timing bucket named by the stage that actually ran
    stage_key = "prior_sampling" if args.prior_dir else "ot"
    if z_in.shape[1] != flat_dim:
        raise RuntimeError(f"Latent dim mismatch: OT D={z_in.shape[1]} vs "
                           f"AE expected {flat_dim}")
    M = int(z_in.shape[0])
    if M == 0:
        print("[warn] No OT candidates generated. Exiting.")
        summary = {
            "run_dir": str(run_dir), "ot_candidates": 0, "decoded": 0,
            "kept": 0, "reject_counts": {},
            "timing_sec": {"backend_init": t_backend_init,
                           "total": time.time() - t0,
                           stage_key: t_ot1 - t_ot0},
            "outputs": {"filtered_dir": str(filtered_dir),
                        "filtered_manifest": str(manifest_path),
                        "summary": str(summary_path)},
        }
        summary_path.write_text(json.dumps(summary, indent=2))
        return summary

    lengths = np.clip(lengths, args.min_len_clamp,
                      args.max_len_clamp if args.max_len_clamp > 0 else None)
    max_model_len = int(bundle.model.max_seq_len)
    lengths = np.clip(lengths, 1, max_model_len)
    print(f"[info] OT candidates (after angle+unique): {M}")
    print(f"[info] OT length min/mean/max = {lengths.min()}/"
          f"{lengths.mean():.2f}/{lengths.max()}")

    # 2) Select exactly n_generate (no refill)
    n_generate = int(args.n_generate)
    if n_generate <= 0:
        raise ValueError("--n_generate must be > 0")
    if M < n_generate:
        print(f"[warn] OT produced only {M} candidates < "
              f"n_generate={n_generate}. Using all {M} (NO refill).")
        N = M
        z_sel, len_sel = z_in, lengths
    else:
        N = n_generate
        if args.select_random:
            perm = np.random.default_rng(args.seed).permutation(M)[:N]
            z_sel, len_sel = z_in[perm], lengths[perm]
            print(f"[info] Selected {N}/{M} candidates randomly "
                  f"(seed={args.seed}).")
        else:
            z_sel, len_sel = z_in[:N], lengths[:N]
            print(f"[info] Selected first {N}/{M} candidates.")

    params = filtering.end2end_params(
        min_length=args.min_length, max_length=args.max_length,
        min_pairwise_dist=args.min_pairwise_dist,
        neighbor_exclude=args.neighbor_exclude,
        min_beta_run=args.min_beta_run, min_beta_total=args.min_beta_total,
        beta_channel=args.beta_channel,
        min_beta_sheet_fraction=args.min_beta_sheet_fraction,
        max_isolated_beta_strands=args.max_isolated_beta_strands,
        min_strand_len=args.min_strand_len)

    kept = total_decoded = 0
    reject_counts = {k: 0 for k in filtering.REJECT_REASONS}
    prov = {"ae_ckpt": str(args.ae_ckpt)}
    if args.prior_dir:
        # prior path: no OT stage ran — record only sampler provenance
        # (OT-only fields here would mislead A/B comparisons of the
        # committed summary JSONs)
        prov["sampler"] = {"prior_dir": str(args.prior_dir),
                           "temperature": float(args.prior_temperature),
                           "top_k": int(args.prior_top_k)}
    else:
        prov.update({
            "ot_thresh": float(args.ot_thresh),
            "num_gen_x": int(args.num_gen_x),
            "ot_bat_size_n": int(args.ot_bat_size_n),
            "ot_topk": int(args.ot_topk),
            "ot_samples_per_pair": int(args.ot_samples_per_pair),
            "features_pt": str(args.features_pt), "ot_h": str(args.ot_h),
        })

    # 3) decode + filter, single streaming pass. The O(L^2) geometric
    # filter is host-side numpy; it runs on a single worker thread so
    # batch i filters while batch i+1 decodes on the device (the worker
    # is alone, so manifest order and counters stay sequential).
    from concurrent.futures import ThreadPoolExecutor

    t_df0 = time.time()
    bs = int(args.decode_batch_size)

    def host_work(i0, curves, b_len, mf, rmf):
        nonlocal kept, total_decoded
        for bi, curve6 in enumerate(curves):
            gi = i0 + bi
            L = int(b_len[bi]) if b_len.size else args.gen_len_fallback
            fname = args.name_pattern.format(idx=gi,
                                             run_name=file_run_name)
            if raw_dir is not None:
                np.save(raw_dir / fname, curve6, allow_pickle=False)
            passed, stats, reason = filtering.curve_pass_filter(
                curve6, params)
            total_decoded += 1
            if not passed:
                reject_counts[reason] = reject_counts.get(reason, 0) + 1
                rej_path = rejected_dir / fname
                np.save(rej_path, curve6, allow_pickle=False)
                rec = {"i": gi, "recon_path": str(rej_path),
                       "length_recon": L, "reject_reason": reason,
                       **prov, **stats}
                rmf.write(json.dumps(rec) + "\n")
                continue
            out_path = filtered_dir / fname
            np.save(out_path, curve6, allow_pickle=False)
            rec = {"i": gi, "recon_path": str(out_path),
                   "length_recon": int(stats.get("length_recon", L)),
                   **prov, **stats}
            mf.write(json.dumps(rec) + "\n")
            kept += 1
        print(f"[progress] {min(i0 + bs, N)}/{N} decoded, kept={kept}",
              flush=True)

    with manifest_path.open("w") as mf, \
            rejected_manifest_path.open("w") as rmf, \
            ThreadPoolExecutor(max_workers=1) as pool:
        futures = []
        for i0 in range(0, N, bs):
            i1 = min(N, i0 + bs)
            z_tokens = z_sel[i0:i1].reshape(
                i1 - i0, bundle.latent_tokens, bundle.code_dim)
            b_len = len_sel[i0:i1]
            # pad to the model max so decode compiles once
            curves = bundle.decode_curve6(z_tokens, b_len,
                                          pad_to=max_model_len)
            futures.append(pool.submit(host_work, i0, curves, b_len,
                                       mf, rmf))
        for f in futures:
            f.result()  # propagate filter/IO errors
    t_df1 = time.time()

    summary = {
        "run_dir": str(run_dir),
        "ot_candidates_after_angle_unique": M,
        "selected_for_decode_filter": N,
        "kept": kept,
        "total_decoded": total_decoded,
        "reject_counts": reject_counts,
        "timing_sec": {"backend_init": t_backend_init,
                       stage_key: t_ot1 - t_ot0,
                       "decode_filter": t_df1 - t_df0,
                       "total": time.time() - t0},
        "outputs": {
            "filtered_dir": str(filtered_dir),
            "filtered_manifest": str(manifest_path),
            "rejected_dir": str(rejected_dir),
            "rejected_manifest": str(rejected_manifest_path),
            "summary": str(summary_path),
            "raw_decoded_dir": str(raw_dir) if raw_dir else "",
        },
    }
    summary_path.write_text(json.dumps(summary, indent=2))
    print("\n[done] Timing:")
    print(json.dumps(summary["timing_sec"], indent=2))
    print(f"[done] selected={N}, kept={kept}, total_decoded={total_decoded}")
    print(f"[done] outputs: {run_dir}")
    return summary


def main(argv=None) -> dict:
    return run(parse_args(argv))


if __name__ == "__main__":
    main()
