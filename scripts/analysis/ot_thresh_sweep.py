#!/usr/bin/env python
"""Sweep the OT angular-filter threshold: keep-rate vs candidate diversity.

The angular filter (cos of lifted cell normals > cos(thresh); reference
scripts/run_aeot_end2end.py:221-232) is the one knob trading candidate
diversity against decode quality: a loose threshold admits pairs whose
OT cells sit far apart (more unique pairs, worse interpolants), a tight
one keeps near-parallel cells only. The reference ships thresh=0.3 with
no measurement; this tool produces the tradeoff table.

One process, one AE bundle, one latent bank: after the first threshold,
each sweep point reuses the OT-scan and decode jit caches (the scan is a
module-level jit in pipelines/aeot.py), so a point costs seconds, not a
backend re-init.

Usage:
  python scripts/analysis/ot_thresh_sweep.py \
      --ae_config configs/synth_ae_ft6.yaml \
      --ae_ckpt checkpoints/synth_ae_ft6/last \
      --features results/synth_latents_r3f6m.npz \
      --ot_h results/synth_h_r3f6m.npz \
      --out results/aeot_runs/thresh_sweep_r3.json \
      --thresholds 0.15 0.3 0.5 0.7 \
      --n_generate 500 --num_gen_x 100000
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "scripts"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ae_config", required=True)
    ap.add_argument("--ae_ckpt", required=True)
    ap.add_argument("--features", required=True)
    ap.add_argument("--ot_h", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--thresholds", type=float, nargs="+",
                    default=[0.15, 0.3, 0.5, 0.7])
    ap.add_argument("--n_generate", type=int, default=500)
    ap.add_argument("--num_gen_x", type=int, default=100000)
    ap.add_argument("--ot_bat_size_n", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out_root", default="results/aeot_runs")
    ap.add_argument("--run_prefix", default="thsweep")
    args = ap.parse_args()

    import run_aeot_end2end as e2e

    from pytorch_vae_tpu.pipelines.inference import AEBundle
    bundle = AEBundle.from_checkpoint(args.ae_config, args.ae_ckpt)
    rows = []
    for th in args.thresholds:
        run_name = f"{args.run_prefix}_t{th:g}".replace(".", "p")
        e2e_args = e2e.parse_args([
            "--ae_config", args.ae_config, "--ae_ckpt", args.ae_ckpt,
            "--features_pt", args.features, "--ot_h", args.ot_h,
            "--out_root", args.out_root, "--run_name", run_name,
            "--n_generate", str(args.n_generate), "--select_random",
            "--seed", str(args.seed),
            "--num_gen_x", str(args.num_gen_x),
            "--ot_bat_size_n", str(args.ot_bat_size_n),
            "--ot_thresh", str(th),
            "--decode_batch_size", "128", "--min_length", "32",
            "--min_pairwise_dist", "2.0", "--neighbor_exclude", "2",
        ])
        s = e2e.run(e2e_args, bundle=bundle) or {}
        rej = s.get("reject_counts", {})
        decoded = s.get("total_decoded", 0)
        rows.append({
            "thresh": th,
            "candidates": s.get("ot_candidates_after_angle_unique", 0),
            "decoded": decoded,
            "kept": s.get("kept", 0),
            "keep_pct": round(100.0 * s.get("kept", 0)
                              / max(1, decoded), 1),
            "bond_out": rej.get("bond_out", 0),
            "segment_collision": rej.get("segment_collision", 0),
            "point_collision": rej.get("point_collision", 0),
            "ot_sec": round(s.get("timing_sec", {}).get("ot", 0.0), 2),
        })
        print(f"[sweep] thresh={th}: {rows[-1]}")

    payload = {"ae_ckpt": args.ae_ckpt, "features": args.features,
               "n_generate": args.n_generate,
               "num_gen_x": args.num_gen_x, "seed": args.seed,
               "rows": rows}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)

    hdr = ("| thresh | unique candidates | decoded | kept | keep % | "
           "bond_out | seg_coll |")
    print(hdr)
    print("|" + "---|" * 7)
    for r in rows:
        print(f"| {r['thresh']:g} | {r['candidates']} | {r['decoded']} "
              f"| {r['kept']} | {r['keep_pct']} | {r['bond_out']} "
              f"| {r['segment_collision']} |")
    print(f"[sweep] wrote {args.out}")


if __name__ == "__main__":
    main()
