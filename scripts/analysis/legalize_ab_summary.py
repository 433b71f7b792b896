"""Aggregate the round-5 bond-legalization A/B into one summary.

Collates every legalization arm (trained ft4l leg + zero-training
inference arms over the ft3g/ft9 checkpoints) against its committed
control row, at every point the short-bond pathology binds: the
strict-filter reconstruction ceiling, uniform-code sampling, the
matched learned-prior arms, the honest-distortion RMSD pair, and the
stage-1 AE-OT end2end. No reference counterpart (the reference decoder
emits raw coordinates, models/vq_vae.py:745-765); controls cited are
this repo's committed rows.

Writes results/legalize_ab_r5/summary.json and prints it.
"""

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _load(rel):
    p = os.path.join(ROOT, rel)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _keep(d):
    if d is None:
        return None
    return d.get("keep_rate")


def _aeot(d):
    if d is None:
        return None
    n_kept = d.get("kept")
    n_total = d.get("total_decoded")
    return {"kept": n_kept, "total": n_total,
            "keep_rate": (n_kept / n_total) if n_kept is not None
            and n_total else None,
            "reject_counts": d.get("reject_counts", {})}


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--out",
                    default="results/legalize_ab_r5/summary.json")
    args = ap.parse_args()

    out = {"what": "round-5 decoder-side bond legalization A/B "
                   "(ops/geometry.legalize_bond_lengths)"}

    # --- reconstruction ceiling (strict filter over quantized decodes
    # of real val curves) ---
    r3 = _load("results/prior_r3/summary.json") or {}
    out["recon_ceiling"] = {
        "control_ft2": _keep(r3.get("arms", {}).get("recon")),
        "control_ft3g": _keep(
            _load("results/stage2_r3/recon_ceiling_ft3g.json")),
        "inference_legalize_ft3g": _keep(
            _load("results/stage2_r3/recon_ceiling_ft3g_legal.json")),
        "trained_legalize_ft4l": _keep(
            _load("results/stage2_r3/recon_ceiling_ft4l.json")),
    }

    # --- uniform-code sampling ---
    out["uniform_codes"] = {
        "control_ft3g": 0.0,  # results/prior_r3 + every committed arm
        "inference_legalize_ft3g": _keep(
            _load("results/prior_r4/vqsample_ft3g_legal_uniform.json")),
        "trained_legalize_ft4l": _keep(
            _load("results/prior_r4/vqsample_ft4l_uniform.json")),
    }

    # --- learned prior (trained on ft3g codes; inference arm is the
    # matched decode) ---
    prior = {}
    for t in ("t06", "t08", "t10"):
        ctrl = _load(f"results/prior_r4/vqsample_{t}.json")
        legal = _load(f"results/prior_r4/vqsample_legal_{t}.json")
        prior[t] = {
            "control_keep": _keep(ctrl),
            "legalized_keep": _keep(legal),
            "control_exact_match": ((ctrl or {}).get("novelty") or
                                    {}).get("exact_match_frac"),
            "legalized_exact_match": ((legal or {}).get("novelty") or
                                      {}).get("exact_match_frac"),
        }
    out["learned_prior_ft3g_codes"] = prior

    # --- honest distortion: aligned RMSD of quantized val decodes ---
    raw = _load("results/recon_r5/ft3g_raw/report.json")
    leg = _load("results/recon_r5/ft3g_legal/report.json")
    ft4l = _load("results/recon_r5/ft4l/report.json")
    out["distortion_val_rmsd_aligned"] = {
        "ft3g_raw": (raw or {}).get("aggregate", {}).get("rmsd_mean"),
        "ft3g_inference_legalize":
            (leg or {}).get("aggregate", {}).get("rmsd_mean"),
        "ft4l_trained_legalize":
            (ft4l or {}).get("aggregate", {}).get("rmsd_mean"),
    }

    # --- stage-1 AE-OT end2end (same bank / OT potential / seed) ---
    out["aeot_end2end"] = {
        "control_ft9": _aeot(
            _load("results/aeot_runs/r4_ft9_bankx/summary.json")),
        "inference_legalize_ft9": _aeot(
            _load("results/aeot_runs/r5_ft9_legal/summary.json")),
    }

    dst = args.out if os.path.isabs(args.out) \
        else os.path.join(ROOT, args.out)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
