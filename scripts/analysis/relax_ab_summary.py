"""Aggregate the round-5 collision-relaxation A/B into one summary.

Collates every relaxation arm (zero-training inference maps over the
committed ft4l and ft9 checkpoints) against BOTH control eras at each
measurement point: the raw decode and the bond-legalization map it
stacks on. The relaxation targets the reject classes legalization
cannot touch — point/segment collisions and sub-10-degree angles
(pipelines/filtering.py gates). No reference counterpart (the
reference filter simply rejects clashing decodes,
prior/filter_curves.py); controls cited are this repo's committed rows.

Writes results/relax_ab_r5/summary.json and prints it.
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


def _rejects(d):
    if d is None:
        return None
    return d.get("reject_counts")


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
    ap.add_argument("--out", default="results/relax_ab_r5/summary.json")
    args = ap.parse_args()

    out = {"what": "round-5 decoder-side collision relaxation A/B "
                   "(ops/geometry.relax_collisions)"}

    # --- reconstruction ceiling (strict filter over quantized decodes
    # of real val curves; ft4l = trained-legalize control) ---
    ctrl = _load("results/stage2_r3/recon_ceiling_ft4l.json")
    rlx = _load("results/stage2_r3/recon_ceiling_ft4l_relax.json")
    out["recon_ceiling"] = {
        "control_ft4l_keep": _keep(ctrl),
        "control_ft4l_rejects": _rejects(ctrl),
        "relax_ft4l_keep": _keep(rlx),
        "relax_ft4l_rejects": _rejects(rlx),
    }

    # --- uniform-code sampling ---
    u_ctrl = _load("results/prior_r4/vqsample_ft4l_uniform.json")
    u_rlx = _load("results/prior_ft4l_r5/vqsample_relax_uniform.json")
    out["uniform_codes"] = {
        "control_ft4l_keep": _keep(u_ctrl),
        "relax_ft4l_keep": _keep(u_rlx),
        "relax_ft4l_rejects": _rejects(u_rlx),
    }

    # --- learned prior (ft4l codes; control arms are the committed
    # prior_ft4l_r5 rows through the legalized decode) ---
    prior = {}
    for t in ("t06", "t08", "t10", "t10_topp09"):
        c = _load(f"results/prior_ft4l_r5/vqsample_{t}.json")
        r = _load(f"results/prior_ft4l_r5/vqsample_relax_{t}.json")
        prior[t] = {
            "control_keep": _keep(c),
            "relax_keep": _keep(r),
            "control_rejects": _rejects(c),
            "relax_rejects": _rejects(r),
            "control_exact_match": ((c or {}).get("novelty") or
                                    {}).get("exact_match_frac"),
            "relax_exact_match": ((r or {}).get("novelty") or
                                  {}).get("exact_match_frac"),
        }
    out["learned_prior_ft4l_codes"] = prior

    # --- honest distortion: aligned RMSD of quantized val decodes ---
    ft4l = _load("results/recon_r5/ft4l/report.json")
    rrep = _load("results/recon_r5/ft4l_relax/report.json")
    out["distortion_val_rmsd_aligned"] = {
        "ft4l_trained_legalize":
            (ft4l or {}).get("aggregate", {}).get("rmsd_mean"),
        "ft4l_relax": (rrep or {}).get("aggregate", {}).get("rmsd_mean"),
    }

    # --- stage-1 AE-OT end2end (same bank / OT potential / seed) ---
    out["aeot_end2end"] = {
        "control_ft9": _aeot(
            _load("results/aeot_runs/r4_ft9_bankx/summary.json")),
        "legalize_ft9": _aeot(
            _load("results/aeot_runs/r5_ft9_legal/summary.json")),
        "relax_ft9": _aeot(
            _load("results/aeot_runs/r5_ft9_relax/summary.json")),
    }

    dst = args.out if os.path.isabs(args.out) \
        else os.path.join(ROOT, args.out)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
