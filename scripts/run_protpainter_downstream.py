#!/usr/bin/env python
"""Downstream orchestrator: curve -> backbone -> sequence/fold -> evaluation.

Stage-machine rebuild of the reference scripts/run_protpainter_downstream.py.
The heavy tools remain external and pluggable (they were never vendored in
the reference either — SURVEY.md §1 "external systems"): C2S (curve ->
sketch), the PFF flow model (sketch -> backbone), LigandMPNN (sequence),
OmegaFold (folding), USalign (TM-score). Each is invoked through a
configurable command template; `--mock` substitutes deterministic synthetic
outputs so the full stage machine and the serving API can run without the
ProtPainter suite installed.

Stages (reference :442-531):
  backbone       selected curves -> dict npy + PDB -> sketch -> backbone PDB
  sequence_fold  backbone -> designed sequence -> folded PDB
  evaluation     folded vs backbone: TM-score/RMSD, pLDDT, curve similarity,
                 SS accuracy -> evaluation_summary.json

Each stage writes downstream/<stage>_summary.json; failures write a
"failed" summary instead of raising (reference :532-541).
"""

from __future__ import annotations

import argparse
import json
import os
import shlex
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pytorch_vae_tpu.serving import pdb_utils  # noqa: E402

TOOL_ENV = {
    "c2s": "PP_C2S_CMD",             # e.g. "python c2s.py {in_npy} {out}"
    "pff": "PP_PFF_CMD",
    "lmpnn": "PP_LMPNN_CMD",
    "omegafold": "PP_OMEGAFOLD_CMD",
    "usalign": "PP_USALIGN_CMD",     # e.g. "USalign {a} {b}"
}


def run_tool(name: str, mock: bool, mock_fn, **fmt) -> str:
    """Run an external tool command template, or its mock."""
    cmd_tpl = os.environ.get(TOOL_ENV[name], "")
    if mock or not cmd_tpl:
        return mock_fn(**fmt)
    cmd = cmd_tpl.format(**fmt)
    proc = subprocess.run(shlex.split(cmd), capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"{name} failed: {proc.stderr[-1000:]}")
    return proc.stdout


def load_selection(run_dir: Path) -> list:
    sel_path = run_dir / "selected_manifest.json"
    manifest = run_dir / "filtered_manifest.jsonl"
    records = []
    if manifest.exists():
        records = [json.loads(line) for line in manifest.open()
                   if line.strip()]
    if not records:
        # fall back to rejected curves so mock runs work on any run_dir
        rej = run_dir / "rejected_manifest.jsonl"
        if rej.exists():
            records = [json.loads(line) for line in rej.open()
                       if line.strip()][:4]
    if sel_path.exists():
        sel = json.loads(sel_path.read_text()).get("selected")
        if sel:
            keep = {int(s) for s in sel}
            records = [r for r in records if int(r.get("i", -1)) in keep]
    return records


def stage_backbone(run_dir: Path, out_dir: Path, mock: bool) -> dict:
    records = load_selection(run_dir)
    if not records:
        raise RuntimeError("no curves selected / available")
    made = []
    for rec in records:
        curve = pdb_utils.load_curve6(rec["recon_path"])
        name = Path(rec["recon_path"]).stem
        # curve -> dict npy + CA PDB (reference :60-88)
        np.save(out_dir / f"{name}_curve.npy",
                {"curve_coords": curve[:, :3],
                 "ss_one_hot": curve[:, 3:6]}, allow_pickle=True)
        (out_dir / f"{name}_curve.pdb").write_text(
            pdb_utils.write_pdb_ca_trace(curve[:, :3]))

        def mock_c2s(**_):
            np.save(out_dir / f"{name}_sketch.npy", curve[:, :3] * 1.0,
                    allow_pickle=False)
            return "mock-c2s"

        run_tool("c2s", mock, mock_c2s,
                 in_npy=str(out_dir / f"{name}_curve.npy"),
                 out=str(out_dir / f"{name}_sketch.npy"))

        def mock_pff(**_):
            # mock backbone: the CA trace jittered toward ideal bonds
            xyz = curve[:, :3] + np.random.default_rng(0).normal(
                scale=0.05, size=curve[:, :3].shape)
            (out_dir / f"{name}_backbone.pdb").write_text(
                pdb_utils.write_pdb_ca_trace(xyz))
            return "mock-pff"

        run_tool("pff", mock, mock_pff,
                 sketch=str(out_dir / f"{name}_sketch.npy"),
                 out=str(out_dir / f"{name}_backbone.pdb"))
        made.append(name)
    return {"stage": "backbone", "status": "done", "n_curves": len(made),
            "names": made}


def stage_sequence_fold(out_dir: Path, mock: bool) -> dict:
    backbones = sorted(out_dir.glob("*_backbone.pdb"))
    if not backbones:
        raise RuntimeError("no backbones found; run --stage backbone first")
    done = []
    for bb in backbones:
        name = bb.name.replace("_backbone.pdb", "")

        def mock_lmpnn(**_):
            n = len(pdb_utils.parse_pdb_ca_trace(bb.read_text())["xyz"])
            seq = "".join("ACDEFGHIKLMNPQRSTVWY"[i % 20] for i in range(n))
            (out_dir / f"{name}.fasta").write_text(f">{name}\n{seq}\n")
            return "mock-lmpnn"

        run_tool("lmpnn", mock, mock_lmpnn, pdb=str(bb),
                 out=str(out_dir / f"{name}.fasta"))

        def mock_fold(**_):
            trace = pdb_utils.parse_pdb_ca_trace(bb.read_text())["xyz"]
            rng = np.random.default_rng(1)
            xyz = trace + rng.normal(scale=0.3, size=trace.shape)
            # full-backbone output with per-residue pLDDT in the b-factor
            # column, like real OmegaFold/AlphaFold PDBs — exercises the
            # serving layer's full-atom parse/render path
            plddt = np.clip(rng.normal(82.5, 6.0, len(xyz)), 30.0, 99.0)
            (out_dir / f"{name}_folded.pdb").write_text(
                pdb_utils.write_pdb_backbone(xyz, plddt=plddt))
            (out_dir / f"{name}_plddt.json").write_text(
                json.dumps({"plddt_mean": float(plddt.mean())}))
            return "mock-omegafold"

        run_tool("omegafold", mock, mock_fold,
                 fasta=str(out_dir / f"{name}.fasta"),
                 out=str(out_dir / f"{name}_folded.pdb"))
        done.append(name)
    return {"stage": "sequence_fold", "status": "done",
            "n_sequences": len(done), "names": done}


def _tm_score_mock(a: np.ndarray, b: np.ndarray) -> dict:
    """TM-score estimate from the aligned traces (used when USalign is not
    installed): TM = mean 1 / (1 + (d_i/d0)^2) with d0(L)."""
    n = min(len(a), len(b))
    R, t, rmsd = pdb_utils.kabsch_align_np(a[:n], b[:n])
    d = np.linalg.norm(a[:n] @ R + t - b[:n], axis=1)
    d0 = max(1.24 * (n - 15) ** (1 / 3) - 1.8, 0.5)
    return {"tm": float(np.mean(1.0 / (1.0 + (d / d0) ** 2))),
            "rmsd": rmsd, "aligned_length": n}


def stage_evaluation(run_dir: Path, out_dir: Path, mock: bool) -> dict:
    folded = sorted(out_dir.glob("*_folded.pdb"))
    if not folded:
        raise RuntimeError("no folded structures; run sequence_fold first")
    per_curve = []
    for fp in folded:
        name = fp.name.replace("_folded.pdb", "")
        bb = out_dir / f"{name}_backbone.pdb"
        fold_xyz = pdb_utils.parse_pdb_ca_trace(fp.read_text())["xyz"]
        bb_xyz = pdb_utils.parse_pdb_ca_trace(bb.read_text())["xyz"]

        def mock_usalign(**_):
            return json.dumps(_tm_score_mock(fold_xyz, bb_xyz))

        tm_out = run_tool("usalign", mock, mock_usalign, a=str(fp),
                          b=str(bb))
        try:
            tm = json.loads(tm_out)
        except json.JSONDecodeError:
            # parse real USalign text output
            tm = {}
            for line in tm_out.splitlines():
                if line.startswith("TM-score="):
                    tm["tm"] = float(line.split("=")[1].split()[0])
                if "RMSD=" in line:
                    try:
                        tm["rmsd"] = float(
                            line.split("RMSD=")[1].split(",")[0])
                    except (ValueError, IndexError):
                        pass

        plddt_path = out_dir / f"{name}_plddt.json"
        plddt = (json.loads(plddt_path.read_text()).get("plddt_mean")
                 if plddt_path.exists() else None)

        # curve similarity + SS accuracy vs the originally selected curve
        curve_npy = out_dir / f"{name}_curve.npy"
        ss_acc = curve_sim = None
        if curve_npy.exists():
            d = np.load(curve_npy, allow_pickle=True).item()
            orig = np.asarray(d["curve_coords"])
            sim = _tm_score_mock(fold_xyz, orig)
            curve_sim = sim["tm"]
            ss_true = np.argmax(np.asarray(d["ss_one_hot"]), axis=-1)
            ss_pred = pdb_utils.assign_ss_from_xyz(fold_xyz)
            n = min(len(ss_true), len(ss_pred))
            ss_acc = float(np.mean(ss_true[:n] == ss_pred[:n]))

        per_curve.append({"name": name, **tm, "plddt_mean": plddt,
                          "curve_similarity": curve_sim,
                          "ss_accuracy": ss_acc})
    agg = {
        "tm_mean": float(np.mean([c["tm"] for c in per_curve
                                  if c.get("tm") is not None])),
        "rmsd_mean": float(np.mean([c["rmsd"] for c in per_curve
                                    if c.get("rmsd") is not None])),
    }
    out = {"stage": "evaluation", "status": "done",
           "n_structures": len(per_curve), "per_curve": per_curve,
           "aggregate": agg}
    (out_dir / "evaluation_summary.json").write_text(json.dumps(out,
                                                                indent=2))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", type=str, required=True,
                    help="a run_aeot_end2end.py output directory")
    ap.add_argument("--stage", type=str, required=True,
                    choices=["backbone", "sequence_fold", "evaluation"])
    ap.add_argument("--mock", action="store_true",
                    help="use synthetic outputs instead of external tools")
    args = ap.parse_args()

    run_dir = Path(args.run_dir)
    out_dir = run_dir / "downstream"
    out_dir.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    try:
        if args.stage == "backbone":
            summary = stage_backbone(run_dir, out_dir, args.mock)
        elif args.stage == "sequence_fold":
            summary = stage_sequence_fold(out_dir, args.mock)
        else:
            summary = stage_evaluation(run_dir, out_dir, args.mock)
    except Exception as e:
        summary = {"stage": args.stage, "status": "failed",
                   "error": repr(e)}
    summary["elapsed_sec"] = time.time() - t0
    path = out_dir / f"{args.stage}_summary.json"
    path.write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary)[:500])
    if summary["status"] != "done":
        sys.exit(1)
    print(f"[done] {args.stage} -> {path}")


if __name__ == "__main__":
    main()
