#!/usr/bin/env python
"""Standalone curve filter CLI.

Parity target: prior/filter_curves.py — filter a directory of decoded
curve .npy files with the *standalone* threshold set (stricter
BOND_MIN_ALLOWED = 2.2 than the end2end pipeline's 1.4, an intentional
reference discrepancy preserved here — SURVEY.md §2.3), with optional
merge of an original samples manifest into the filtered records and
per-reason reject counters (reference :449-741).

Usage:
  python scripts/filter_curves.py --recon_dir results/decoded \
      --out_dir results/filtered \
      [--samples_manifest samples.jsonl] \
      [--filtered_manifest_out filtered.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_manifest(path: str) -> dict:
    """Index an existing manifest by its 'i' field."""
    out = {}
    p = Path(path)
    if not p.exists():
        print(f"[warn] samples_manifest not found: {p}")
        return out
    for line in p.open():
        line = line.strip()
        if not line:
            continue
        rec = json.loads(line)
        if "i" in rec:
            out[int(rec["i"])] = rec
    return out


def index_from_name(name: str):
    m = re.search(r"(\d+)", Path(name).stem)
    return int(m.group(1)) if m else None


def load_curve(path: Path) -> np.ndarray:
    arr = np.load(path, allow_pickle=True)
    if arr.dtype == object:  # dict-style npy
        d = arr.item()
        return np.concatenate(
            [np.asarray(d["curve_coords"], np.float32),
             np.asarray(d["ss_one_hot"], np.float32)], axis=-1)
    return np.asarray(arr, np.float32)


def main() -> None:
    from pytorch_vae_tpu.pipelines import filtering

    ap = argparse.ArgumentParser()
    ap.add_argument("--recon_dir", type=str, required=True)
    ap.add_argument("--out_dir", type=str, required=True)
    ap.add_argument("--samples_manifest", type=str, default="")
    ap.add_argument("--filtered_manifest_out", type=str, default="")
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
    ap.add_argument("--pattern", type=str, default="*.npy")
    args = ap.parse_args()

    params = filtering.standalone_params(
        min_length=args.min_length, max_length=args.max_length,
        min_pairwise_dist=args.min_pairwise_dist,
        neighbor_exclude=args.neighbor_exclude,
        min_beta_run=args.min_beta_run, min_beta_total=args.min_beta_total,
        beta_channel=args.beta_channel,
        min_beta_sheet_fraction=args.min_beta_sheet_fraction,
        max_isolated_beta_strands=args.max_isolated_beta_strands,
        min_strand_len=args.min_strand_len)

    recon_dir = Path(args.recon_dir)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    manifest_map = (load_manifest(args.samples_manifest)
                    if args.samples_manifest else {})

    files = sorted(recon_dir.glob(args.pattern))
    counters = {k: 0 for k in ("too_short", "too_long", "bond_out",
                               "angle_out", "point_collision",
                               "segment_collision", "ss_reject",
                               "bad_shape", "nan_inf")}
    filtered_records = []
    n_kept = 0
    for f in files:
        curve6 = load_curve(f)
        ok, stats, reason = filtering.curve_pass_filter(curve6, params)
        if not ok:
            counters[reason] = counters.get(reason, 0) + 1
            continue
        shutil.copy2(f, out_dir / f.name)
        idx = index_from_name(f.name)
        rec = dict(manifest_map.get(idx, {})) if idx is not None else {}
        rec.update({"i": idx, "recon_path": str(out_dir / f.name)})
        rec.update(stats)
        filtered_records.append(rec)
        n_kept += 1

    n_total = len(files)
    print(f"[summary] total curves: {n_total}")
    print(f"[summary] kept: {n_kept}")
    print(f"[summary] rejected (too short): {counters['too_short']}")
    print(f"[summary] rejected (too long): {counters['too_long']}")
    print(f"[summary] rejected (bond length out-of-range): "
          f"{counters['bond_out']}")
    print(f"[summary] rejected (bond angle out-of-range): "
          f"{counters['angle_out']}")
    print(f"[summary] rejected (point self-collision): "
          f"{counters['point_collision']}")
    print(f"[summary] rejected (segment self-intersection): "
          f"{counters['segment_collision']}")
    print(f"[summary] rejected (ss heuristics): {counters['ss_reject']}")

    if args.filtered_manifest_out:
        mpath = Path(args.filtered_manifest_out)
        mpath.parent.mkdir(parents=True, exist_ok=True)
        with mpath.open("w") as f:
            for rec in filtered_records:
                f.write(json.dumps(rec) + "\n")
        print(f"[info] wrote filtered manifest with "
              f"{len(filtered_records)} records to {mpath}")


if __name__ == "__main__":
    main()
