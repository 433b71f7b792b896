#!/usr/bin/env python
"""Aggregate AE-OT generation runs into one quality table.

Scans run directories for the `summary.json` that
scripts/run_aeot_end2end.py writes (reference run_aeot_end2end.py:916-946
layout) and emits a markdown (or TSV) table: OT candidate count, decoded,
kept, keep-rate, dominant reject reasons, and stage timings. This is how
the keep-rate evidence rows in BASELINE.md are produced; the reference has
no aggregator (its runs were compared by hand).

Usage:
  python scripts/analysis/aggregate_quality_runs.py \
      --runs results/aeot_runs/* [--format md|tsv] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os


def load_rows(run_dirs: list) -> list:
    rows = []
    for d in sorted(run_dirs):
        path = os.path.join(d, "summary.json")
        if not os.path.isfile(path):
            continue
        with open(path) as f:
            s = json.load(f)
        decoded = int(s.get("total_decoded") or 0)
        kept = int(s.get("kept") or 0)
        rej = {k: int(v) for k, v in (s.get("reject_counts") or {}).items()
               if int(v) > 0}
        top_rej = ", ".join(f"{k} {v}" for k, v in
                            sorted(rej.items(), key=lambda kv: -kv[1])[:3])
        t = s.get("timing_sec") or {}
        rows.append({
            "run": os.path.basename(d.rstrip("/")),
            "candidates": int(s.get("ot_candidates_after_angle_unique")
                              or 0),
            "decoded": decoded,
            "kept": kept,
            "keep_pct": (100.0 * kept / decoded) if decoded else 0.0,
            "top_rejects": top_rej or "-",
            "ot_s": float(t.get("ot") or 0.0),
            "decode_filter_s": float(t.get("decode_filter") or 0.0),
        })
    return rows


def render(rows: list, fmt: str) -> str:
    cols = ["run", "candidates", "decoded", "kept", "keep_pct",
            "top_rejects", "ot_s", "decode_filter_s"]
    if fmt == "tsv":
        lines = ["\t".join(cols)]
        for r in rows:
            lines.append("\t".join(
                f"{r[c]:.1f}" if isinstance(r[c], float) else str(r[c])
                for c in cols))
        return "\n".join(lines)
    head = ("| run | candidates | decoded | kept | keep % | top rejects "
            "| OT s | decode+filter s |")
    sep = "|" + "---|" * 8
    lines = [head, sep]
    for r in rows:
        lines.append(
            f"| {r['run']} | {r['candidates']} | {r['decoded']} | "
            f"{r['kept']} | {r['keep_pct']:.1f} | {r['top_rejects']} | "
            f"{r['ot_s']:.1f} | {r['decode_filter_s']:.1f} |")
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=str, nargs="+", required=True,
                    help="run directories (each containing summary.json); "
                         "dirs without one are skipped")
    ap.add_argument("--format", type=str, default="md",
                    choices=["md", "tsv"])
    ap.add_argument("--out", type=str, default=None,
                    help="write here instead of stdout")
    args = ap.parse_args()

    rows = load_rows(args.runs)
    if not rows:
        raise SystemExit("No summary.json found under the given runs.")
    text = render(rows, args.format)
    if args.out:
        out_dir = os.path.dirname(args.out)
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        with open(args.out, "w") as f:
            f.write(text + "\n")
        print(f"[Info] Wrote {len(rows)} rows to {args.out}")
    else:
        print(text)


if __name__ == "__main__":
    main()
