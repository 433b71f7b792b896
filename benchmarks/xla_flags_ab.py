#!/usr/bin/env python
"""Compiler-level flagship A/B: XLA_FLAGS variants (VERDICT r3 #8).

All kernel-level levers at 121 ms are measured negatives (fused QKV,
fused FFN, exp2, dense-2D flattening — BASELINE.md); the roofline memory
floor is 114.6 ms and the residual is pallas-boundary layout copies +
VPU exp cost. The only levers left are compiler-level, and XLA_FLAGS are
process-scoped — so each variant runs the flagship step
(benchmarks/run_all.py::bench_flagship, bf16 + rbg) in a fresh
subprocess, alternating variants x `--reps` to control drift.

Variants marked unsupported-by-this-XLA-build are reported, not fatal.

Usage: python benchmarks/xla_flags_ab.py [--iters 30] [--reps 2] \
         [--out benchmarks/xla_flags_ab.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS = {
    # name -> XLA_FLAGS string appended to the environment
    "baseline": "",
    # bigger scoped VMEM lets the fusion cost model build larger conv
    # fusions (the step is conv-fusion dominated at ~62 ms)
    "vmem_32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "vmem_24m": "--xla_tpu_scoped_vmem_limit_kib=24576",
    # async scheduling: overlap HBM copies (the layout-copy rent) with
    # compute where the default scheduler serializes them
    "latency_hiding": "--xla_tpu_enable_latency_hiding_scheduler=true",
    # both together
    "vmem32_lhs": ("--xla_tpu_scoped_vmem_limit_kib=32768 "
                   "--xla_tpu_enable_latency_hiding_scheduler=true"),
}


def run_variant(name: str, flags: str, iters: int) -> dict:
    env = dict(os.environ)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker",
         "--iters", str(iters)],
        capture_output=True, text=True, cwd=ROOT, env=env, timeout=3600)
    wall = time.time() - t0
    if proc.returncode != 0:
        err = (proc.stderr or "")[-800:]
        status = ("unsupported_flag"
                  if "Unknown" in err or "unknown" in err else "error")
        return {"variant": name, "flags": flags, "status": status,
                "stderr_tail": err, "wall_s": wall}
    row = json.loads(proc.stdout.strip().splitlines()[-1])
    return {"variant": name, "flags": flags, "status": "ok",
            "wall_s": wall, **row}


def worker(iters: int) -> None:
    sys.path.insert(0, ROOT)
    from benchmarks.run_all import bench_flagship

    print(json.dumps(bench_flagship("bfloat16", iters)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--out", default="benchmarks/xla_flags_ab.json")
    args = ap.parse_args()
    if args.worker:
        worker(args.iters)
        return

    runs = []
    for rep in range(args.reps):
        for name, flags in VARIANTS.items():
            row = run_variant(name, flags, args.iters)
            row["rep"] = rep
            runs.append(row)
            print(json.dumps(row))

    summary = {}
    for name in VARIANTS:
        ok = [r["ms_per_step"] for r in runs
              if r["variant"] == name and r["status"] == "ok"]
        summary[name] = {"ms_median": sorted(ok)[len(ok) // 2] if ok
                         else None, "n_ok": len(ok)}
    out = {"runs": runs, "summary": summary}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
