#!/usr/bin/env python
"""Flagship step-time sweep over the flash_min_kv dispatch threshold.

Hypothesis (round-2 profile): ~10 ms/step of the 124.6 ms flagship step
is pallas-boundary layout copies; the cross-attention instances read a
64-token memory, where the XLA einsum path has no boundary. Sweeping the
minimum-kv-length cutoff measures whether routing short-memory attention
to einsum recovers the copies without losing the kernel's wins.

Usage (TPU): python benchmarks/sweep_flash_minkv.py [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--thresholds", type=int, nargs="*",
                    default=[0, 65, 351])
    ap.add_argument("--out", type=str,
                    default="benchmarks/flash_minkv_sweep.json")
    args = ap.parse_args()

    from run_all import bench_flagship
    from pytorch_vae_tpu.ops.flash_attention import set_flash_min_kv

    results = {}
    for thr in args.thresholds:
        set_flash_min_kv(thr)
        r = bench_flagship("bfloat16", args.iters)
        results[str(thr)] = r
        print(f"[sweep] flash_min_kv={thr}: {r['ms_per_step']:.2f} ms "
              f"({r['curves_per_sec']:.0f} curves/s)", flush=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"[done] -> {args.out}")


if __name__ == "__main__":
    main()
