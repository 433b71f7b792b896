#!/usr/bin/env python
"""Measure the warm-worker serving win on real hardware.

Starts the serving API in-process with --warm_worker semantics, submits
two identical /generate requests back-to-back (different seeds), and
records each task's wall-clock and pipeline-reported timings. On this
image a fresh pipeline process pays 200-870 s of TPU-relay backend init
(see run_aeot_end2end.py backend_init timing bucket); the warm worker
pays it once, so request 2's wall time is the headline.

Writes one JSON file with both tasks' wall/summary numbers.

Usage:
  python scripts/warm_serving_ab.py \
      --ae_config configs/synth_ae_ft5.yaml \
      --ae_ckpt checkpoints/synth_ae_ft5/last \
      --features results/synth_latents_r3e.npz \
      --ot_h results/synth_h_r3e.npz \
      --out results/api_runs/warm_ab.json \
      [--n_generate 200 --num_gen_x 50000 --cold]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _post(url: str, body: dict) -> dict:
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read().decode())


def _get(url: str) -> dict:
    with urllib.request.urlopen(url) as r:
        return json.loads(r.read().decode())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ae_config", required=True)
    ap.add_argument("--ae_ckpt", required=True)
    ap.add_argument("--features", required=True)
    ap.add_argument("--ot_h", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--out_root", default="results/api_runs")
    ap.add_argument("--n_generate", type=int, default=200)
    ap.add_argument("--num_gen_x", type=int, default=50000)
    ap.add_argument("--ot_bat_size_n", type=int, default=10000)
    ap.add_argument("--timeout_s", type=int, default=3600)
    ap.add_argument("--cold", action="store_true",
                    help="use the default per-task subprocess mode "
                         "instead (control measurement)")
    args = ap.parse_args()

    from pytorch_vae_tpu.serving.server import serve

    httpd = serve(
        "127.0.0.1", 0,
        defaults={"ae_config": args.ae_config, "ae_ckpt": args.ae_ckpt,
                  "features_pt": args.features, "ot_h": args.ot_h,
                  "out_root": args.out_root},
        warm_worker=not args.cold)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"

    tasks = []
    for seed in (0, 1):
        t0 = time.time()
        tid = _post(base + "/generate", {
            "n_generate": args.n_generate, "num_gen_x": args.num_gen_x,
            "ot_bat_size_n": args.ot_bat_size_n,
            "ot_thresh": 0.3, "min_length": 32, "seed": seed,
        })["task_id"]
        deadline = time.time() + args.timeout_s
        task = {}
        while time.time() < deadline:
            task = _get(f"{base}/tasks/{tid}")
            if task.get("status") in ("done", "failed"):
                break
            time.sleep(5)
        wall = time.time() - t0
        rec = {"seed": seed, "status": task.get("status"),
               "wall_s": round(wall, 1),
               "summary_timing": (task.get("summary") or {}).get(
                   "timing_sec"),
               "kept": (task.get("summary") or {}).get("kept"),
               "total_decoded": (task.get("summary") or {}).get(
                   "total_decoded"),
               "error": (task.get("error") or "")[-500:] or None}
        print(f"[warm_ab] request seed={seed}: {rec['status']} "
              f"in {rec['wall_s']}s")
        tasks.append(rec)
        if task.get("status") != "done":
            break

    payload = {"mode": "cold" if args.cold else "warm",
               "n_generate": args.n_generate,
               "num_gen_x": args.num_gen_x, "requests": tasks}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload, indent=2))
    httpd.shutdown()


if __name__ == "__main__":
    main()
