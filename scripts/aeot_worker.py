#!/usr/bin/env python
"""Persistent AE-OT generation worker (warm serving path).

The reference server runs scripts/run_aeot_end2end.py as a fresh
subprocess per task (api/server.py:509-559). On this image the first
device contact of every process pays 200-870 s of TPU-relay backend init
(measured, r3), so per-task subprocesses dominate serving latency. This
worker is the TPU-native alternative the server's --warm_worker mode
uses: one long-lived process that pays backend init and jit compiles
once, then executes generation jobs from a line-based JSON protocol.

Protocol (one JSON object per line):
  stdin : {"op": "ping"}                  -> {"ok": true}
          {"op": "run", "argv": [...]}    -> {"status": "done"|"failed",
                                              "run_dir": str, "error": str,
                                              "stdout_tail": str}
          {"op": "exit"}                  -> (worker exits 0)

All pipeline prints are captured and returned as stdout_tail (the
protocol stream carries only JSON lines; Python-level stdout is swapped
during job execution). The AE bundle is cached across jobs keyed by
(config, ckpt, checkpoint mtime) so repeat requests skip model reload,
and the decode jit cache persists for the process lifetime.
"""

from __future__ import annotations

import io
import json
import os
import sys
import traceback
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import run_aeot_end2end as e2e  # noqa: E402  (scripts/ sibling import)

_BUNDLES: dict = {}


def _get_bundle(config: str, ckpt: str):
    from pytorch_vae_tpu.pipelines.inference import AEBundle

    try:
        mtime = os.path.getmtime(ckpt)
    except OSError:
        mtime = 0.0
    key = (os.path.abspath(config), os.path.abspath(ckpt), mtime)
    if key not in _BUNDLES:
        _BUNDLES.clear()  # one model resident at a time (device memory)
        _BUNDLES[key] = AEBundle.from_checkpoint(config, ckpt)
    return _BUNDLES[key]


def _run_job(argv: list) -> dict:
    args = e2e.parse_args(argv)
    buf = io.StringIO()
    try:
        with redirect_stdout(buf):
            bundle = _get_bundle(args.ae_config, args.ae_ckpt)
            summary = e2e.run(args, bundle=bundle)
        return {"status": "done", "run_dir": summary["run_dir"],
                "stdout_tail": buf.getvalue()[-4000:]}
    except SystemExit as e:  # argparse errors
        return {"status": "failed", "error": f"bad argv: {e}",
                "stdout_tail": buf.getvalue()[-4000:]}
    except Exception:
        return {"status": "failed",
                "error": traceback.format_exc()[-4000:],
                "stdout_tail": buf.getvalue()[-4000:]}


def main() -> None:
    # Protocol stream = the real stdout; anything the pipeline prints
    # outside redirect_stdout scope must not corrupt it.
    proto = os.fdopen(os.dup(1), "w", buffering=1)
    sys.stdout = sys.stderr

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError:
            proto.write(json.dumps(
                {"status": "failed", "error": "bad json"}) + "\n")
            continue
        op = req.get("op")
        if op == "exit":
            break
        if op == "ping":
            proto.write(json.dumps({"ok": True}) + "\n")
            continue
        if op == "run":
            proto.write(json.dumps(_run_job(req.get("argv") or [])) + "\n")
            continue
        proto.write(json.dumps(
            {"status": "failed", "error": f"unknown op {op!r}"}) + "\n")


if __name__ == "__main__":
    main()
