"""Curve generation REST service + web viewer host.

Rebuild of the reference FastAPI app (api/server.py) on the Python
standard library (this image ships no fastapi/uvicorn): a
ThreadingHTTPServer with the same endpoint surface, task queue, single
worker thread guarded by a device lock, and subprocess execution of the
generation pipeline — the API process never imports the model
(api/server.py:509-559 runs scripts/run_aeot_end2end.py as a subprocess;
ours does the same with the TPU lock replacing the GPU lock).

Endpoints (api/server.py:618-1040):
  GET  /health
  POST /generate                      -> {task_id}
  GET  /tasks/{id}                    -> status + parsed summary.json
  GET  /tasks/{id}/curves[?which=&limit=]  filtered/rejected curve listing
  GET  /tasks/{id}/curves/{idx|name}  -> xyz + ss_idx + manifest metrics
  GET  /tasks/{id}/rejected-curves[/{name}]  explicit rejected routes
                                         (api/server.py:721-752)
  GET/POST /tasks/{id}/downstream-selection
  POST /tasks/{id}/run-downstream     -> {stage: backbone|sequence_fold|
                                          evaluation}
  GET  /tasks/{id}/downstream         -> stage statuses + parsed stage
                                         summaries (api/server.py:814-836)
  GET  /tasks/{id}/downstream-pdb?path=       (api/server.py:942-958)
  GET  /tasks/{id}/downstream-pdb-text?path=  (api/server.py:960-972)
  GET  /tasks/{id}/downstream-compare?ref=&mobile=          (:974-1011)
  GET  /tasks/{id}/downstream-compare-pdb-text?ref=&mobile= (:1013-1040)
  GET  /tasks/{id}/pdb/{name}         -> PDB text (optionally aligned to
                                         ?align_to=<other name>)
  GET  /                              -> web/index.html (no-cache)

Run:  python -m pytorch_vae_tpu.serving.server --port 8000
      python -m pytorch_vae_tpu.serving.server --selftest   (no socket use
      beyond loopback; exercises every handler)
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import re
import subprocess
import sys
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from . import pdb_utils

REPO_ROOT = Path(__file__).resolve().parents[2]

DEFAULTS = {
    "ae_config": str(REPO_ROOT / "configs" / "stage1_ae.yaml"),
    "ae_ckpt": str(REPO_ROOT / "checkpoints" / "stage1_ae" / "last"),
    "features_pt": str(REPO_ROOT / "results" / "latents.npz"),
    "ot_h": str(REPO_ROOT / "results" / "h.npz"),
    "out_root": str(REPO_ROOT / "results" / "api_runs"),
}


class TaskState:
    def __init__(self, task_id: str, kind: str, params: Dict):
        self.task_id = task_id
        self.kind = kind
        self.params = params
        self.status = "queued"  # queued | running | done | failed
        self.created = time.time()
        self.run_dir: Optional[str] = None
        self.error: Optional[str] = None
        self.stdout_tail: str = ""
        self.downstream: Dict[str, Dict] = {}

    def to_json(self) -> Dict:
        out = {
            "task_id": self.task_id, "kind": self.kind,
            "status": self.status, "created": self.created,
            "run_dir": self.run_dir, "error": self.error,
            "downstream": self.downstream,
        }
        if self.run_dir:
            sp = Path(self.run_dir) / "summary.json"
            if sp.exists():
                try:
                    out["summary"] = json.loads(sp.read_text())
                except Exception:
                    pass
        return out


class ServerState:
    """Task registry + worker threads (api/server.py:509-599)."""

    def __init__(self, defaults: Dict, python_exe: str = sys.executable,
                 extra_env: Optional[Dict] = None,
                 warm_worker: bool = False):
        self.defaults = dict(defaults)
        self.python = python_exe
        self.extra_env = dict(extra_env or {})
        self.tasks: Dict[str, TaskState] = {}
        self.task_queue: "queue.Queue[TaskState]" = queue.Queue()
        self.downstream_queue: "queue.Queue[tuple]" = queue.Queue()
        self.device_lock = threading.Lock()
        self._workers_started = False
        # warm mode (extension beyond the reference's per-task subprocess,
        # api/server.py:509-559): one persistent scripts/aeot_worker.py
        # process keeps the backend + jit caches alive across tasks, so
        # only the first request pays the 200-870 s relay/backend init.
        self.warm_worker = bool(warm_worker)
        self._warm_proc: Optional[subprocess.Popen] = None
        # tunnel-death resilience (the axon relay has measured multi-hour
        # outages, CLAUDE.md r3): a task whose worker dies mid-flight or
        # returns a backend-unavailable error is re-queued to a FRESH
        # worker up to warm_retry_attempts times with backoff, instead of
        # failing the task the way the reference does on any worker error
        # (api/server.py:547-558).
        self.warm_retry_attempts = 3
        self.warm_retry_backoff_s = 5.0

    def start_workers(self) -> None:
        if self._workers_started:
            return
        threading.Thread(target=self._worker_loop, daemon=True).start()
        threading.Thread(target=self._downstream_loop, daemon=True).start()
        self._workers_started = True

    # -- generation worker --------------------------------------------
    def _build_cmd(self, t: TaskState) -> list:
        p = {**self.defaults, **t.params}
        cmd = [
            self.python, str(REPO_ROOT / "scripts" / "run_aeot_end2end.py"),
            "--ae_config", str(p["ae_config"]),
        ]
        # common args: run_aeot_end2end.py needs these in BOTH sampling
        # modes (--ae_ckpt/--out_root/--n_generate are required=True and
        # the VQ bundle loads from ae_ckpt even on the prior path)
        cmd += [
            "--ae_ckpt", str(p["ae_ckpt"]),
            "--out_root", str(p["out_root"]),
            "--run_name", t.task_id,
            "--n_generate", str(int(p.get("n_generate", 1000))),
            "--min_length", str(int(p.get("min_length", 32))),
            "--min_pairwise_dist",
            str(float(p.get("min_pairwise_dist", 2.0))),
            "--neighbor_exclude", str(int(p.get("neighbor_exclude", 2))),
            "--seed", str(int(p.get("seed", 0))),
        ]
        if p.get("prior_dir"):
            # learned code-prior sampling (stage-2 models): replaces the
            # OT stage, scripts/run_aeot_end2end.py --prior_dir
            cmd += [
                "--prior_dir", str(p["prior_dir"]),
                "--prior_temperature",
                str(float(p.get("prior_temperature", 1.0))),
                "--prior_top_k", str(int(p.get("prior_top_k", 0))),
            ]
        else:
            cmd += [
                "--features_pt", str(p["features_pt"]),
                "--ot_h", str(p["ot_h"]),
                "--num_gen_x", str(int(p.get("num_gen_x", 50000))),
                "--ot_bat_size_n", str(int(p.get("ot_bat_size_n", 10000))),
                "--ot_thresh", str(float(p.get("ot_thresh", 0.3))),
                "--ot_topk", str(int(p.get("ot_topk", 2))),
                "--ot_samples_per_pair",
                str(int(p.get("ot_samples_per_pair", 1))),
            ]
        if p.get("select_random", True):
            cmd.append("--select_random")
        return cmd

    def _subproc_env(self) -> Dict:
        # extra_env overrides; a None value REMOVES the var
        # (tests drop the TPU-relay dial for CPU subprocesses)
        env = {**os.environ, **self.extra_env}
        return {k: v for k, v in env.items() if v is not None}

    def _ensure_warm_proc(self) -> subprocess.Popen:
        if self._warm_proc is not None and self._warm_proc.poll() is None:
            return self._warm_proc
        log_dir = REPO_ROOT / "logs"
        log_dir.mkdir(exist_ok=True)
        stderr_log = (log_dir / "aeot_worker.log").open("ab")
        self._warm_proc = subprocess.Popen(
            [self.python, str(REPO_ROOT / "scripts" / "aeot_worker.py")],
            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
            stderr=stderr_log, text=True, bufsize=1,
            cwd=str(REPO_ROOT), env=self._subproc_env())
        return self._warm_proc

    # failure signatures of a dead TPU tunnel/backend: the worker process
    # survives but its cached backend handle is unusable, so the task
    # error (not the process exit) is the restart signal.
    _BACKEND_DEAD_RE = re.compile(
        r"UNAVAILABLE|DEADLINE_EXCEEDED|failed to connect|Socket closed|"
        r"Connection reset|backend.*(unavailable|lost)", re.IGNORECASE)

    def _kill_warm_proc(self) -> None:
        if self._warm_proc is not None:
            try:
                self._warm_proc.kill()
                self._warm_proc.wait(timeout=10)
            except (OSError, subprocess.TimeoutExpired):
                pass
        self._warm_proc = None

    def _run_warm(self, t: TaskState) -> Dict:
        """Execute one task in the persistent worker.

        Graceful restart on tunnel death: if the worker dies mid-task
        (EOF/broken pipe) OR stays alive but reports a backend-
        unavailable error, the task is re-run on a FRESH worker, up to
        warm_retry_attempts times with warm_retry_backoff_s between
        attempts. Re-running the same task_id is safe: run dirs are
        created exist_ok and every artifact is rewritten.
        """
        argv = self._build_cmd(t)[2:]  # strip python + script path
        last_err = "warm worker failed"
        for attempt in range(1, self.warm_retry_attempts + 1):
            if attempt > 1:
                time.sleep(self.warm_retry_backoff_s)
            proc = self._ensure_warm_proc()
            line = ""
            try:
                proc.stdin.write(json.dumps(
                    {"op": "run", "argv": argv}) + "\n")
                proc.stdin.flush()
                line = proc.stdout.readline()
            except (BrokenPipeError, OSError):
                line = ""
            if not line:  # worker died mid-task: fresh worker, retry
                last_err = (f"warm worker died mid-task "
                            f"(attempt {attempt})")
                self._kill_warm_proc()
                continue
            try:
                res = json.loads(line)
            except json.JSONDecodeError:
                return {"status": "failed",
                        "error": f"bad worker reply: {line[:200]!r}"}
            err = str(res.get("error") or "")
            if res.get("status") != "done" and \
                    self._BACKEND_DEAD_RE.search(err):
                # worker alive, backend dead: its cached handle is
                # unusable — restart the process, not just the request
                last_err = err
                self._kill_warm_proc()
                continue
            return res
        return {"status": "failed",
                "error": f"warm worker failed after "
                         f"{self.warm_retry_attempts} attempts; last: "
                         f"{last_err[-2000:]}; see logs/aeot_worker.log"}

    def _worker_loop(self) -> None:
        while True:
            t = self.task_queue.get()
            t.status = "running"
            try:
                if self.warm_worker:
                    with self.device_lock:
                        res = self._run_warm(t)
                    t.stdout_tail = (res.get("stdout_tail") or "")[-4000:]
                    if res.get("status") == "done" and res.get("run_dir"):
                        t.run_dir = str(res["run_dir"])
                        t.status = "done"
                    else:
                        t.status = "failed"
                        t.error = (res.get("error") or "unknown")[-4000:]
                    continue
                with self.device_lock:
                    proc = subprocess.run(
                        self._build_cmd(t), capture_output=True, text=True,
                        cwd=str(REPO_ROOT), env=self._subproc_env())
                t.stdout_tail = (proc.stdout or "")[-4000:]
                if proc.returncode != 0:
                    t.status = "failed"
                    t.error = (proc.stderr or "")[-4000:]
                    continue
                m = re.search(r"\[done\] outputs: (.+)", proc.stdout or "")
                if m:
                    t.run_dir = m.group(1).strip()
                    t.status = "done"
                else:
                    t.status = "failed"
                    t.error = "could not locate run_dir in pipeline output"
            except Exception as e:  # worker must never die
                t.status = "failed"
                t.error = repr(e)

    # -- downstream worker --------------------------------------------
    def _downstream_loop(self) -> None:
        while True:
            t, stage = self.downstream_queue.get()
            rec = t.downstream.setdefault(stage, {})
            rec["status"] = "running"
            rec["started_at"] = time.time()
            rec["ended_at"] = None
            try:
                cmd = [
                    self.python,
                    str(REPO_ROOT / "scripts" /
                        "run_protpainter_downstream.py"),
                    "--run_dir", str(t.run_dir), "--stage", stage,
                ]
                if self.defaults.get("downstream_mock", True):
                    cmd.append("--mock")
                proc = subprocess.run(cmd, capture_output=True, text=True,
                                      cwd=str(REPO_ROOT))
                rec["stdout_tail"] = (proc.stdout or "")[-2000:]
                if proc.returncode != 0:
                    rec["status"] = "failed"
                    rec["error"] = (proc.stderr or "")[-2000:]
                else:
                    rec["status"] = "done"
            except Exception as e:
                rec["status"] = "failed"
                rec["error"] = repr(e)
            finally:
                rec["ended_at"] = time.time()

    # -- API operations -----------------------------------------------
    def submit_generate(self, params: Dict) -> TaskState:
        p = {**self.defaults, **params}
        for key in ("ae_config", "ae_ckpt", "features_pt", "ot_h"):
            if not os.path.exists(str(p[key])):
                raise FileNotFoundError(f"{key} not found: {p[key]}")
        t = TaskState(uuid.uuid4().hex[:12], "generate", params)
        self.tasks[t.task_id] = t
        self.task_queue.put(t)
        return t

    def get_task(self, task_id: str) -> TaskState:
        if task_id not in self.tasks:
            raise KeyError(task_id)
        return self.tasks[task_id]

    def list_curves(self, t: TaskState, which: str = "filtered",
                    limit: Optional[int] = None) -> Dict:
        if not t.run_dir:
            return {"curves": []}
        run = Path(t.run_dir)
        manifest = run / f"{which}_manifest.jsonl"
        out = []
        if manifest.exists():
            for line in manifest.open():
                line = line.strip()
                if line:
                    out.append(json.loads(line))
        if limit is not None:
            # reference clamps limit to [1, 48] filtered / [1, 96] rejected
            # (api/server.py:695,730)
            cap = 96 if which == "rejected" else 48
            out = out[: max(1, min(int(limit), cap))]
        return {"curves": out, "count": len(out), "run_dir": t.run_dir,
                "task_id": t.task_id}

    def _curve_record(self, t: TaskState, key: str,
                      which: str) -> Dict:
        listing = self.list_curves(t, which)["curves"]
        if key.isdigit():
            rec = next((r for r in listing
                        if int(r.get("i", -1)) == int(key)), None)
        else:  # by file name (reference addresses curves by name,
            # api/server.py:706-718)
            rec = next(
                (r for r in listing
                 if Path(r.get("recon_path", "")).name == key), None)
        if rec is None:
            raise KeyError(f"curve {key}")
        return rec

    def curve_detail(self, t: TaskState, key: str,
                     which: str = "filtered") -> Dict:
        rec = self._curve_record(t, key, which)
        arr = pdb_utils.load_curve6(rec["recon_path"])
        xyz = arr[:, :3]
        ss_idx = (np.argmax(arr[:, 3:6], axis=-1)
                  if arr.shape[1] >= 6 else
                  pdb_utils.assign_ss_from_xyz(xyz))
        return {"i": rec.get("i"), "name": Path(rec["recon_path"]).name,
                "xyz": xyz.tolist(),
                "ss_idx": ss_idx.astype(int).tolist(), "metrics": rec}

    # -- downstream inspection (api/server.py:814-836, 942-1040) -------
    def downstream_dir(self, t: TaskState) -> Path:
        if not t.run_dir:
            raise KeyError("task has no run_dir yet")
        return Path(t.run_dir) / "downstream"

    def downstream_status(self, t: TaskState) -> Dict:
        """Per-stage statuses + parsed <stage>_summary.json files."""
        stages = {}
        out_dir = Path(t.run_dir) / "downstream" if t.run_dir else None
        for stage, rec in t.downstream.items():
            entry = dict(rec)
            if out_dir is not None:
                sp = out_dir / f"{stage}_summary.json"
                if sp.exists():
                    try:
                        entry["summary"] = json.loads(sp.read_text())
                    except Exception:
                        entry["summary"] = None
            stages[stage] = entry
        last = None
        for stage in ("evaluation", "sequence_fold", "backbone"):
            if stage in t.downstream:
                last = stage
                break
        last_rec = t.downstream.get(last, {}) if last else {}
        return {
            "task_id": t.task_id,
            "action": last,
            "status": last_rec.get("status"),
            "started_at": last_rec.get("started_at"),
            "ended_at": last_rec.get("ended_at"),
            "output_dir": str(out_dir) if out_dir else None,
            "error": last_rec.get("error"),
            "stages": stages,
        }

    def _downstream_pdb_path(self, t: TaskState, rel: str) -> Path:
        """Resolve + validate a pdb path under the downstream dir
        (the reference rejects anything outside it, api/server.py:947-950).
        """
        base = self.downstream_dir(t).resolve()
        p = Path(rel)
        if not p.is_absolute():
            p = base / p
        p = p.resolve()
        if (p.suffix.lower() != ".pdb" or not p.is_file()
                or base not in p.parents):
            raise KeyError(f"downstream pdb not found: {rel}")
        return p

    def downstream_pdb(self, t: TaskState, rel: str) -> Dict:
        p = self._downstream_pdb_path(t, rel)
        text = p.read_text(errors="ignore")
        trace = pdb_utils.parse_pdb_ca_trace(text)
        xyz = trace["xyz"]
        out = {"path": str(p), "name": p.name, "length": int(len(xyz)),
               "xyz": xyz.tolist(),
               "ss_idx": pdb_utils.assign_ss_from_xyz(xyz)
               .astype(int).tolist()}
        # full-atom payload for the canvas stick renderer (the reference
        # ships raw PDB text to client-side 3Dmol.js instead,
        # api/web/index.html:861,1085) — only when the file actually has
        # non-CA atoms (backbone/folded stages), to keep CA-trace
        # payloads small
        atoms = pdb_utils.parse_pdb_atoms(text)
        if len(atoms["xyz"]) > len(xyz):
            out["atoms"] = {
                "xyz": np.round(atoms["xyz"], 3).tolist(),
                "elements": atoms["elements"].tolist(),
                "res_idx": atoms["res_idx"].tolist(),
                "bfactor": np.round(atoms["bfactor"], 2).tolist(),
                "bonds": atoms["bonds"].tolist(),
            }
        return out

    def downstream_pdb_text(self, t: TaskState, rel: str) -> str:
        return self._downstream_pdb_path(t, rel).read_text(errors="ignore")

    def downstream_compare(self, t: TaskState, ref: str,
                           mobile: str) -> Dict:
        rp = self._downstream_pdb_path(t, ref)
        mp = self._downstream_pdb_path(t, mobile)
        rxyz = pdb_utils.parse_pdb_ca_trace(
            rp.read_text(errors="ignore"))["xyz"]
        mxyz = pdb_utils.parse_pdb_ca_trace(
            mp.read_text(errors="ignore"))["xyz"]
        R, tr, rmsd = pdb_utils.kabsch_align_np(mxyz, rxyz)
        n = min(len(rxyz), len(mxyz))
        maligned = np.asarray(mxyz[:n], np.float64) @ R + tr
        return {
            "ref_path": str(rp), "mobile_path": str(mp),
            "ref_name": rp.name, "mobile_name": mp.name,
            "length": int(n), "rmsd": float(rmsd),
            "ref_xyz": np.asarray(rxyz[:n], float).tolist(),
            "mobile_xyz": maligned.tolist(),
            "ref_ss_idx": pdb_utils.assign_ss_from_xyz(rxyz[:n])
            .astype(int).tolist(),
            "mobile_ss_idx": pdb_utils.assign_ss_from_xyz(
                np.asarray(maligned, np.float32)).astype(int).tolist(),
        }

    def downstream_compare_text(self, t: TaskState, ref: str,
                                mobile: str) -> Dict:
        rp = self._downstream_pdb_path(t, ref)
        mp = self._downstream_pdb_path(t, mobile)
        ref_text = rp.read_text(errors="ignore")
        mob_text = mp.read_text(errors="ignore")
        rxyz = pdb_utils.parse_pdb_ca_trace(ref_text)["xyz"]
        mxyz = pdb_utils.parse_pdb_ca_trace(mob_text)["xyz"]
        R, tr, rmsd = pdb_utils.kabsch_align_np(mxyz, rxyz)
        return {
            "ref_path": str(rp), "mobile_path": str(mp),
            "ref_name": rp.name, "mobile_name": mp.name,
            "length": int(min(len(rxyz), len(mxyz))), "rmsd": float(rmsd),
            "ref_pdb": ref_text,
            "mobile_pdb": pdb_utils.transform_pdb_text(mob_text, R, tr),
        }

    def selection_path(self, t: TaskState) -> Path:
        return Path(t.run_dir) / "selected_manifest.json"

    def pdb_for(self, t: TaskState, name: str,
                align_to: Optional[str] = None) -> str:
        run = Path(t.run_dir)
        src = run / "filtered_npy" / name
        if not src.exists():
            raise KeyError(name)
        xyz = pdb_utils.load_curve6(str(src))[:, :3]
        text = pdb_utils.write_pdb_ca_trace(xyz)
        if align_to:
            ref_path = run / "filtered_npy" / align_to
            if ref_path.exists():
                ref = pdb_utils.load_curve6(str(ref_path))[:, :3]
                R, tr, _ = pdb_utils.kabsch_align_np(xyz, ref)
                text = pdb_utils.transform_pdb_text(text, R, tr)
        return text


# ---------------------------------------------------------------------
# HTTP layer
# ---------------------------------------------------------------------
def make_handler(state: ServerState):
    web_index = Path(__file__).parent / "web" / "index.html"

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send(self, code: int, payload, content_type="application/json"):
            body = (json.dumps(payload).encode()
                    if content_type == "application/json"
                    else payload.encode()
                    if isinstance(payload, str) else payload)
            self.send_response(code)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            # no-cache middleware (api/server.py:608-615)
            self.send_header("Cache-Control",
                             "no-store, no-cache, must-revalidate")
            self.send_header("Pragma", "no-cache")
            self.end_headers()
            self.wfile.write(body)

        def _json_body(self) -> Dict:
            n = int(self.headers.get("Content-Length") or 0)
            if n == 0:
                return {}
            return json.loads(self.rfile.read(n) or b"{}")

        def _err(self, code: int, msg: str):
            self._send(code, {"detail": msg})

        # -- routing --
        def do_GET(self):
            try:
                import urllib.parse

                path, _, query = self.path.partition("?")
                q = {k: v[0]
                     for k, v in urllib.parse.parse_qs(query).items()}
                if path in ("/", "/index.html"):
                    if web_index.exists():
                        self._send(200, web_index.read_text(),
                                   "text/html; charset=utf-8")
                    else:
                        self._err(404, "web UI not found")
                    return
                if path == "/health":
                    self._send(200, {"status": "ok",
                                     "tasks": len(state.tasks)})
                    return
                m = re.fullmatch(r"/tasks/([0-9a-f]+)", path)
                if m:
                    self._send(200, state.get_task(m.group(1)).to_json())
                    return
                m = re.fullmatch(r"/tasks/([0-9a-f]+)/curves", path)
                if m:
                    t = state.get_task(m.group(1))
                    self._send(200, state.list_curves(
                        t, q.get("which", "filtered"), q.get("limit")))
                    return
                m = re.fullmatch(r"/tasks/([0-9a-f]+)/curves/([\w.\-]+)",
                                 path)
                if m:
                    t = state.get_task(m.group(1))
                    self._send(200, state.curve_detail(
                        t, m.group(2), q.get("which", "filtered")))
                    return
                # explicit rejected-curves routes (api/server.py:721-752)
                m = re.fullmatch(r"/tasks/([0-9a-f]+)/rejected-curves", path)
                if m:
                    t = state.get_task(m.group(1))
                    self._send(200, state.list_curves(
                        t, "rejected", q.get("limit")))
                    return
                m = re.fullmatch(
                    r"/tasks/([0-9a-f]+)/rejected-curves/([\w.\-]+)", path)
                if m:
                    t = state.get_task(m.group(1))
                    self._send(200, state.curve_detail(
                        t, m.group(2), "rejected"))
                    return
                # downstream status + pdb/compare (api/server.py:814-1040)
                m = re.fullmatch(r"/tasks/([0-9a-f]+)/downstream", path)
                if m:
                    t = state.get_task(m.group(1))
                    self._send(200, state.downstream_status(t))
                    return
                m = re.fullmatch(r"/tasks/([0-9a-f]+)/downstream-pdb", path)
                if m:
                    t = state.get_task(m.group(1))
                    self._send(200, state.downstream_pdb(t, q["path"]))
                    return
                m = re.fullmatch(r"/tasks/([0-9a-f]+)/downstream-pdb-text",
                                 path)
                if m:
                    t = state.get_task(m.group(1))
                    self._send(200, state.downstream_pdb_text(t, q["path"]),
                               "chemical/x-pdb")
                    return
                m = re.fullmatch(r"/tasks/([0-9a-f]+)/downstream-compare",
                                 path)
                if m:
                    t = state.get_task(m.group(1))
                    self._send(200, state.downstream_compare(
                        t, q["ref"], q["mobile"]))
                    return
                m = re.fullmatch(
                    r"/tasks/([0-9a-f]+)/downstream-compare-pdb-text", path)
                if m:
                    t = state.get_task(m.group(1))
                    self._send(200, state.downstream_compare_text(
                        t, q["ref"], q["mobile"]))
                    return
                m = re.fullmatch(r"/tasks/([0-9a-f]+)/downstream-selection",
                                 path)
                if m:
                    t = state.get_task(m.group(1))
                    sp = state.selection_path(t)
                    self._send(200, json.loads(sp.read_text())
                               if sp.exists() else {"selected": []})
                    return
                m = re.fullmatch(r"/tasks/([0-9a-f]+)/pdb/([\w.\-]+)", path)
                if m:
                    t = state.get_task(m.group(1))
                    self._send(200, state.pdb_for(
                        t, m.group(2), q.get("align_to")),
                        "chemical/x-pdb")
                    return
                self._err(404, f"no route {path}")
            except KeyError as e:
                self._err(404, f"not found: {e}")
            except Exception as e:
                self._err(500, repr(e))

        def do_POST(self):
            try:
                path = self.path.partition("?")[0]
                if path == "/generate":
                    try:
                        t = state.submit_generate(self._json_body())
                    except FileNotFoundError as e:
                        self._err(400, str(e))
                        return
                    self._send(200, {"task_id": t.task_id,
                                     "status": t.status})
                    return
                m = re.fullmatch(r"/tasks/([0-9a-f]+)/downstream-selection",
                                 path)
                if m:
                    t = state.get_task(m.group(1))
                    if not t.run_dir:
                        self._err(400, "task has no run_dir yet")
                        return
                    body = self._json_body()
                    state.selection_path(t).write_text(json.dumps(body))
                    self._send(200, {"ok": True,
                                     "count": len(body.get("selected", []))})
                    return
                # stage-specific aliases (reference exposes separate
                # run-downstream / run-sequence-fold / run-evaluation
                # endpoints, api/server.py:839-939)
                m = re.fullmatch(
                    r"/tasks/([0-9a-f]+)/run-(sequence-fold|evaluation)",
                    path)
                if m:
                    t = state.get_task(m.group(1))
                    stage = m.group(2).replace("-", "_")
                    if t.status != "done":
                        self._err(400, f"task status is {t.status}")
                        return
                    t.downstream.setdefault(stage, {})["status"] = "queued"
                    state.downstream_queue.put((t, stage))
                    self._send(200, {"ok": True, "stage": stage})
                    return
                m = re.fullmatch(r"/tasks/([0-9a-f]+)/run-downstream", path)
                if m:
                    t = state.get_task(m.group(1))
                    stage = self._json_body().get("stage", "backbone")
                    if stage not in ("backbone", "sequence_fold",
                                     "evaluation"):
                        self._err(400, f"unknown stage {stage!r}")
                        return
                    if t.status != "done":
                        self._err(400, f"task status is {t.status}")
                        return
                    t.downstream.setdefault(stage, {})["status"] = "queued"
                    state.downstream_queue.put((t, stage))
                    self._send(200, {"ok": True, "stage": stage})
                    return
                self._err(404, f"no route {path}")
            except KeyError as e:
                self._err(404, f"not found: {e}")
            except Exception as e:
                self._err(500, repr(e))

    return Handler


def serve(host: str = "127.0.0.1", port: int = 8000,
          defaults: Optional[Dict] = None,
          extra_env: Optional[Dict] = None,
          warm_worker: bool = False) -> ThreadingHTTPServer:
    state = ServerState({**DEFAULTS, **(defaults or {})},
                        extra_env=extra_env, warm_worker=warm_worker)
    state.start_workers()
    httpd = ThreadingHTTPServer((host, port), make_handler(state))
    httpd.state = state  # type: ignore[attr-defined]
    return httpd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", type=str, default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    for key, val in DEFAULTS.items():
        ap.add_argument(f"--{key}", type=str, default=val)
    ap.add_argument("--selftest", action="store_true",
                    help="start on an ephemeral port, exercise the "
                         "endpoints via loopback, then exit")
    ap.add_argument("--warm_worker", action="store_true",
                    help="run generation jobs in one persistent worker "
                         "process (backend init + jit caches paid once) "
                         "instead of a subprocess per task")
    args = ap.parse_args()

    defaults = {k: getattr(args, k) for k in DEFAULTS}
    if args.selftest:
        _selftest(defaults)
        return
    httpd = serve(args.host, args.port, defaults,
                  warm_worker=args.warm_worker)
    print(f"[serve] http://{args.host}:{args.port}  (Ctrl-C to stop)")
    httpd.serve_forever()


def _selftest(defaults: Dict) -> None:
    import urllib.request

    httpd = serve("127.0.0.1", 0, defaults)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"

    def get(path):
        with urllib.request.urlopen(base + path) as r:
            return r.status, r.read().decode()

    def post(path, body):
        req = urllib.request.Request(
            base + path, data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, r.read().decode()
        except urllib.error.HTTPError as e:
            return e.code, e.read().decode()

    print("[selftest] /health ->", get("/health"))
    print("[selftest] / ->", get("/")[0])
    code, body = post("/generate", {"n_generate": 5,
                                    "ae_ckpt": "/nonexistent"})
    print("[selftest] bad /generate ->", code, body[:80])
    assert code == 400
    code, body = post("/generate", {"n_generate": 5, "num_gen_x": 2000,
                                    "ot_bat_size_n": 2000,
                                    "ot_thresh": 1.5, "min_length": 8})
    print("[selftest] /generate ->", code, body)
    if code == 200:
        tid = json.loads(body)["task_id"]
        for _ in range(120):
            code, body = get(f"/tasks/{tid}")
            st = json.loads(body)["status"]
            if st in ("done", "failed"):
                break
            time.sleep(2)
        print("[selftest] task ->", json.loads(body)["status"])
        print("[selftest] curves ->",
              get(f"/tasks/{tid}/curves?which=rejected")[1][:120])
        print("[selftest] selection ->",
              post(f"/tasks/{tid}/downstream-selection",
                   {"selected": [0, 1]}))
        print("[selftest] downstream ->",
              post(f"/tasks/{tid}/run-downstream", {"stage": "backbone"}))
        time.sleep(3)
        print("[selftest] task final ->", get(f"/tasks/{tid}")[1][:400])
    httpd.shutdown()
    print("[selftest] OK")


if __name__ == "__main__":
    main()
