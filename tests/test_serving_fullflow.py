"""Serving full-flow integration: generate -> worker subprocess (tiny
ckpt) -> done -> curve listing/detail -> pdb-align -> downstream stage ->
downstream pdb/compare routes.

This covers what the round-1 suite only exercised via --selftest: the
worker loop, real subprocess execution of scripts/run_aeot_end2end.py,
summary parsing, and every downstream GET route added for parity with
the reference api/server.py:687-1040.
"""

import json
import os
import shutil
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
from pathlib import Path

import numpy as np
import pytest

from conftest import TINY_MODEL


def _get(url):
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


@pytest.fixture(scope="module")
def flow(tiny_ckpt, tmp_path_factory):
    """Server + a completed generation task against the tiny checkpoint."""
    from pytorch_vae_tpu.serving.server import serve

    config_path, ckpt_path = tiny_ckpt
    root = tmp_path_factory.mktemp("flow")
    n_bank = 24
    flat = TINY_MODEL["latent_tokens"] * TINY_MODEL["code_dim"]
    rng = np.random.default_rng(0)
    np.savez(root / "bank.npz",
             latents=rng.normal(size=(n_bank, flat)).astype(np.float32),
             lengths=rng.integers(16, 48, size=n_bank))
    np.savez(root / "h.npz", h=np.zeros(n_bank, np.float32))

    httpd = serve(
        "127.0.0.1", 0,
        defaults={"ae_config": config_path, "ae_ckpt": ckpt_path,
                  "features_pt": str(root / "bank.npz"),
                  "ot_h": str(root / "h.npz"),
                  "out_root": str(root / "runs"),
                  "downstream_mock": True},
        # subprocesses must not dial the TPU relay in the test env
        extra_env={"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": None})
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"

    code, body = _post(base + "/generate", {
        "n_generate": 6, "num_gen_x": 512, "ot_bat_size_n": 256,
        "ot_thresh": 1.5, "ot_topk": 3, "ot_samples_per_pair": 2,
        "min_length": 8, "seed": 0})
    assert code == 200, body
    tid = json.loads(body)["task_id"]
    deadline = time.time() + 420
    status = "queued"
    while time.time() < deadline:
        code, body = _get(f"{base}/tasks/{tid}")
        status = json.loads(body)["status"]
        if status in ("done", "failed"):
            break
        time.sleep(2)
    task = json.loads(body)
    assert status == "done", task.get("error", task)

    # promote two generated curves to "filtered" so name-addressed curve
    # + pdb routes have accepted artifacts to serve (the 1-step demo
    # model's decodes all fail the geometric filter, by design)
    run = Path(task["run_dir"])
    rej = [json.loads(line)
           for line in (run / "rejected_manifest.jsonl").open()
           if line.strip()]
    (run / "filtered_npy").mkdir(exist_ok=True)
    with (run / "filtered_manifest.jsonl").open("w") as mf:
        for rec in rej[:2]:
            name = Path(rec["recon_path"]).name
            dst = run / "filtered_npy" / name
            shutil.copy(rec["recon_path"], dst)
            mf.write(json.dumps({**rec, "recon_path": str(dst),
                                 "reject_reason": None}) + "\n")

    yield base, tid, task
    httpd.shutdown()


def test_summary_parsed(flow):
    _base, _tid, task = flow
    s = task["summary"]
    assert "reject_counts" in s and "timing_sec" in s
    # the tiny 24-point bank may yield fewer than n_generate unique OT
    # pairs (seed-scheme dependent); decoded = min(n_generate, candidates)
    assert s["total_decoded"] == min(
        6, s["ot_candidates_after_angle_unique"])
    assert s["total_decoded"] >= 2


def test_curve_listing_and_detail_by_name_and_index(flow):
    base, tid, _ = flow
    code, body = _get(f"{base}/tasks/{tid}/curves")
    assert code == 200
    listing = json.loads(body)
    assert listing["count"] == 2
    name = Path(listing["curves"][0]["recon_path"]).name
    code, body = _get(f"{base}/tasks/{tid}/curves/{name}")
    assert code == 200
    detail = json.loads(body)
    assert detail["name"] == name
    assert len(detail["xyz"]) == len(detail["ss_idx"]) > 0
    idx = listing["curves"][0]["i"]
    code, body2 = _get(f"{base}/tasks/{tid}/curves/{idx}")
    assert code == 200
    assert json.loads(body2)["xyz"] == detail["xyz"]


def test_rejected_curves_routes(flow):
    base, tid, _ = flow
    code, body = _get(f"{base}/tasks/{tid}/rejected-curves?limit=3")
    assert code == 200
    listing = json.loads(body)
    assert 0 < listing["count"] <= 3
    name = Path(listing["curves"][0]["recon_path"]).name
    code, body = _get(f"{base}/tasks/{tid}/rejected-curves/{name}")
    assert code == 200
    assert json.loads(body)["metrics"]["reject_reason"]


def test_pdb_and_alignment(flow):
    base, tid, _ = flow
    code, body = _get(f"{base}/tasks/{tid}/curves")
    names = [Path(r["recon_path"]).name
             for r in json.loads(body)["curves"]]
    code, text = _get(f"{base}/tasks/{tid}/pdb/{names[0]}")
    assert code == 200 and "ATOM" in text
    code, aligned = _get(
        f"{base}/tasks/{tid}/pdb/{names[0]}?align_to={names[1]}")
    assert code == 200 and "ATOM" in aligned
    assert aligned != text  # the transform moved the coordinates


def test_downstream_stage_and_pdb_routes(flow):
    base, tid, _ = flow
    code, body = _post(f"{base}/tasks/{tid}/downstream-selection",
                       {"selected": [0, 1]})
    assert code == 200
    code, body = _post(f"{base}/tasks/{tid}/run-downstream",
                       {"stage": "backbone"})
    assert code == 200

    deadline = time.time() + 240
    while time.time() < deadline:
        code, body = _get(f"{base}/tasks/{tid}/downstream")
        ds = json.loads(body)
        st = ds["stages"].get("backbone", {}).get("status")
        if st in ("done", "failed"):
            break
        time.sleep(1)
    assert st == "done", ds
    assert ds["action"] == "backbone"
    assert ds["started_at"] is not None and ds["ended_at"] is not None
    summary = ds["stages"]["backbone"]["summary"]
    assert summary["status"] == "done" and summary["n_curves"] == 2

    # find the written pdbs through the summary names
    pdbs = [f"{n}_curve.pdb" for n in summary["names"]]
    q = urllib.parse.quote(pdbs[0])
    code, body = _get(f"{base}/tasks/{tid}/downstream-pdb?path={q}")
    assert code == 200
    payload = json.loads(body)
    assert payload["length"] == len(payload["xyz"]) > 0

    code, text = _get(f"{base}/tasks/{tid}/downstream-pdb-text?path={q}")
    assert code == 200 and "ATOM" in text

    ref, mob = (urllib.parse.quote(p) for p in pdbs[:2])
    code, body = _get(
        f"{base}/tasks/{tid}/downstream-compare?ref={ref}&mobile={mob}")
    assert code == 200
    cmp_ = json.loads(body)
    assert cmp_["length"] > 0
    assert len(cmp_["ref_xyz"]) == len(cmp_["mobile_xyz"]) == cmp_["length"]

    code, body = _get(f"{base}/tasks/{tid}/downstream-compare-pdb-text"
                      f"?ref={ref}&mobile={mob}")
    assert code == 200
    both = json.loads(body)
    assert "ATOM" in both["ref_pdb"] and "ATOM" in both["mobile_pdb"]

    # path escape attempts are rejected
    evil = urllib.parse.quote("../../etc/passwd")
    code, _ = _get(f"{base}/tasks/{tid}/downstream-pdb?path={evil}")
    assert code == 404


def test_downstream_sequence_fold_and_evaluation(flow):
    base, tid, _ = flow
    for stage, route in (("sequence_fold", "run-sequence-fold"),
                         ("evaluation", "run-evaluation")):
        code, _ = _post(f"{base}/tasks/{tid}/{route}", {})
        assert code == 200
        deadline = time.time() + 240
        st = None
        while time.time() < deadline:
            _, body = _get(f"{base}/tasks/{tid}/downstream")
            ds = json.loads(body)
            st = ds["stages"].get(stage, {}).get("status")
            if st in ("done", "failed"):
                break
            time.sleep(1)
        assert st == "done", ds
    assert ds["action"] == "evaluation"
    ev = ds["stages"]["evaluation"]["summary"]
    assert ev["status"] == "done"
    # per-structure metric rows feed the web UI evaluation table
    assert ev["per_curve"] and "aggregate" in ev
    for row in ev["per_curve"]:
        assert row["plddt_mean"] is not None

    # folded outputs are full-backbone PDBs: the downstream-pdb route
    # must ship the atom-level payload (stick renderer data path)
    name = ev["per_curve"][0]["name"]
    q = urllib.parse.quote(f"{name}_folded.pdb")
    code, body = _get(f"{base}/tasks/{tid}/downstream-pdb?path={q}")
    assert code == 200
    payload = json.loads(body)
    atoms = payload["atoms"]
    n_res = payload["length"]
    assert len(atoms["xyz"]) == 4 * n_res        # N, CA, C, O
    # intra-residue bonds (N-CA, CA-C, C-O) are placed at ideal covalent
    # distances by write_pdb_backbone, so inference always recovers all
    # 3*n of them; the mock decode's arbitrary-scale CA trace may add
    # extra legitimate close contacts, so no exact upper bound here
    # (the clean-geometry exact-graph case is tests/test_serving.py::
    # test_parse_pdb_atoms_and_bonds_roundtrip)
    assert len(atoms["bonds"]) >= 3 * n_res
    assert len(atoms["bfactor"]) == 4 * n_res
    assert max(atoms["bfactor"]) > 0             # pLDDT column populated
    # CA-only files must NOT carry the atom payload
    q = urllib.parse.quote(f"{name}_curve.pdb")
    _, body = _get(f"{base}/tasks/{tid}/downstream-pdb?path={q}")
    assert "atoms" not in json.loads(body)


def test_warm_worker_two_tasks_one_process(tiny_ckpt, tmp_path_factory):
    """--warm_worker mode: two generate tasks run in ONE persistent
    worker process (pid stable across tasks), both complete, and the
    second reuses the cached AE bundle (no reload line in its tail)."""
    from pytorch_vae_tpu.serving.server import serve

    config_path, ckpt_path = tiny_ckpt
    root = tmp_path_factory.mktemp("warm")
    n_bank = 24
    flat = TINY_MODEL["latent_tokens"] * TINY_MODEL["code_dim"]
    rng = np.random.default_rng(0)
    np.savez(root / "bank.npz",
             latents=rng.normal(size=(n_bank, flat)).astype(np.float32),
             lengths=rng.integers(16, 48, size=n_bank))
    np.savez(root / "h.npz", h=np.zeros(n_bank, np.float32))

    httpd = serve(
        "127.0.0.1", 0,
        defaults={"ae_config": config_path, "ae_ckpt": ckpt_path,
                  "features_pt": str(root / "bank.npz"),
                  "ot_h": str(root / "h.npz"),
                  "out_root": str(root / "runs")},
        extra_env={"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": None},
        warm_worker=True)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    state = httpd.state

    try:
        pids, tails = [], []
        for seed in (0, 1):
            code, body = _post(base + "/generate", {
                "n_generate": 4, "num_gen_x": 512, "ot_bat_size_n": 256,
                "ot_thresh": 1.5, "min_length": 8, "seed": seed})
            assert code == 200, body
            tid = json.loads(body)["task_id"]
            deadline = time.time() + 420
            while time.time() < deadline:
                code, body = _get(f"{base}/tasks/{tid}")
                task = json.loads(body)
                if task["status"] in ("done", "failed"):
                    break
                time.sleep(1)
            assert task["status"] == "done", task.get("error", task)
            assert state._warm_proc is not None
            assert state._warm_proc.poll() is None  # still alive
            pids.append(state._warm_proc.pid)
            tails.append(task.get("stdout_tail", ""))
            assert Path(task["run_dir"]).joinpath("summary.json").exists()
        assert pids[0] == pids[1], "worker was not reused across tasks"
        assert "[info] Loading AE ..." not in tails[1], (
            "second task reloaded the AE bundle")
    finally:
        httpd.shutdown()
        if state._warm_proc is not None:
            state._warm_proc.kill()


def test_warm_worker_killed_mid_task_recovers(tiny_ckpt, tmp_path_factory):
    """Tunnel-death resilience (round 5): kill the warm worker while a
    task is EXECUTING; the server must restart a fresh worker and re-run
    the task to `done`, not fail it. The reference fails the task on any
    worker error (api/server.py:547-558); the axon relay's measured
    multi-hour outages make graceful restart + re-queue a requirement
    here (CLAUDE.md r3 notes)."""
    from pytorch_vae_tpu.serving.server import serve

    config_path, ckpt_path = tiny_ckpt
    root = tmp_path_factory.mktemp("warmkill")
    n_bank = 24
    flat = TINY_MODEL["latent_tokens"] * TINY_MODEL["code_dim"]
    rng = np.random.default_rng(0)
    np.savez(root / "bank.npz",
             latents=rng.normal(size=(n_bank, flat)).astype(np.float32),
             lengths=rng.integers(16, 48, size=n_bank))
    np.savez(root / "h.npz", h=np.zeros(n_bank, np.float32))

    httpd = serve(
        "127.0.0.1", 0,
        defaults={"ae_config": config_path, "ae_ckpt": ckpt_path,
                  "features_pt": str(root / "bank.npz"),
                  "ot_h": str(root / "h.npz"),
                  "out_root": str(root / "runs")},
        extra_env={"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": None},
        warm_worker=True)
    httpd.state.warm_retry_backoff_s = 0.5  # test speed; default 5 s
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    state = httpd.state

    try:
        code, body = _post(base + "/generate", {
            "n_generate": 4, "num_gen_x": 512, "ot_bat_size_n": 256,
            "ot_thresh": 1.5, "min_length": 8, "seed": 0})
        assert code == 200, body
        tid = json.loads(body)["task_id"]

        # kill the worker the moment the task is running and the worker
        # process exists: the fresh worker's bundle-load + jit compile
        # (tens of seconds on CPU) guarantees we land mid-execution
        killed_pid = None
        deadline = time.time() + 120
        while time.time() < deadline:
            _, body = _get(f"{base}/tasks/{tid}")
            if json.loads(body)["status"] == "running" and \
                    state._warm_proc is not None and \
                    state._warm_proc.poll() is None:
                killed_pid = state._warm_proc.pid
                state._warm_proc.kill()
                break
            time.sleep(0.05)
        assert killed_pid is not None, "never saw a live worker mid-task"

        deadline = time.time() + 420
        while time.time() < deadline:
            _, body = _get(f"{base}/tasks/{tid}")
            task = json.loads(body)
            if task["status"] in ("done", "failed"):
                break
            time.sleep(1)
        assert task["status"] == "done", task.get("error", task)
        assert Path(task["run_dir"]).joinpath("summary.json").exists()
        # the task completed on a DIFFERENT (restarted) worker process
        assert state._warm_proc is not None
        assert state._warm_proc.pid != killed_pid
    finally:
        httpd.shutdown()
        if state._warm_proc is not None:
            state._warm_proc.kill()
