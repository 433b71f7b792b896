"""Serving-layer tests: PDB utils, SS assignment, HTTP surface."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from pytorch_vae_tpu.serving import pdb_utils


def _helix_xyz(n=30):
    t = np.arange(n)
    theta = np.deg2rad(99.6) * t
    xyz = np.stack([2.3 * np.cos(theta), 2.3 * np.sin(theta), 1.5 * t],
                   axis=-1)
    return xyz


def _strand_xyz(n=12):
    t = np.arange(n, dtype=float)
    return np.stack([3.5 * t, np.where(t % 2 == 0, 0.9, -0.9),
                     0.4 * t], axis=-1)


def test_ss_assignment_helix():
    ss = pdb_utils.assign_ss_from_xyz(_helix_xyz())
    # the core of an ideal alpha helix must be classed helix (0)
    assert (ss[4:-4] == 0).mean() > 0.8


def test_ss_assignment_strand_not_helix():
    ss = pdb_utils.assign_ss_from_xyz(_strand_xyz())
    assert (ss == 0).sum() == 0  # nothing helix in an extended strand


def test_ss_assignment_short_curve_is_coil():
    ss = pdb_utils.assign_ss_from_xyz(np.zeros((3, 3)))
    np.testing.assert_array_equal(ss, [2, 2, 2])


def test_pdb_roundtrip():
    xyz = _helix_xyz(15)
    text = pdb_utils.write_pdb_ca_trace(xyz)
    parsed = pdb_utils.parse_pdb_ca_trace(text)
    np.testing.assert_allclose(parsed["xyz"], xyz, atol=1e-3)
    assert parsed["residue_ids"].tolist() == list(range(1, 16))


def test_kabsch_align_np_and_transform():
    xyz = _helix_xyz(20)
    th = 0.8
    R_true = np.array([[np.cos(th), -np.sin(th), 0],
                       [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    target = xyz @ R_true.T + np.array([1.0, -2.0, 3.0])
    R, t, rmsd = pdb_utils.kabsch_align_np(xyz, target)
    assert rmsd < 1e-5
    text = pdb_utils.write_pdb_ca_trace(xyz)
    moved = pdb_utils.parse_pdb_ca_trace(
        pdb_utils.transform_pdb_text(text, R, t))["xyz"]
    np.testing.assert_allclose(moved, target, atol=2e-3)


def test_load_curve6_dict_and_flat(tmp_path):
    xyz = _helix_xyz(8).astype(np.float32)
    ss = np.eye(3, dtype=np.float32)[np.zeros(8, int)]
    p1 = tmp_path / "dict.npy"
    np.save(p1, {"curve_coords": xyz, "ss_one_hot": ss}, allow_pickle=True)
    c1 = pdb_utils.load_curve6(str(p1))
    assert c1.shape == (8, 6)
    p2 = tmp_path / "flat.npy"
    np.save(p2, np.concatenate([xyz, ss], axis=-1))
    np.testing.assert_allclose(pdb_utils.load_curve6(str(p2)), c1)


# ---------------------------------------------------------------------
# HTTP surface (no generation subprocess — fast routes only)
# ---------------------------------------------------------------------
@pytest.fixture(scope="module")
def server():
    from pytorch_vae_tpu.serving.server import serve

    httpd = serve("127.0.0.1", 0, defaults={"ae_ckpt": "/nonexistent"})
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


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


def test_health(server):
    code, body = _get(server + "/health")
    assert code == 200
    assert json.loads(body)["status"] == "ok"


def test_web_ui_served_no_cache(server):
    req = urllib.request.Request(server + "/")
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert "no-store" in r.headers.get("Cache-Control", "")
        assert "AEOT" in r.read().decode()


def test_web_ui_tube_renderer_present(server):
    """The zero-egress viewer ships the cartoon/tube pipeline (VERDICT r2
    #9): Catmull-Rom smoothing, parallel-transport frames, SS-profiled
    extrusion, depth-sorted shaded quads, and a wireframe fallback
    toggle. (No headless browser exists in this image, so coverage is
    asset-level; the geometry helpers are pure functions of the trace.)"""
    with urllib.request.urlopen(server + "/") as r:
        html = r.read().decode()
    for sym in ("smoothCurve", "ptFrames", "tubeTriangles", "SS_PROFILE",
                "tubetoggle", "items.sort", "ELEM_COLORS", "plddtColor",
                "renderEvalTable"):
        assert sym in html, sym


def test_generate_validates_artifact_paths(server):
    code, body = _post(server + "/generate", {"n_generate": 5})
    assert code == 400
    assert "not found" in json.loads(body)["detail"]


def test_unknown_routes_404(server):
    assert _get(server + "/nope")[0] == 404
    assert _get(server + "/tasks/deadbeef")[0] == 404
    code, _ = _post(server + "/tasks/deadbeef/run-downstream",
                    {"stage": "backbone"})
    assert code == 404


def test_downstream_rejects_bad_stage(server):
    code, _ = _post(server + "/tasks/deadbeef/run-downstream",
                    {"stage": "nonsense"})
    assert code == 404  # unknown task wins first
    code, _ = _post(server + "/tasks/deadbeef/run-sequence-fold", {})
    assert code == 404
    code, _ = _post(server + "/tasks/deadbeef/run-evaluation", {})
    assert code == 404


# ---------------------------------------------------------------------
# _build_cmd must produce argv that run_aeot_end2end.py's argparse
# accepts in BOTH sampling modes (the prior path once omitted required
# --ae_ckpt/--out_root/--n_generate and argparse exited 2, failing
# every prior-path serving request).
def _parse_built_cmd(params):
    import importlib.util

    from pytorch_vae_tpu.serving.server import REPO_ROOT, ServerState, \
        TaskState

    st = ServerState(defaults={"ae_config": "cfg.yaml",
                               "ae_ckpt": "ckpt/last",
                               "out_root": "results/api_runs",
                               "features_pt": "bank.npz", "ot_h": "h.npz"})
    cmd = st._build_cmd(TaskState("tid", "generate", params))
    spec = importlib.util.spec_from_file_location(
        "run_aeot_end2end", REPO_ROOT / "scripts" / "run_aeot_end2end.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.parse_args(cmd[2:])  # strip python + script path


def test_build_cmd_ot_path_parses():
    args = _parse_built_cmd({"n_generate": 7, "seed": 3})
    assert args.ae_ckpt == "ckpt/last" and args.n_generate == 7
    assert args.features_pt == "bank.npz" and not args.prior_dir


def test_build_cmd_prior_path_parses():
    args = _parse_built_cmd({"prior_dir": "results/prior",
                             "prior_top_k": 8, "n_generate": 5})
    # required-in-both-modes args must survive the prior branch
    assert args.ae_ckpt == "ckpt/last"
    assert args.out_root == "results/api_runs"
    assert args.n_generate == 5
    assert args.prior_dir == "results/prior" and args.prior_top_k == 8
    # OT-only args stay at argparse defaults (not emitted)
    assert args.features_pt == "" and args.ot_h == ""


# ---------------------------------------------------------------------
# full-atom parse / bond inference / backbone writer (the canvas stick
# renderer's data path — reference ships raw PDB text to 3Dmol.js,
# api/web/index.html:861,1085)
def test_parse_pdb_atoms_and_bonds_roundtrip():
    ca = _helix_xyz(20)
    plddt = np.linspace(45.0, 95.0, 20)
    text = pdb_utils.write_pdb_backbone(ca, plddt=plddt)
    atoms = pdb_utils.parse_pdb_atoms(text)
    n = len(ca)
    assert len(atoms["xyz"]) == 4 * n            # N, CA, C, O per residue
    assert set(atoms["elements"]) == {"N", "C", "O"}
    # the CA trace written survives the CA parser unchanged
    tr = pdb_utils.parse_pdb_ca_trace(text)
    assert np.abs(tr["xyz"] - ca).max() < 1e-2
    # pLDDT travels via the b-factor column (rounded to 2 decimals)
    ca_rows = atoms["names"] == "CA"
    assert np.abs(atoms["bfactor"][ca_rows] - plddt).max() < 0.01
    # bond graph is exactly the backbone graph: 3 intra-residue bonds
    # per residue + n-1 peptide C-N links
    assert len(atoms["bonds"]) == 3 * n + (n - 1)
    kinds = set()
    for i, j in atoms["bonds"]:
        kinds.add((str(atoms["names"][i]), str(atoms["names"][j]),
                   int(atoms["res_idx"][j] - atoms["res_idx"][i])))
    assert kinds == {("N", "CA", 0), ("CA", "C", 0), ("C", "O", 0),
                     ("C", "N", 1)}


def test_parse_pdb_atoms_skips_hydrogens_and_altlocs():
    text = (
        "ATOM      1  N   GLY A   1       0.000   0.000   0.000"
        "  1.00 50.00           N\n"
        "ATOM      2  CA AGLY A   1       1.460   0.000   0.000"
        "  1.00 50.00           C\n"
        "ATOM      3  CA BGLY A   1       9.000   9.000   9.000"
        "  1.00 50.00           C\n"
        "ATOM      4  H   GLY A   1       0.500   0.900   0.000"
        "  1.00 50.00           H\n")
    atoms = pdb_utils.parse_pdb_atoms(text)
    assert list(atoms["names"]) == ["N", "CA"]   # altloc B + H dropped
    assert atoms["bonds"].tolist() == [[0, 1]]


def test_infer_bonds_requires_sequence_adjacency():
    # two SPATIALLY CLOSE dipeptides with non-adjacent residue ids
    # (a chain break): bonds must not cross the sequence gap even when
    # atoms sit within covalent distance of each other
    ca = np.array([[0, 0, 0], [3.8, 0, 0]], float)
    t1 = pdb_utils.write_pdb_backbone(ca)
    t2 = pdb_utils.write_pdb_backbone(ca + np.array([0.0, 1.4, 0.0]))
    t2 = t2.replace("A   1", "A   7").replace("A   2", "A   8")
    atoms = pdb_utils.parse_pdb_atoms(t1.replace("END", "") + t2)
    # sanity: the gap really is within covalent range somewhere
    d = np.linalg.norm(atoms["xyz"][None] - atoms["xyz"][:, None], axis=-1)
    gap = (atoms["res_ids"][None] >= 7) != (atoms["res_ids"][:, None] >= 7)
    assert (d[gap] < 1.9).any()
    for i, j in atoms["bonds"]:
        assert abs(int(atoms["res_ids"][j]) - int(atoms["res_ids"][i])) <= 1
        assert (atoms["res_ids"][i] >= 7) == (atoms["res_ids"][j] >= 7)
