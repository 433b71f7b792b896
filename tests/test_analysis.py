"""Analysis tooling: minimal UMAP embedding + latent topology analysis
(reference scripts/playground/probe_pdb_in_umap.py,
latent_topology_analysis.py, visualize_tsne_cath_seq.py)."""

import json
import os
import runpy
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts", "analysis"))


def two_blobs(n=60, d=8, sep=12.0, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, d))
    b = rng.normal(size=(n, d))
    b[:, 0] += sep
    return np.concatenate([a, b]), np.array([0] * n + [1] * n)


def test_umap_separates_blobs():
    from umap_min import fit_umap

    x, lab = two_blobs()
    y = fit_umap(x, k=10, n_epochs=150, seed=0)
    assert y.shape == (120, 2)
    ca, cb = y[lab == 0].mean(0), y[lab == 1].mean(0)
    inter = np.linalg.norm(ca - cb)
    intra = max(np.linalg.norm(y[lab == 0] - ca, axis=1).mean(),
                np.linalg.norm(y[lab == 1] - cb, axis=1).mean())
    assert inter > 2.0 * intra, (inter, intra)


def test_umap_transform_places_probe_near_its_blob():
    from umap_min import fit_umap, transform

    x, lab = two_blobs()
    y = fit_umap(x, k=10, n_epochs=150, seed=0)
    probe = x[lab == 1].mean(0, keepdims=True)  # clearly in blob B
    py = transform(x, y, probe)[0]
    cb = y[lab == 1].mean(0)
    ca = y[lab == 0].mean(0)
    assert np.linalg.norm(py - cb) < np.linalg.norm(py - ca)


def test_topology_detects_two_islands(tmp_path):
    from latent_topology import mst_merge_heights, mutual_knn_components

    x, lab = two_blobs(n=40, sep=20.0)
    comp = mutual_knn_components(x, k=6)
    # mutual-kNN graph must keep the blobs disconnected
    assert len({comp[lab == 0][i] for i in range(5)}.intersection(
        {comp[lab == 1][i] for i in range(5)})) == 0
    heights = mst_merge_heights(x)
    # the final merge bridges the blobs: far above the in-blob merges
    assert heights[-1] > 4.0 * np.percentile(heights, 95)


def test_topology_cli(tmp_path):
    x, _ = two_blobs(n=40, sep=20.0)
    bank = str(tmp_path / "bank.npz")
    np.savez(bank, latents=x.astype(np.float32),
             lengths=np.full(len(x), 30))
    out = str(tmp_path / "topology.json")
    old = sys.argv
    sys.argv = ["latent_topology.py", "--latents", bank, "--out", out,
                "--knn", "6", "--plot", str(tmp_path / "t.png")]
    try:
        runpy.run_path(
            os.path.join(REPO, "scripts", "analysis",
                         "latent_topology.py"), run_name="__main__")
    finally:
        sys.argv = old
    rep = json.load(open(out))
    assert rep["n_points"] == 80
    assert rep["n_components_mutual_knn"] >= 2
    assert rep["last_gap_ratio"] > 2.0
    assert os.path.exists(str(tmp_path / "t.png"))


def test_atlas_umap_and_labels(tmp_path):
    """latent_atlas --method umap --labels: CATH-style colored atlas."""
    x, lab = two_blobs(n=30, d=6)
    bank = str(tmp_path / "bank.npz")
    names = np.array([f"c{i}" for i in range(len(x))])
    np.savez(bank, latents=x.astype(np.float32),
             lengths=np.full(len(x), 30), names=names)
    labels = {f"c{i}": ("A" if la == 0 else "B")
              for i, la in enumerate(lab)}
    lp = str(tmp_path / "labels.json")
    json.dump(labels, open(lp, "w"))
    out = str(tmp_path / "atlas")
    old = sys.argv
    sys.argv = ["latent_atlas.py", "--latents", bank, "--out", out,
                "--method", "umap", "--labels", lp]
    try:
        runpy.run_path(
            os.path.join(REPO, "scripts", "analysis", "latent_atlas.py"),
            run_name="__main__")
    finally:
        sys.argv = old
    assert os.path.exists(os.path.join(out, "atlas.png"))
    cache = np.load(os.path.join(out, "atlas.npz"), allow_pickle=True)
    assert cache["xy"].shape == (60, 2)
    assert str(cache["method"]) == "umap"
