"""CLI smoke coverage for every scripts/* entry point (VERDICT r2 #7).

Each test drives a script's real __main__ against the shared tiny trained
checkpoint (conftest.tiny_ckpt) and asserts exit + output artifacts, so
no script can silently rot. The chain mirrors the real pipeline:

    extract_ae_latents -> kmeans_codebook / train_ot_potential
                       -> sample_with_aeot_omt / decode_latents_to_npy
    extract_code_indices -> compute_ze_stats / decode_with_vqvae
    decoded curves -> filter_curves / npy_to_pdb / visualize_curves
    raw curves -> probe_one_curve / interpolate_latent / inference /
                  read_one_npy / analysis tools
"""

import json
import os
import runpy
import sys

import numpy as np
import pytest
import yaml

from conftest import TINY_MODEL as MODEL

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_script(relpath, argv):
    old = sys.argv
    sys.argv = [os.path.basename(relpath)] + argv
    try:
        runpy.run_path(os.path.join(REPO, "scripts", relpath),
                       run_name="__main__")
    finally:
        sys.argv = old


@pytest.fixture(scope="module")
def arts(tiny_ckpt, tmp_path_factory):
    """Shared derived artifacts: latent bank + code-index export."""
    cfg, ckpt = tiny_ckpt
    root = tmp_path_factory.mktemp("cli_arts")
    bank = str(root / "bank.npz")
    run_script("extract_ae_latents.py", [
        "--config", cfg, "--ckpt", ckpt, "--out", bank,
        "--batch_size", "4", "--split", "train"])
    codes = str(root / "codes")
    run_script("extract_code_indices.py", [
        "--config", cfg, "--ckpt", ckpt, "--out_dir", codes,
        "--batch_size", "4", "--split", "val"])
    with open(cfg) as f:
        data_dir = yaml.safe_load(f)["data_params"]["npy_dir"]
    curves = sorted(
        os.path.join(data_dir, f) for f in os.listdir(data_dir)
        if f.endswith(".npy"))
    return {"cfg": cfg, "ckpt": ckpt, "bank": bank, "codes": codes,
            "curves": curves, "root": root}


def test_extract_ae_latents_bank(arts):
    d = dict(np.load(arts["bank"], allow_pickle=True))
    n_tok, cd = MODEL["latent_tokens"], MODEL["code_dim"]
    assert d["latents"].ndim == 2 and d["latents"].shape[1] == n_tok * cd
    assert d["lengths"].shape[0] == d["latents"].shape[0]
    assert np.isfinite(d["mean"]).all() and (d["std"] > 0).all()


def test_extract_code_indices_manifest(arts):
    man = os.path.join(arts["codes"], "manifest.jsonl")
    recs = [json.loads(x) for x in open(man)]
    assert recs
    r = recs[0]
    idx = np.load(os.path.join(arts["codes"], r["indices_path"]))
    assert idx.shape == (MODEL["latent_tokens"] * MODEL["num_quantizers"],)


def test_kmeans_codebook(arts, tmp_path):
    out = str(tmp_path / "cent.npy")
    run_script("kmeans_codebook.py", [
        "--latents", arts["bank"], "--out", out, "--codes", "8",
        "--levels", str(MODEL["num_quantizers"]),
        "--code_dim", str(MODEL["code_dim"]), "--iters", "3"])
    C = np.load(out)
    assert C.shape[-1] == MODEL["code_dim"] and np.isfinite(C).all()


@pytest.fixture(scope="module")
def potential(arts):
    out = str(arts["root"] / "h.npz")
    run_script("train_ot_potential.py", [
        "--features", arts["bank"], "--out", out, "--iters", "10",
        "--batch", "128", "--source", "uniform01"])
    return out


def test_train_ot_potential(arts, potential):
    h = np.load(potential)["h"]
    n = np.load(arts["bank"])["latents"].shape[0]
    assert h.shape == (n,) and np.isfinite(h).all()


def test_sample_with_aeot_omt(arts, potential, tmp_path):
    out = str(tmp_path / "omt")
    run_script("sample_with_aeot_omt.py", [
        "--config", arts["cfg"], "--ckpt", arts["ckpt"],
        "--features", arts["bank"], "--ot_h", potential,
        "--out_dir", out, "--num_samples", "64", "--batch_size", "8",
        "--theta_deg", "60"])
    files = [f for f in os.listdir(out) if f.endswith(".npy")]
    if files:  # angle filter may keep zero pairs on a tiny bank
        c = np.load(os.path.join(out, files[0]), allow_pickle=True).item()
        assert "curve_coords" in c


@pytest.fixture(scope="module")
def decoded_dir(arts):
    out = str(arts["root"] / "decoded")
    run_script("decode_latents_to_npy.py", [
        "--config", arts["cfg"], "--ckpt", arts["ckpt"],
        "--latents", arts["bank"], "--out_dir", out, "--batch_size", "4"])
    return out


def test_decode_latents_to_npy(decoded_dir):
    files = [f for f in os.listdir(decoded_dir) if f.endswith(".npy")]
    assert files
    c = np.load(os.path.join(decoded_dir, files[0]), allow_pickle=True)
    arr = c.item()["curve_coords"] if c.dtype == object else c
    assert np.isfinite(np.asarray(arr, np.float32)).all()


def test_decode_with_vqvae_from_indices(arts, tmp_path):
    out = str(tmp_path / "dec_idx")
    run_script("decode_with_vqvae.py", [
        "--config", arts["cfg"], "--ckpt", arts["ckpt"],
        "--manifest", os.path.join(arts["codes"], "manifest.jsonl"),
        "--base_dir", arts["codes"], "--out_dir", out,
        "--batch_size", "4"])
    assert [f for f in os.listdir(out) if f.endswith(".npy")]


def test_decode_with_vqvae_from_latents(arts, tmp_path):
    out = str(tmp_path / "dec_lat")
    run_script("decode_with_vqvae.py", [
        "--config", arts["cfg"], "--ckpt", arts["ckpt"],
        "--manifest", os.path.join(arts["codes"], "manifest.jsonl"),
        "--base_dir", arts["codes"], "--out_dir", out,
        "--from_latents", "--quantize_latents", "--batch_size", "4"])
    assert [f for f in os.listdir(out) if f.endswith(".npy")]


def test_compute_ze_stats(arts, tmp_path):
    out = str(tmp_path / "ze_stats.npz")
    run_script("compute_ze_stats.py", [
        "--manifest", os.path.join(arts["codes"], "manifest.jsonl"),
        "--base_dir", arts["codes"], "--out", out,
        "--key", "latents_path"])
    d = np.load(out)
    assert np.isfinite(d["mean"]).all() and np.isfinite(d["std"]).all()


def test_filter_curves(decoded_dir, tmp_path):
    out = str(tmp_path / "filt")
    run_script("filter_curves.py", [
        "--recon_dir", decoded_dir, "--out_dir", out,
        "--min_length", "2"])
    # reject counters + manifest exist regardless of keep-rate
    assert os.path.isdir(out)


def test_probe_one_curve(arts, tmp_path):
    plot = str(tmp_path / "probe.png")
    run_script("probe_one_curve.py", [
        "--config", arts["cfg"], "--ckpt", arts["ckpt"],
        "--curve", arts["curves"][0], "--plot", plot])
    assert os.path.isfile(plot)


def test_interpolate_latent(arts, tmp_path):
    out = str(tmp_path / "interp")
    run_script("interpolate_latent.py", [
        "--config", arts["cfg"], "--ckpt", arts["ckpt"],
        "--curve_a", arts["curves"][0], "--curve_b", arts["curves"][1],
        "--out_dir", out, "--steps", "3"])
    assert len([f for f in os.listdir(out) if f.endswith(".npy")]) >= 3


def test_inference_sample_and_reconstruct(arts, tmp_path):
    out_s = str(tmp_path / "inf_sample")
    run_script("inference.py", [
        "--config", arts["cfg"], "--ckpt", arts["ckpt"],
        "--mode", "sample", "--out", out_s, "--num", "2",
        "--length", "24"])
    assert len(os.listdir(out_s)) >= 2
    out_r = str(tmp_path / "inf_recon")
    run_script("inference.py", [
        "--config", arts["cfg"], "--ckpt", arts["ckpt"],
        "--mode", "reconstruct",
        "--in", os.path.dirname(arts["curves"][0]),
        "--out", out_r, "--limit", "2"])
    assert os.listdir(out_r)


def test_npy_to_pdb(arts, tmp_path):
    out = str(tmp_path / "pdbs")  # --out is a directory
    run_script("npy_to_pdb.py", ["--in", arts["curves"][0], "--out", out])
    pdbs = [f for f in os.listdir(out) if f.endswith(".pdb")]
    assert len(pdbs) == 1
    text = open(os.path.join(out, pdbs[0])).read()
    assert "ATOM" in text and " CA " in text


def test_visualize_curves(arts, tmp_path):
    out = str(tmp_path / "viz")  # --out is a directory
    run_script("visualize_curves.py", [
        "--in", arts["curves"][0], "--out", out])
    assert [f for f in os.listdir(out) if f.endswith(".png")]


def test_read_one_npy(arts, capsys):
    run_script("read_one_npy.py", [arts["curves"][0]])
    assert "curve_coords" in capsys.readouterr().out


# -- analysis tools without prior coverage --
def test_analysis_convert_curve_format(arts, tmp_path):
    out = str(tmp_path / "conv.npy")
    run_script("analysis/convert_curve_format.py", [
        "--in", arts["curves"][0], "--out", out])
    arr = np.load(out, allow_pickle=True)
    assert arr is not None


def test_analysis_export_ze_tokens(arts, tmp_path):
    out = str(tmp_path / "ze_shards")
    run_script("analysis/export_ze_tokens.py", [
        "--config", arts["cfg"], "--ckpt", arts["ckpt"],
        "--out_dir", out, "--batch_size", "4", "--split", "val"])
    assert os.listdir(out)


def test_analysis_latent_regions(arts, tmp_path):
    out = str(tmp_path / "regions.json")
    run_script("analysis/latent_regions.py", [
        "--latents", arts["bank"], "--clusters", "3", "--out", out])
    assert os.path.isfile(out)


def test_analysis_bond_band_stats(arts, tmp_path):
    out = str(tmp_path / "bond_stats.json")
    run_script("analysis/bond_band_stats.py", [
        "--config", arts["cfg"], "--ckpt", arts["ckpt"],
        "--split", "val", "--batch_size", "4", "--limit", "8",
        "--out", out])
    stats = json.load(open(out))
    for side in ("decode", "truth"):
        assert 0.0 <= stats[side]["frac_in_band"] <= 1.0
        assert np.isfinite(stats[side]["mean"])
    # truth bonds of the synthetic corpus are ~3.8 A, inside the band
    assert stats["truth"]["frac_in_band"] > 0.9


def test_analysis_decoded_diversity(arts, tmp_path):
    gen = tmp_path / "gen"
    gen.mkdir()
    rng = np.random.default_rng(0)
    for i in range(6):
        xyz = np.cumsum(rng.normal(size=(20, 3)) * 3.8, axis=0)
        ss = np.eye(3, dtype=np.float32)[rng.integers(0, 3, 20)]
        np.save(gen / f"c{i}.npy",
                np.concatenate([xyz, ss], -1).astype(np.float32))
    out = str(tmp_path / "div.json")
    run_script("analysis/decoded_diversity.py", [
        "--run_dir", str(gen), "--ref_npy_dir", str(gen),
        "--n", "6", "--ref_n", "6", "--resample", "16", "--out", out])
    stats = json.load(open(out))
    assert stats["n_curves"] == 6
    assert stats["diversity"]["mean_pairwise_rmsd"] > 0.0
    # each curve's nearest ref is itself (same dir) -> novelty ~0,
    # everything counts as memorized
    assert stats["novelty_vs_ref"]["mean_nn_rmsd"] < 1e-6
    assert stats["novelty_vs_ref"]["frac_memorized_lt_0p5"] == 1.0


def test_analysis_vq_sample_quality(arts, tmp_path):
    out = str(tmp_path / "vq_sample.json")
    run_script("analysis/vq_sample_quality.py", [
        "--config", arts["cfg"], "--ckpt", arts["ckpt"],
        "--n", "16", "--batch_size", "8", "--seed", "0",
        "--min_length", "2", "--out", out])
    stats = json.load(open(out))
    assert stats["n_sampled"] == 16
    assert 0.0 <= stats["keep_rate"] <= 1.0
    # every sample lands in exactly one bucket
    assert stats["kept"] + sum(stats["reject_counts"].values()) == 16
    assert stats["codebook"]["levels"] == MODEL["num_quantizers"]
    # distributional stats must exist even when the strict filter keeps 0
    assert np.isfinite(stats["decode_bond_stats"]["mean"])
    assert 0.0 <= stats["curve_bond_legal_rate"] <= 1.0
    assert 0.0 <= stats["per_curve_frac_in_band"]["mean"] <= 1.0


def test_analysis_vq_sample_quality_recon_arm(arts, tmp_path):
    """--recon measures the ceiling: real curves through encode ->
    quantize -> decode, same filter/stats as the sampler arms."""
    out = str(tmp_path / "vq_recon.json")
    run_script("analysis/vq_sample_quality.py", [
        "--config", arts["cfg"], "--ckpt", arts["ckpt"],
        "--n", "8", "--batch_size", "8", "--seed", "0",
        "--min_length", "2", "--recon", "--out", out])
    stats = json.load(open(out))
    assert stats["sampler"] == "reconstruction_ceiling"
    assert stats["n_sampled"] >= 1
    assert stats["kept"] + sum(stats["reject_counts"].values()) == \
        stats["n_sampled"]
    assert np.isfinite(stats["decode_bond_stats"]["mean"])


def test_code_prior_pipeline(arts, tmp_path):
    """Full learned-prior path: real extracted indices -> trained prior
    -> prior-sampled vq_sample_quality, same filter/stats as the uniform
    arm (the new unconditional generation path; uniform baseline keeps
    0-1.2%, results/mixstats_r3/vqsample_*.json)."""
    prior_dir = str(tmp_path / "prior")
    run_script("train_code_prior.py", [
        "--codes_dir", arts["codes"], "--out", prior_dir,
        "--epochs", "2", "--batch", "4", "--d_model", "32",
        "--n_layers", "1", "--n_heads", "2"])
    meta = json.load(open(os.path.join(prior_dir, "meta.json")))
    assert meta["model"]["num_q"] == MODEL["num_quantizers"]
    assert meta["model"]["k_per"] == MODEL["codebook_size"]
    assert meta["model"]["n_tokens"] == MODEL["latent_tokens"]
    # both param selections are saved (best-val AND final epoch)
    assert os.path.exists(os.path.join(prior_dir, "prior_final.npz"))
    assert "final_val_loss" in meta and "final_train_loss" in meta

    out = str(tmp_path / "vq_prior.json")
    run_script("analysis/vq_sample_quality.py", [
        "--config", arts["cfg"], "--ckpt", arts["ckpt"],
        "--n", "8", "--batch_size", "8", "--seed", "0",
        "--min_length", "2", "--prior_dir", prior_dir,
        "--prior_params", "final",
        "--temperature", "0.9", "--out", out])
    stats = json.load(open(out))
    assert stats["sampler"]["prior_dir"] == prior_dir
    assert stats["sampler"]["params"] == "final"
    assert stats["kept"] + sum(stats["reject_counts"].values()) == 8
    # novelty vs the prior's own training codes is auto-computed
    nov = stats["novelty"]
    assert nov is not None
    assert nov["train_sequences"] >= 1
    assert 0.0 <= nov["nn_token_overlap"]["mean"] <= 1.0
    assert 0.0 <= nov["exact_match_frac"] <= 1.0


@pytest.mark.parametrize("pairs", ["random", "nearest"])
def test_analysis_mix_decode_stats(arts, tmp_path, pairs):
    out = str(tmp_path / f"mix_{pairs}.json")
    run_script("analysis/mix_decode_stats.py", [
        "--config", arts["cfg"], "--ckpt", arts["ckpt"],
        "--split", "val", "--n_mix", "8", "--batch_size", "4",
        "--pairs", pairs, "--seed", "0", "--out", out])
    stats = json.load(open(out))
    assert 0.0 <= stats["keep_rate"] <= 1.0
    assert stats["n_mix"] == 8
    # every mix decode lands in exactly one bucket
    assert stats["keep_rate"] * 8 + sum(
        stats["reject_counts"].values()) == 8
    assert np.isfinite(stats["mix_bond"]["mean"])
    assert 0.0 <= stats["mix_bond"]["frac_legal"] <= 1.0


def test_analysis_reconstruct_dataset(arts, tmp_path):
    out = str(tmp_path / "recon_ds")
    run_script("analysis/reconstruct_dataset.py", [
        "--config", arts["cfg"], "--ckpt", arts["ckpt"],
        "--out_dir", out, "--split", "val", "--batch_size", "4"])
    assert os.listdir(out)


# -- round-3 playground ports --
@pytest.fixture(scope="module")
def atlas_cache(arts):
    out = str(arts["root"] / "atlas")
    run_script("analysis/latent_atlas.py", [
        "--latents", arts["bank"], "--out", out, "--method", "pca"])
    return os.path.join(out, "atlas.npz")


def test_analysis_island_paths(atlas_cache, tmp_path):
    out = str(tmp_path / "island.txt")
    run_script("analysis/island_paths.py", [
        "--cache", atlas_cache, "--n_clusters", "2", "--out", out])
    lines = [x for x in open(out) if not x.startswith("#")]
    assert lines  # a left island always exists


def test_analysis_cache_report(atlas_cache, tmp_path):
    out = str(tmp_path / "report")
    run_script("analysis/cache_report.py", [
        "--cache", atlas_cache, "--out", out, "--clusters", "3",
        "--highlight", "10", "40"])
    adir = os.path.join(out, "analysis")
    files = os.listdir(adir)
    assert "plain.png" in files and "clusters.png" in files
    assert "cluster_summary.txt" in files
    summary = open(os.path.join(adir, "cluster_summary.txt")).read()
    assert "cluster 0" in summary


def test_analysis_probe_overlay(atlas_cache, tmp_path):
    # base-only render straight from the atlas cache
    out = str(tmp_path / "overlay_base.png")
    run_script("analysis/probe_overlay.py", [
        "--npz", atlas_cache, "--proj", "any", "--out", out, "--density"])
    assert os.path.isfile(out)
    # reference-style cache with probe groups
    rng = np.random.default_rng(0)
    cache2 = str(tmp_path / "probe_cache.npz")
    np.savez(cache2, base_umap_2d=rng.normal(size=(200, 2)),
             probe_umap_2d=rng.normal(size=(6, 2)),
             probe_groups=np.asarray([0, 0, 1, 1, 2, 2]),
             probe_names=np.asarray(["a", "a", "b", "b", "c", "c"]))
    out2 = str(tmp_path / "overlay_probe.png")
    run_script("analysis/probe_overlay.py", [
        "--npz", cache2, "--proj", "umap", "--out", out2, "--legend"])
    assert os.path.isfile(out2)


def test_analysis_length_stats(arts, tmp_path):
    from pytorch_vae_tpu.serving.pdb_utils import write_pdb_ca_trace

    pdb_dir = tmp_path / "pdbs"
    pdb_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(3):
        xyz = np.cumsum(rng.normal(size=(20 + i, 3)), axis=0) * 3.8
        (pdb_dir / f"m{i}.pdb").write_text(write_pdb_ca_trace(xyz))
    curve_dir = os.path.dirname(arts["curves"][0])
    out = str(tmp_path / "lens")
    run_script("analysis/length_stats.py", [
        "--dirs", str(pdb_dir), curve_dir, "--out", out])
    stats = json.load(open(os.path.join(out, "length_stats.json")))
    assert stats["pdbs"]["n"] == 3
    assert os.path.isfile(os.path.join(out, "length_hist.png"))


def test_extract_ae_latents_npy_dir_override(arts, tmp_path):
    """--npy_dir extracts from a corpus the config never names (bank growth)."""
    from pytorch_vae_tpu.data.synthetic import make_synthetic_curve_dir

    alt = str(tmp_path / "alt_corpus")
    make_synthetic_curve_dir(alt, n_train=6, n_val=2, seed=13,
                             min_len=12, max_len=24)
    out = str(tmp_path / "alt_bank.npz")
    run_script("extract_ae_latents.py", [
        "--config", arts["cfg"], "--ckpt", arts["ckpt"], "--out", out,
        "--batch_size", "4", "--split", "train", "--npy_dir", alt,
        "--len_max", "0"])
    d = np.load(out)
    assert d["latents"].shape[0] == 6
    assert d["latents"].shape[1] == MODEL["latent_tokens"] * MODEL["code_dim"]


def test_analysis_merge_latent_banks(arts, tmp_path):
    out = str(tmp_path / "merged.npz")
    run_script("analysis/merge_latent_banks.py", [
        "--banks", arts["bank"], arts["bank"], "--out", out])
    a = np.load(arts["bank"])
    m = np.load(out)
    assert m["latents"].shape[0] == 2 * a["latents"].shape[0]
    assert m["lengths"].shape[0] == m["latents"].shape[0]
    assert int(m["latent_tokens"]) == MODEL["latent_tokens"]
    # mean of a self-merge equals the single-bank mean
    np.testing.assert_allclose(m["mean"], a["mean"], rtol=0, atol=1e-5)
    assert (m["std"] > 0).all()


def test_merge_latent_banks_rejects_mismatched_dims(arts, tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts", "analysis"))
    try:
        from merge_latent_banks import merge_banks
    finally:
        sys.path.pop(0)
    a = dict(np.load(arts["bank"]))
    b = dict(a)
    b["latent_tokens"] = np.asarray(int(a["latent_tokens"]) + 1)
    with pytest.raises(ValueError, match="latent_tokens"):
        merge_banks([a, b])


def test_analysis_aggregate_quality_runs(tmp_path):
    run = tmp_path / "runA"
    run.mkdir()
    (run / "summary.json").write_text(json.dumps({
        "ot_candidates_after_angle_unique": 10, "total_decoded": 8,
        "kept": 6, "reject_counts": {"bond_out": 2},
        "timing_sec": {"ot": 1.5, "decode_filter": 0.5}}))
    (tmp_path / "empty_run").mkdir()
    out = str(tmp_path / "table.md")
    run_script("analysis/aggregate_quality_runs.py", [
        "--runs", str(run), str(tmp_path / "empty_run"), "--out", out])
    text = open(out).read()
    assert "| runA | 10 | 8 | 6 | 75.0 | bond_out 2 |" in text


def test_analysis_ot_thresh_sweep(arts, potential, tmp_path):
    out = str(tmp_path / "sweep.json")
    run_script("analysis/ot_thresh_sweep.py", [
        "--ae_config", arts["cfg"], "--ae_ckpt", arts["ckpt"],
        "--features", arts["bank"], "--ot_h", potential,
        "--out", out, "--thresholds", "0.01", "0.5",
        "--n_generate", "4", "--num_gen_x", "1000",
        "--ot_bat_size_n", "1000",
        "--out_root", str(tmp_path / "runs")])
    rows = json.load(open(out))["rows"]
    assert [r["thresh"] for r in rows] == [0.01, 0.5]
    # looser threshold admits at least as many unique pairs
    assert rows[1]["candidates"] >= rows[0]["candidates"]
    assert all(r["kept"] <= r["decoded"] for r in rows)


def test_export_golden_and_pipeline_from_bundle(arts, tmp_path):
    """The recycle-proof path (make reproduce-line): export a golden
    params-only bundle, then run a pipeline script directly from it."""
    out = str(tmp_path / "tiny_golden.npz")
    run_script("export_golden.py", [
        "--ckpt", arts["ckpt"], "--config", arts["cfg"], "--out", out])
    assert os.path.exists(out)
    bank = str(tmp_path / "bank_from_golden.npz")
    run_script("extract_ae_latents.py", [
        "--config", arts["cfg"], "--ckpt", out, "--out", bank,
        "--batch_size", "4", "--split", "train"])
    g = np.load(bank)
    o = np.load(arts["bank"])
    # identical params -> identical latent bank
    np.testing.assert_array_equal(g["latents"], o["latents"])


def test_analysis_rate_distortion_r5(tmp_path):
    """Aggregates the committed capacity-rung JSONs into the in-band-vs-
    bits ceiling estimate (reads repo results, writes --out)."""
    out = str(tmp_path / "rd.json")
    run_script("analysis/rate_distortion_r5.py", ["--out", out])
    rd = json.load(open(out))
    assert len(rd["rungs"]) >= 3
    asym = rd["capacity_asymptote"]["in_band_asymptote"]
    # the asymptote is a fraction above the best measured rung
    assert 0.5 < asym < 1.0


def test_analysis_legalize_ab_summary(tmp_path):
    """Collates legalization arms vs committed controls; controls must
    always resolve from the committed results tree."""
    out = str(tmp_path / "leg.json")
    run_script("analysis/legalize_ab_summary.py", ["--out", out])
    s = json.load(open(out))
    assert s["recon_ceiling"]["control_ft3g"] == pytest.approx(
        0.26171875)
    ctrl = s["aeot_end2end"]["control_ft9"]
    assert ctrl["keep_rate"] == pytest.approx(0.968, abs=1e-3)


def test_analysis_relax_ab_summary(tmp_path):
    """Collates relaxation arms vs committed controls; the trained-ft4l
    controls must always resolve from the committed results tree."""
    out = str(tmp_path / "rlx.json")
    run_script("analysis/relax_ab_summary.py", ["--out", out])
    s = json.load(open(out))
    assert s["recon_ceiling"]["control_ft4l_keep"] == pytest.approx(
        0.9296875)
    t06 = s["learned_prior_ft4l_codes"]["t06"]
    assert t06["control_keep"] == pytest.approx(0.55859375)
    assert t06["control_exact_match"] == 0.0
