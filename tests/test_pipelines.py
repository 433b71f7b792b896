"""Filter + AE-OT pipeline tests (golden synthetic curves, brute-force
oracles for the vectorized geometry checks)."""

import jax
import numpy as np
import pytest

from pytorch_vae_tpu.pipelines import filtering
from pytorch_vae_tpu.pipelines.aeot import (
    SemiDiscreteOT,
    lifted_normals,
    ot_generate_latents,
)


def _helix_curve(L=60, rise=1.5, radius=2.3, ss_cls=2):
    t = np.arange(L)
    theta = np.deg2rad(99.6) * t
    coords = np.stack([radius * np.cos(theta), radius * np.sin(theta),
                       rise * t], axis=-1)
    # rescale consecutive spacing to ~3.8 A
    d = np.linalg.norm(np.diff(coords, axis=0), axis=-1).mean()
    coords *= 3.8 / d
    ss = np.zeros((L, 3), np.float32)
    ss[:, ss_cls] = 1.0
    return np.concatenate([coords, ss], axis=-1).astype(np.float32)


def test_filter_accepts_clean_helix():
    curve = _helix_curve()
    ok, stats, reason = filtering.curve_pass_filter(
        curve, filtering.end2end_params())
    assert ok, reason
    assert 3.0 < stats["bond_mean"] < 4.5
    assert stats["n_self_clash_pairs"] == 0


def test_filter_reject_order_and_reasons():
    p = filtering.end2end_params(min_length=32)
    ok, _, r = filtering.curve_pass_filter(np.zeros((5,)), p)
    assert (ok, r) == (False, "bad_shape")
    bad = _helix_curve(40)
    bad[3, 0] = np.nan
    assert filtering.curve_pass_filter(bad, p)[2] == "nan_inf"
    assert filtering.curve_pass_filter(_helix_curve(10), p)[2] == "too_short"
    p2 = filtering.end2end_params(min_length=8, max_length=20)
    assert filtering.curve_pass_filter(_helix_curve(40), p2)[2] == "too_long"
    squashed = _helix_curve(40)
    squashed[:, :3] *= 0.1  # bonds ~0.38 A
    assert filtering.curve_pass_filter(squashed, p)[2] == "bond_out"


def test_filter_detects_point_collision():
    curve = _helix_curve(60)
    # fold the end back onto the start
    curve[-1, :3] = curve[0, :3] + 0.5
    ok, _, reason = filtering.curve_pass_filter(
        curve, filtering.end2end_params(min_length=8))
    assert not ok
    assert reason in ("point_collision", "segment_collision", "bond_out")


def test_self_collision_matches_bruteforce():
    rng = np.random.default_rng(0)
    coords = rng.normal(size=(30, 3)) * 3
    got = filtering.self_collision_count(coords, 2.5, 2)
    want = 0
    for i in range(30):
        for j in range(30):
            if abs(i - j) > 2 and np.sum((coords[i] - coords[j]) ** 2) < 2.5**2:
                want += 1
    assert got == want


def test_segment_clash_matches_bruteforce():
    rng = np.random.default_rng(1)
    coords = np.cumsum(rng.normal(size=(20, 3)), axis=0) * 1.2
    got = filtering.segment_clash_count(coords, 1.3, 1, 5)
    # reference-style double loop oracle
    t_vals = np.linspace(0, 1, 5)
    n_seg = coords.shape[0] - 1
    want = 0
    for i in range(n_seg):
        pts1 = coords[i] + (coords[i + 1] - coords[i])[None] * t_vals[:, None]
        for j in range(i + 2, n_seg):
            pts2 = coords[j] + (coords[j + 1] - coords[j])[None] * \
                t_vals[:, None]
            d2 = np.sum((pts1[:, None] - pts2[None]) ** 2, axis=-1)
            if (d2 < 1.3**2).any():
                want += 1
    assert got == want


def test_beta_stats_runs():
    ss = np.zeros((10, 3), np.float32)
    ss[[1, 2, 3, 6, 7], 1] = 1.0
    total, max_run = filtering.beta_stats(ss)
    assert (total, max_run) == (5, 3)


def test_sheet_partner_detection():
    # two parallel strands 5 A apart -> all beta residues in a sheet
    L = 12
    coords = np.zeros((L, 3))
    coords[:6, 0] = np.arange(6) * 3.8
    coords[6:, 0] = np.arange(6) * 3.8
    coords[6:, 1] = 5.0
    # reverse the second strand so it's antiparallel (chain continuity aside)
    coords[6:] = coords[6:][::-1]
    ss = np.zeros((L, 3), np.float32)
    ss[:, 1] = 1.0
    st = filtering.beta_strand_and_sheet_stats(coords, ss,
                                               neighbor_exclude=2)
    assert st["beta_total"] == 12
    assert st["beta_sheet_fraction"] > 0.7
    assert st["n_strands_total"] >= 1
    assert st["n_isolated_strands"] == 0

    # a single isolated strand has no partners
    st2 = filtering.beta_strand_and_sheet_stats(coords[:6], ss[:6],
                                                neighbor_exclude=2)
    assert st2["beta_in_sheet"] == 0
    assert st2["n_isolated_strands"] == st2["n_strands_total"] == 1


def test_standalone_thresholds_differ():
    """Both reference threshold sets preserved (SURVEY.md §2.3)."""
    assert filtering.end2end_params().bond_min_allowed == 1.4
    assert filtering.standalone_params().bond_min_allowed == 2.2


# ---------------------------------------------------------------------
# AE-OT
# ---------------------------------------------------------------------
def _mk_ot(n=20, d=6, seed=0):
    rng = np.random.default_rng(seed)
    P = rng.uniform(0, 1, size=(n, d)).astype(np.float32)
    return SemiDiscreteOT(P=P, h=np.zeros(n, np.float32), source="uniform01")


def test_top2_matches_numpy():
    ot = _mk_ot()
    x = np.random.default_rng(1).uniform(0, 1, (7, 6)).astype(np.float32)
    idx, vals = ot.top2_cells(x)
    u = x @ ot.P.T + ot.h[None, :]
    order = np.argsort(-u, axis=1)
    np.testing.assert_array_equal(np.asarray(idx), order[:, :2])


def test_lifted_normals_unit():
    nm = lifted_normals(np.random.default_rng(2).normal(size=(10, 4)))
    np.testing.assert_allclose(np.linalg.norm(nm, axis=1), 1.0, atol=1e-12)


def test_ot_generate_latents_properties():
    ot = _mk_ot(n=30)
    lengths = np.random.default_rng(3).integers(20, 90, 30)
    out = ot_generate_latents(ot, lengths, num_gen_x=256, bat_size_n=128,
                              thresh=3.0, key=jax.random.PRNGKey(0))
    lat, lens = out["latents"], out["lengths"]
    assert lat.shape[1] == 6
    assert lat.shape[0] == lens.shape[0]
    assert lat.shape[0] > 0
    # convex combinations live inside the bank's bounding box
    assert lat.min() >= ot.P.min() - 1e-5
    assert lat.max() <= ot.P.max() + 1e-5
    assert lens.min() >= lengths.min() - 1
    assert lens.max() <= lengths.max() + 1


def test_ot_topk_default_reproduces_top2_path():
    """k_neighbors=2, samples_per_pair=1 must be bit-identical to the
    historical top-2 path (same seed => same candidates)."""
    ot = _mk_ot(n=30)
    lengths = np.random.default_rng(3).integers(20, 90, 30)
    base = ot_generate_latents(ot, lengths, num_gen_x=256, bat_size_n=128,
                               thresh=3.0, key=jax.random.PRNGKey(0))
    expl = ot_generate_latents(ot, lengths, num_gen_x=256, bat_size_n=128,
                               thresh=3.0, key=jax.random.PRNGKey(0),
                               k_neighbors=2, samples_per_pair=1)
    np.testing.assert_array_equal(base["latents"], expl["latents"])
    np.testing.assert_array_equal(base["lengths"], expl["lengths"])


def test_ot_topk_and_samples_per_pair_expand_candidates():
    ot = _mk_ot(n=30)
    lengths = np.random.default_rng(3).integers(20, 90, 30)
    kw = dict(num_gen_x=256, bat_size_n=128, thresh=3.0,
              key=jax.random.PRNGKey(0))
    n2 = ot_generate_latents(ot, lengths, **kw)["latents"].shape[0]
    out4 = ot_generate_latents(ot, lengths, k_neighbors=4, **kw)
    n4 = out4["latents"].shape[0]
    assert n4 >= n2  # top-1-vs-{2,3,4} pairs are a superset of top-2
    # candidates stay convex combinations of bank rows
    assert out4["latents"].min() >= ot.P.min() - 1e-5
    assert out4["latents"].max() <= ot.P.max() + 1e-5
    spp = ot_generate_latents(ot, lengths, samples_per_pair=3, **kw)
    assert spp["latents"].shape[0] == 3 * n2
    assert spp["lengths"].shape[0] == 3 * n2
    # same pairs, different weights: 3 blocks of candidates differ
    a, b, c = np.split(spp["latents"], 3, axis=0)
    assert not np.array_equal(a, b) and not np.array_equal(b, c)


def test_ot_topk_validation():
    ot = _mk_ot(n=8)
    lengths = np.arange(8) + 10
    kw = dict(num_gen_x=128, bat_size_n=128, thresh=3.0,
              key=jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        ot_generate_latents(ot, lengths, k_neighbors=1, **kw)
    with pytest.raises(ValueError):
        ot_generate_latents(ot, lengths, k_neighbors=9, **kw)
    with pytest.raises(ValueError):
        ot_generate_latents(ot, lengths, samples_per_pair=0, **kw)


def test_ot_thresh_zero_keeps_nothing():
    ot = _mk_ot(n=30)
    lengths = np.arange(30) + 10
    out = ot_generate_latents(ot, lengths, num_gen_x=128, bat_size_n=128,
                              thresh=0.0, key=jax.random.PRNGKey(0))
    assert out["latents"].shape[0] == 0


def test_potential_training_balances_measure():
    ot = _mk_ot(n=8, d=3, seed=5)
    key = jax.random.PRNGKey(0)
    ot.train_potential(key, iters=400, batch=4096, lr=5e-2)
    # after training, cell frequencies should be near-uniform
    x = np.asarray(jax.random.uniform(jax.random.PRNGKey(9), (20000, 3)))
    cells = np.asarray(ot.map_cells(x))
    freq = np.bincount(cells, minlength=8) / 20000
    assert freq.max() < 0.30 and freq.min() > 0.03, freq
