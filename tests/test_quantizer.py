"""Quantizer tests: argmin correctness, straight-through gradient, EMA math,
RVQ index layout, dead-code reinit, centroid init."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_vae_tpu.models.quantizer import (
    VQConfig,
    init_epoch_stats,
    init_state_from_centroids,
    init_vq_state,
    maybe_reinit_dead_codes,
    quantize_ema,
)
from pytorch_vae_tpu.ops.vq_pallas import nearest_codes_xla


def _brute_force_idx(flat, emb):
    d = ((flat[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
    return np.argmin(d, axis=1), np.sort(d, axis=1)[:, :2]


def test_nearest_codes_xla_matches_brute_force():
    rng = np.random.default_rng(0)
    flat = rng.normal(size=(37, 9)).astype(np.float32)
    emb = rng.normal(size=(21, 9)).astype(np.float32)
    idx, d1, d2 = nearest_codes_xla(jnp.asarray(flat), jnp.asarray(emb))
    bf_idx, bf_d = _brute_force_idx(flat, emb)
    np.testing.assert_array_equal(np.asarray(idx), bf_idx)
    np.testing.assert_allclose(np.asarray(d1), bf_d[:, 0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(d2), bf_d[:, 1], atol=1e-4)


def _mk(num_q=1, K=16, D=8, seed=0):
    cfg = VQConfig(num_quantizers=num_q, codes_per_level=K, code_dim=D)
    state = init_vq_state(jax.random.PRNGKey(seed), cfg)
    return cfg, state


def test_single_level_selects_nearest_and_st_gradient():
    cfg, state = _mk()
    z_e = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 8))

    def f(z):
        (z_q_st, _, _, _), _, _ = quantize_ema(
            state, z, cfg, train=False, do_ema_update=jnp.asarray(False),
            decay=jnp.asarray(0.98),
        )
        return jnp.sum(z_q_st), z_q_st

    (val, z_q_st), grad = jax.value_and_grad(f, has_aux=True)(z_e)
    # straight-through: d(sum z_q_st)/d z_e == 1 everywhere
    np.testing.assert_allclose(np.asarray(grad), 1.0, atol=1e-6)

    (_, z_q, idx, _), _, _ = quantize_ema(
        state, z_e, cfg, train=False, do_ema_update=jnp.asarray(False),
        decay=jnp.asarray(0.98),
    )
    bf_idx, _ = _brute_force_idx(
        np.asarray(z_e).reshape(-1, 8), np.asarray(state.embedding)
    )
    np.testing.assert_array_equal(np.asarray(idx).reshape(-1), bf_idx)
    np.testing.assert_allclose(
        np.asarray(z_q).reshape(-1, 8),
        np.asarray(state.embedding)[bf_idx],
        atol=1e-6,
    )


def test_ema_update_matches_manual_math():
    cfg, state = _mk(K=4, D=3)
    decay = 0.9
    z_e = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 3))
    (_, _, idx, _), new_state, _ = quantize_ema(
        state, z_e, cfg, train=True, do_ema_update=jnp.asarray(True),
        decay=jnp.asarray(decay),
    )
    flat = np.asarray(z_e).reshape(-1, 3)
    idx = np.asarray(idx).reshape(-1)
    counts = np.bincount(idx, minlength=4).astype(np.float32)
    sums = np.zeros((4, 3), np.float32)
    np.add.at(sums, idx, flat)
    exp_cs = np.asarray(state.ema_cluster_size) * decay + counts * (1 - decay)
    exp_ee = np.asarray(state.ema_embedding) * decay + sums * (1 - decay)
    exp_emb = exp_ee / (exp_cs[:, None] + cfg.eps)
    np.testing.assert_allclose(np.asarray(new_state.ema_cluster_size), exp_cs,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.embedding), exp_emb,
                               atol=1e-5)


def test_ema_frozen_when_do_update_false():
    cfg, state = _mk()
    z_e = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 8))
    _, new_state, _ = quantize_ema(
        state, z_e, cfg, train=True, do_ema_update=jnp.asarray(False),
        decay=jnp.asarray(0.9),
    )
    np.testing.assert_array_equal(np.asarray(new_state.embedding),
                                  np.asarray(state.embedding))


def test_rvq_level_major_layout_and_sum():
    cfg, state = _mk(num_q=3, K=8, D=4)
    B, M = 2, 5
    z_e = jax.random.normal(jax.random.PRNGKey(4), (B, M, 4))
    (z_q_st, z_q, idx, stats), _, _ = quantize_ema(
        state, z_e, cfg, train=False, do_ema_update=jnp.asarray(False),
        decay=jnp.asarray(0.98),
    )
    idx = np.asarray(idx)
    # level-major flat layout [Q*B*M] (models/vq_vae.py:260)
    assert idx.shape == (3 * B * M,)
    for lvl in range(3):
        seg = idx[lvl * B * M : (lvl + 1) * B * M]
        assert (seg >= lvl * 8).all() and (seg < (lvl + 1) * 8).all()
    # z_q equals the sum of per-level code vectors
    emb = np.asarray(state.embedding)
    zq_manual = sum(
        emb[idx[lvl * B * M : (lvl + 1) * B * M]] for lvl in range(3)
    ).reshape(B, M, 4)
    np.testing.assert_allclose(np.asarray(z_q), zq_manual, atol=1e-5)


def test_rvq_matches_torch_oracle_ema():
    """Sequential RVQ-EMA semantics vs an independent torch implementation.

    The oracle re-implements the documented behavior (each level's update
    decays the FULL EMA buffers and refreshes the whole codebook before the
    next level quantizes its residual — models/vq_vae.py:233-258).
    """
    torch = pytest.importorskip("torch")
    num_q, K, D = 2, 6, 4
    cfg = VQConfig(num_quantizers=num_q, codes_per_level=K, code_dim=D)
    rng = np.random.default_rng(7)
    emb0 = rng.normal(size=(num_q * K, D)).astype(np.float32)
    state = init_state_from_centroids(emb0, cfg)
    decay = 0.8
    z = rng.normal(size=(2, 3, D)).astype(np.float32)

    # torch oracle
    t_emb = torch.tensor(emb0.copy())
    t_cs = torch.ones(num_q * K)
    t_ee = torch.tensor(emb0.copy())
    residual = torch.tensor(z.reshape(-1, D))
    t_idx_all = []
    for lvl in range(num_q):
        el = t_emb[lvl * K : (lvl + 1) * K]
        d = (residual.pow(2).sum(1, keepdim=True) - 2 * residual @ el.T
             + el.pow(2).sum(1)[None, :])
        il = d.argmin(1)
        gidx = il + lvl * K
        t_idx_all.append(gidx)
        zq_l = el[il]
        one = torch.nn.functional.one_hot(gidx, num_q * K).float()
        t_cs = t_cs * decay + one.sum(0) * (1 - decay)
        t_ee = t_ee * decay + (one.T @ residual) * (1 - decay)
        t_emb = t_ee / (t_cs[:, None] + cfg.eps)
        residual = residual - zq_l

    (_, _, idx, _), new_state, _ = quantize_ema(
        state, jnp.asarray(z), cfg, train=True,
        do_ema_update=jnp.asarray(True), decay=jnp.asarray(decay),
    )
    np.testing.assert_array_equal(
        np.asarray(idx), torch.cat(t_idx_all).numpy()
    )
    np.testing.assert_allclose(
        np.asarray(new_state.embedding), t_emb.numpy(), atol=1e-4
    )


def test_dead_code_reinit():
    cfg = VQConfig(num_quantizers=1, codes_per_level=8, code_dim=4,
                   reinit_dead_codes=True, reinit_prob=1.0,
                   dead_usage_threshold=0)
    state = init_vq_state(jax.random.PRNGKey(0), cfg)
    flat = jax.random.normal(jax.random.PRNGKey(1), (10, 4))
    usage = jnp.array([0, 5, 0, 3, 0, 0, 1, 2], jnp.float32)
    new = maybe_reinit_dead_codes(state, flat, usage, cfg,
                                  jax.random.PRNGKey(2), jnp.asarray(True))
    dead = np.asarray(usage) == 0
    flat_np = np.asarray(flat)
    for k in range(8):
        row = np.asarray(new.embedding[k])
        if dead[k]:
            # replaced by some batch row; ema_cluster_size reset to 1
            assert any(np.allclose(row, flat_np[i]) for i in range(10))
            assert float(new.ema_cluster_size[k]) == 1.0
        else:
            np.testing.assert_array_equal(row, np.asarray(state.embedding[k]))

    # gated off: nothing changes
    same = maybe_reinit_dead_codes(state, flat, usage, cfg,
                                   jax.random.PRNGKey(2), jnp.asarray(False))
    np.testing.assert_array_equal(np.asarray(same.embedding),
                                  np.asarray(state.embedding))


def test_centroid_init_shapes():
    cfg = VQConfig(num_quantizers=2, codes_per_level=4, code_dim=3)
    C2 = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    st = init_state_from_centroids(C2, cfg)
    np.testing.assert_array_equal(np.asarray(st.embedding), C2)
    np.testing.assert_array_equal(np.asarray(st.ema_cluster_size),
                                  np.ones(8, np.float32))
    C3 = C2.reshape(2, 4, 3)
    st3 = init_state_from_centroids(C3, cfg)
    np.testing.assert_array_equal(np.asarray(st3.embedding), C2)
    with pytest.raises(ValueError):
        init_state_from_centroids(np.zeros((7, 3), np.float32), cfg)
    with pytest.raises(ValueError):
        init_state_from_centroids(np.zeros((2, 4, 5), np.float32), cfg)


def test_epoch_stats_accumulate():
    cfg, state = _mk(K=8, D=4)
    ep = init_epoch_stats(cfg)
    z_e = jax.random.normal(jax.random.PRNGKey(5), (2, 6, 4))
    _, _, ep1 = quantize_ema(
        state, z_e, cfg, train=False, do_ema_update=jnp.asarray(False),
        decay=jnp.asarray(0.98), epoch_stats=ep,
    )
    assert float(ep1.count) == 12.0
    assert float(jnp.sum(ep1.usage)) == 12.0
    assert float(ep1.top2_sum) >= float(ep1.top1_sum) > 0.0
