"""Flagship VQVAE model tests: shapes, modes, masking invariance, sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_vae_tpu.models import (
    VQVAE,
    init_epoch_stats,
    init_vq_state,
)

_KW = dict(hidden_dim=32, num_layers=2, num_heads=4, max_seq_len=32,
           codebook_size=16, code_dim=8, latent_tokens=4, ffn_dim=64)


def _mk(use_vq=True, num_quantizers=1, **over):
    kw = dict(_KW, use_vq=use_vq, num_quantizers=num_quantizers)
    kw.update(over)
    m = VQVAE(**kw)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (3, 32, 6))
    mask = jnp.arange(32)[None, :] < jnp.array([32, 20, 9])[:, None]
    vqs = init_vq_state(jax.random.PRNGKey(1), m.vq_config) if use_vq else None
    ep = init_epoch_stats(m.vq_config) if use_vq else None
    rngs = {"params": key, "dropout": key, "aug": key, "reinit": key}
    variables = m.init(rngs, x, mask, vqs, ep, step=0, train=False)
    return m, variables, x, mask, vqs, ep


def test_forward_shapes_single_level():
    m, v, x, mask, vqs, ep = _mk()
    out, nvq, nep, dbg = m.apply(v, x, mask, vqs, ep, step=0, train=False)
    recons, target, (zq, ze, idx, ppl, dead), mo = out
    assert recons.shape == (3, 32, 6)
    assert target.shape == (3, 32, 6)
    assert zq.shape == (3, 4, 8)
    assert idx.shape == (3, 4)
    np.testing.assert_array_equal(np.asarray(target), np.asarray(x))


def test_forward_rvq_flat_indices():
    m, v, x, mask, vqs, ep = _mk(num_quantizers=4)
    out, _, _, _ = m.apply(v, x, mask, vqs, ep, step=0, train=False)
    _, _, (zq, ze, idx, _, _), _ = out
    assert idx.shape == (4 * 3 * 4,)  # level-major [Q*B*M]


def test_ae_mode_bypasses_quantizer():
    m, v, x, mask, _, _ = _mk(use_vq=False, latent_sigmoid=True)
    out, nvq, nep, _ = m.apply(v, x, mask, None, None, step=0, train=False)
    _, _, (zq, ze, idx, ppl, dead), _ = out
    np.testing.assert_array_equal(np.asarray(zq), np.asarray(ze))
    # latent_sigmoid in AE mode squashes z_e into (0, 1)
    assert float(jnp.min(ze)) >= 0.0 and float(jnp.max(ze)) <= 1.0
    assert float(ppl) == 0.0 and nvq is None


def test_eval_deterministic():
    m, v, x, mask, vqs, ep = _mk()
    out1, _, _, _ = m.apply(v, x, mask, vqs, ep, step=0, train=False)
    out2, _, _, _ = m.apply(v, x, mask, vqs, ep, step=0, train=False)
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))


def test_valid_positions_invariant_to_padding():
    """Changing pad-region inputs must not change valid-position outputs."""
    m, v, x, mask, vqs, ep = _mk()
    out1, _, _, _ = m.apply(v, x, mask, vqs, ep, step=0, train=False)
    x2 = jnp.where(mask[..., None], x, 777.0)
    out2, _, _, _ = m.apply(v, x2, mask, vqs, ep, step=0, train=False)
    r1 = np.asarray(out1[0])
    r2 = np.asarray(out2[0])
    mnp = np.asarray(mask)
    np.testing.assert_allclose(r1[mnp], r2[mnp], atol=1e-4)


def test_train_consumes_rngs_and_updates_state():
    m, v, x, mask, vqs, ep = _mk(rigid_aug_prob=1.0, max_noise_std=0.1)
    key = jax.random.PRNGKey(9)
    out, nvq, nep, dbg = m.apply(
        v, x, mask, vqs, ep, step=0, train=True,
        rngs={"dropout": key, "aug": key, "reinit": key},
    )
    assert bool(jnp.any(nvq.embedding != vqs.embedding))
    assert float(nep.count) == 12.0
    # rigid aug rotates the input but the TARGET stays the clean x
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(x))


def test_sample_shapes():
    m, v, x, mask, vqs, ep = _mk(num_quantizers=2)
    out = m.apply(v, vqs, 5, jax.random.PRNGKey(0), 16, method="sample")
    assert out.shape == (5, 16, 6)


def test_ema_freeze_window():
    m, v, x, mask, vqs, ep = _mk(ema_update_freeze_steps=100)
    key = jax.random.PRNGKey(3)
    _, nvq, _, _ = m.apply(
        v, x, mask, vqs, ep, step=5, train=True,
        rngs={"dropout": key, "aug": key, "reinit": key},
    )
    np.testing.assert_array_equal(np.asarray(nvq.embedding),
                                  np.asarray(vqs.embedding))
    _, nvq2, _, _ = m.apply(
        v, x, mask, vqs, ep, step=200, train=True,
        rngs={"dropout": key, "aug": key, "reinit": key},
    )
    assert bool(jnp.any(nvq2.embedding != vqs.embedding))


def test_soft_vq_path():
    m, v, x, mask, vqs, ep = _mk(soft_vq_use=True, soft_vq_tau_warm_steps=10,
                                 soft_vq_alpha_warm_steps=10)
    key = jax.random.PRNGKey(4)
    out, nvq, nep, dbg = m.apply(
        v, x, mask, vqs, ep, step=2, train=True,
        rngs={"dropout": key, "aug": key, "reinit": key},
    )
    _, _, (zq, ze, idx, ppl, dead), _ = out
    assert idx.shape == (3, 4)
    assert float(dbg["tau"]) > 0.5  # mid-warmup tau
    assert bool(jnp.any(nvq.embedding != vqs.embedding))
