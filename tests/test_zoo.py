"""Image-zoo tests: loss math properties + one train step per model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_vae_tpu.ops import zoo_losses as zl

_TINY = {"in_channels": 3, "latent_dim": 8, "hidden_dims": (8, 16),
         "image_size": 16}


def test_gaussian_kl_matches_formula():
    rng = np.random.default_rng(0)
    mu = rng.normal(size=(4, 6)).astype(np.float32)
    lv = rng.normal(size=(4, 6)).astype(np.float32)
    got = np.asarray(zl.gaussian_kl(jnp.asarray(mu), jnp.asarray(lv)))
    want = -0.5 * np.sum(1 + lv - mu**2 - np.exp(lv), axis=-1)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_kl_zero_at_standard_normal():
    z = jnp.zeros((3, 5))
    np.testing.assert_allclose(
        np.asarray(zl.gaussian_kl(z, z)), 0.0, atol=1e-6)


@pytest.mark.parametrize("kernel", ["rbf", "imq"])
def test_mmd_discriminates_distributions(kernel):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    prior = jax.random.normal(k1, (128, 8))
    same = jax.random.normal(k2, (128, 8))
    shifted = jax.random.normal(k3, (128, 8)) + 3.0
    m_same = float(zl.mmd(same, prior, kernel))
    m_diff = float(zl.mmd(shifted, prior, kernel))
    assert m_diff > 10 * abs(m_same)
    assert abs(m_same) < 0.05


def test_iwae_bound_tightens_with_k():
    """E[IWAE_K] is monotone non-increasing in K (tighter bound)."""
    key = jax.random.PRNGKey(1)
    log_w = jax.random.normal(key, (512, 8))
    b1 = float(jnp.mean(zl.iwae_bound(log_w[:, :1])))
    b4 = float(jnp.mean(zl.iwae_bound(log_w[:, :4])))
    b8 = float(jnp.mean(zl.iwae_bound(log_w)))
    assert b8 <= b4 <= b1


def test_miwae_matches_iwae_at_m1():
    log_w = jax.random.normal(jax.random.PRNGKey(2), (16, 5))
    got = np.asarray(zl.miwae_bound(log_w[:, None, :]))
    want = np.asarray(zl.iwae_bound(log_w))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_ms_ssim_self_is_one():
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 3)) * 2 - 1
    val = float(zl.ms_ssim(x, x, levels=3))
    assert abs(val - 1.0) < 1e-3


def test_ms_ssim_decreases_with_noise():
    x = jax.random.uniform(jax.random.PRNGKey(4), (2, 32, 32, 3)) * 2 - 1
    noisy = x + jax.random.normal(jax.random.PRNGKey(5), x.shape) * 0.5
    assert float(zl.ms_ssim(x, noisy)) < float(zl.ms_ssim(x, x))


def test_betatc_terms_sum_to_kl_in_expectation():
    """MI + TC + dim-KL should roughly reassemble the full KL."""
    key = jax.random.PRNGKey(6)
    mu = jax.random.normal(key, (256, 4)) * 0.5
    lv = jnp.full((256, 4), -1.0)
    z = zl.reparameterize(jax.random.PRNGKey(7), mu, lv)
    mi, tc, dwkl = zl.betatc_terms(z, mu, lv, dataset_size=256)
    total = float(mi + tc + dwkl)
    kl = float(jnp.mean(zl.gaussian_kl(mu, lv)))
    assert abs(total - kl) / max(kl, 1e-6) < 0.5  # coarse estimator


@pytest.mark.parametrize(
    "name,extra",
    [
        ("VanillaVAE", {}),
        ("BetaVAE", {"loss_type": "H"}),
        ("BetaVAE", {"loss_type": "B"}),
        ("WAE_MMD", {"kernel_type": "rbf"}),
        ("WAE_MMD", {"kernel_type": "imq"}),
        ("IWAE", {"num_samples": 2}),
        ("MIWAE", {"num_samples": 2, "num_estimates": 2}),
        ("BetaTCVAE", {}),
        ("MSSIMVAE", {}),
        ("DIPVAE", {}),
        ("DIPVAE", {"dip_type": "i"}),
        ("LogCoshVAE", {"alpha": 100.0}),
        ("SWAE", {"n_projections": 16}),
    ],
)
def test_zoo_model_train_step(name, extra):
    from pytorch_vae_tpu.models import vae_models

    cls = vae_models[name]
    model = cls(**_TINY, **extra)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (4, 16, 16, 3)) * 2 - 1
    variables = model.init({"params": key, "reparam": key}, x, train=False)
    out, mutated = model.apply(
        variables, x, train=True, rngs={"reparam": key},
        mutable=["batch_stats"])
    ld = model.loss(*out, kld_weight=0.01, step=5, key=key)
    assert np.isfinite(float(ld["loss"])), (name, ld)
    # gradients exist and are finite
    def loss_fn(p):
        o, _ = model.apply({"params": p,
                            "batch_stats": variables["batch_stats"]},
                           x, train=True, rngs={"reparam": key},
                           mutable=["batch_stats"])
        return model.loss(*o, kld_weight=0.01, step=5, key=key)["loss"]

    g = jax.grad(loss_fn)(variables["params"])
    gn = float(jnp.sqrt(sum(jnp.sum(v**2) for v in jax.tree.leaves(g))))
    assert np.isfinite(gn) and gn > 0


@pytest.mark.parametrize("name", [
    "VanillaVAE", "BetaVAE", "WAE_MMD", "IWAE", "MIWAE", "BetaTCVAE",
    "MSSIMVAE", "DIPVAE", "LogCoshVAE", "SWAE",
])
def test_zoo_sample_and_generate(name):
    """Every registry model exposes the BaseVAE surface the reference
    defines (models/base.py:5-28): sample(n, key) -> [n, H, W, C] in the
    tanh range and generate(x) -> reconstruction of x's shape."""
    from pytorch_vae_tpu.models import vae_models

    model = vae_models[name](**_TINY)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 16, 16, 3)) * 2 - 1
    variables = model.init({"params": key, "reparam": key}, x, train=False)
    samples = model.apply(variables, 3, key, method="sample")
    assert samples.shape == (3, 16, 16, 3)
    recon = model.apply(variables, x, method="generate",
                        rngs={"reparam": key})
    assert recon.shape == x.shape
    assert float(jnp.max(jnp.abs(samples))) <= 1.0  # tanh head


def test_zoo_experiment_fit_smoke(tmp_path):
    """BASELINE.json config #1: CPU-runnable VanillaVAE end-to-end fit."""
    from pytorch_vae_tpu.training.zoo_experiment import ZooExperiment

    exp = ZooExperiment(
        {"name": "VanillaVAE", "in_channels": 3, "latent_dim": 8,
         "hidden_dims": (8, 16), "image_size": 16},
        {"LR": 1e-3, "manual_seed": 0, "kld_weight": 0.005,
         "print_every": 0, "save_samples": False,
         "checkpoint_dir": str(tmp_path / "ck")},
        {"img_size": 16, "train_batch_size": 8, "val_batch_size": 8,
         "synthetic_size": 24},
        {"max_epochs": 1}, verbose=False)
    state = exp.fit(max_epochs=1, log_dir=str(tmp_path / "logs"))
    assert int(state.step) == 3  # 24 // 8 batches
    samples = exp.sample(2)
    assert samples.shape == (2, 16, 16, 3)


def test_log_cosh_matches_torch_oracle():
    """Overflow-safe log_cosh vs torch.log(torch.cosh(.)) in f64 (small
    args) and finiteness where naive cosh overflows."""
    import torch

    rng = np.random.default_rng(3)
    t = rng.normal(scale=0.5, size=(64,)).astype(np.float64)
    for alpha in (1.0, 10.0):
        want = torch.log(torch.cosh(
            torch.tensor(t) * alpha)).numpy() / alpha
        got = np.asarray(zl.log_cosh(jnp.asarray(t, jnp.float32), alpha))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # naive cosh overflows f32 beyond |x| ~ 90; ours must stay finite and
    # asymptote to |t| - log(2)/alpha
    big = jnp.asarray([50.0, -200.0])
    got = np.asarray(zl.log_cosh(big, 10.0))
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(
        got, np.abs(np.asarray(big)) - np.log(2.0) / 10.0, rtol=1e-5)


def test_dip_penalty_matches_numpy_oracle():
    rng = np.random.default_rng(4)
    mu = rng.normal(size=(32, 6)).astype(np.float32)
    lv = rng.normal(scale=0.3, size=(32, 6)).astype(np.float32)
    lam_od, lam_d = 5.0, 10.0
    c = mu - mu.mean(0, keepdims=True)
    cov = c.T @ c / mu.shape[0]
    for dip_type in ("i", "ii"):
        cov_t = cov + (np.diag(np.exp(lv).mean(0))
                       if dip_type == "ii" else 0.0)
        diag = np.diagonal(cov_t)
        want = (lam_od * ((cov_t ** 2).sum() - (diag ** 2).sum())
                + lam_d * ((diag - 1.0) ** 2).sum())
        got = float(zl.dip_covariance_penalty(
            jnp.asarray(mu), jnp.asarray(lv), lam_od, lam_d, dip_type))
        np.testing.assert_allclose(got, want, rtol=1e-4)


def test_dip_penalty_zero_at_identity_cov():
    """Whitened latents with unit total variance: penalty ~ 0 for type ii
    when Cov[mu] + E[sigma^2] == I."""
    n, d = 4096, 3
    rng = np.random.default_rng(5)
    mu = rng.normal(scale=np.sqrt(0.5), size=(n, d)).astype(np.float32)
    lv = np.full((n, d), np.log(0.5), np.float32)
    got = float(zl.dip_covariance_penalty(
        jnp.asarray(mu), jnp.asarray(lv), 5.0, 10.0, "ii"))
    assert got < 0.15, got


def test_sliced_wasserstein_properties():
    """SWD ~ 0 for same-distribution batches; detects a mean shift; and
    matches a numpy per-slice 1-D OT oracle exactly."""
    k1, k2, k3, kt = jax.random.split(jax.random.PRNGKey(8), 4)
    a = jax.random.normal(k1, (256, 8))
    b = jax.random.normal(k2, (256, 8))
    c = jax.random.normal(k3, (256, 8)) + 2.0
    near = float(zl.sliced_wasserstein(a, b, kt, 64))
    far = float(zl.sliced_wasserstein(a, c, kt, 64))
    assert far > 10 * near, (near, far)

    # numpy oracle with the same projections
    d = a.shape[-1]
    theta = np.asarray(jax.random.normal(kt, (d, 64), jnp.float32))
    theta = theta / np.linalg.norm(theta, axis=0, keepdims=True)
    pa = np.sort(np.asarray(a) @ theta, axis=0)
    pc = np.sort(np.asarray(c) @ theta, axis=0)
    want = np.mean(np.abs(pa - pc) ** 2)
    np.testing.assert_allclose(far, want, rtol=1e-5)
