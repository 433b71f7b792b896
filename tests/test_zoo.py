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
        ("ConditionalVAE", {"num_classes": 5}),
        ("CategoricalVAE", {"categorical_dim": 6}),
        ("JointVAE", {"categorical_dim": 6}),
        ("InfoVAE", {"kernel_type": "imq"}),
        ("InfoVAE", {"kernel_type": "rbf"}),
        ("DFCVAE", {"feature_channels": (8, 16)}),
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
    "ConditionalVAE", "CategoricalVAE", "JointVAE", "InfoVAE", "DFCVAE",
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


# ---------------------------------------------------------------------
# Round-3 zoo extensions: Categorical / Joint / Info / Conditional / DFC
# ---------------------------------------------------------------------
def test_gumbel_softmax_is_simplex_and_sharpens():
    """Samples lie on the simplex; low temperature concentrates mass on
    the argmax; and the argmax frequencies follow softmax(logits) exactly
    (the Gumbel-max property, temperature-independent)."""
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray([[2.0, 0.0, -1.0, 0.5]])
    s = zl.gumbel_softmax(key, jnp.tile(logits, (8192, 1)), 1.0)
    np.testing.assert_allclose(np.asarray(jnp.sum(s, -1)), 1.0, rtol=1e-5)
    freq = np.bincount(np.asarray(jnp.argmax(s, -1)), minlength=4) / 8192
    want = np.asarray(jax.nn.softmax(logits[0]))
    np.testing.assert_allclose(freq, want, atol=0.02)
    cold = zl.gumbel_softmax(key, jnp.tile(logits, (512, 1)), 0.05)
    assert float(jnp.mean(jnp.max(cold, -1))) > 0.95


def test_categorical_kl_matches_torch_oracle():
    """categorical_kl vs the upstream CategoricalVAE formula computed in
    torch: sum q*log(q+eps) - q*log(1/K)."""
    import torch

    rng = np.random.default_rng(1)
    q_logits = rng.normal(size=(8, 5, 7)).astype(np.float32)
    q = torch.softmax(torch.tensor(q_logits), dim=-1)
    eps = 1e-7
    h1 = q * torch.log(q + eps)
    h2 = q * np.log(1.0 / 7)
    want = torch.sum(h1 - h2, dim=(1, 2)).numpy()
    got = np.asarray(zl.categorical_kl(
        jax.nn.softmax(jnp.asarray(q_logits), axis=-1)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_categorical_kl_zero_at_uniform():
    q = jnp.full((3, 4, 8), 1.0 / 8)
    np.testing.assert_allclose(
        np.asarray(zl.categorical_kl(q)), 0.0, atol=1e-5)


def test_anneal_temperature_schedule():
    t0, rate, mn = 0.5, 3e-5, 0.2
    assert float(zl.anneal_temperature(0, t0, rate, mn)) == pytest.approx(t0)
    mid = float(zl.anneal_temperature(10000, t0, rate, mn))
    assert mid == pytest.approx(t0 * np.exp(-rate * 10000), rel=1e-5)
    assert float(zl.anneal_temperature(10**7, t0, rate, mn)) == \
        pytest.approx(mn)


def test_capacity_schedule_linear_and_clamped():
    c = zl.capacity_schedule
    assert float(c(0, 0.0, 25.0, 25000)) == 0.0
    assert float(c(12500, 0.0, 25.0, 25000)) == pytest.approx(12.5)
    assert float(c(10**6, 0.0, 25.0, 25000)) == 25.0


def test_biased_mmd_matches_numpy_oracle():
    """biased=True keeps diagonals (the upstream InfoVAE V-statistic):
    mean(Kzz) + mean(Kpp) - 2*mean(Kzp) with the IMQ scale ladder."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    z = np.asarray(jax.random.normal(k1, (32, 6)))
    p = np.asarray(jax.random.normal(k2, (32, 6)))

    def imq(a, b, latent_var=2.0):
        d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        out = np.zeros_like(d2)
        for s in (0.1, 0.2, 0.5, 1.0, 2.0, 5.0, 10.0):
            c = 2.0 * a.shape[-1] * latent_var * s
            out += c / (c + d2)
        return out

    want = imq(z, z).mean() + imq(p, p).mean() - 2 * imq(z, p).mean()
    got = float(zl.mmd(jnp.asarray(z), jnp.asarray(p), "imq", biased=True))
    # f32 expanded-norm distances vs f64 numpy broadcast differences
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_info_vae_loss_composite_weighting():
    """InfoVAE.loss reassembles beta*recons + (1-alpha)*w*KL +
    (alpha+reg-1)*MMD from its own reported components."""
    from pytorch_vae_tpu.models import vae_models

    model = vae_models["InfoVAE"](**_TINY, alpha=-0.5, beta=5.0,
                                  reg_weight=100.0)
    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (8, 16, 16, 3)) * 2 - 1
    variables = model.init({"params": key, "reparam": key}, x, train=False)
    out = model.apply(variables, x, train=False)
    ld = model.loss(*out, kld_weight=0.01, key=key)
    want = (5.0 * float(ld["Reconstruction_Loss"])
            + (1.0 - (-0.5)) * 0.01 * float(ld["KLD"])
            + (-0.5 + 100.0 - 1.0) * float(ld["MMD"]))
    assert float(ld["loss"]) == pytest.approx(want, rel=1e-5)


def test_joint_vae_capacity_loss_oracle():
    """JointVAE.loss vs a numpy replication of the capacity objective at
    a mid-schedule step (incl. the log(K) clamp on the discrete side)."""
    from pytorch_vae_tpu.models import vae_models

    model = vae_models["JointVAE"](**_TINY, categorical_dim=6,
                                   disc_max_capacity=5.0,
                                   disc_num_iter=1000,
                                   cont_max_capacity=25.0,
                                   cont_num_iter=1000)
    key = jax.random.PRNGKey(4)
    x = jax.random.uniform(key, (4, 16, 16, 3)) * 2 - 1
    variables = model.init({"params": key, "reparam": key}, x, train=False)
    out = model.apply(variables, x, train=False)
    step = 500
    ld = model.loss(*out, kld_weight=0.02, step=step)
    recons, _, mu, log_var, q = [np.asarray(o) for o in out]
    mse = np.mean((recons - np.asarray(x)) ** 2)
    ckl = np.mean(-0.5 * np.sum(
        1 + log_var - mu**2 - np.exp(log_var), axis=-1))
    qp = np.exp(q) / np.exp(q).sum(-1, keepdims=True)
    dkl = np.mean(np.sum(qp * np.log(qp + 1e-7) - qp * np.log(1 / 6), -1))
    c_cont = 25.0 * step / 1000
    c_disc = min(5.0 * step / 1000, np.log(6))
    want = (30.0 * mse + 0.02 * (30.0 * abs(ckl - c_cont)
                                 + 30.0 * abs(dkl - c_disc)))
    assert float(ld["loss"]) == pytest.approx(want, rel=1e-4)


def test_dfc_feature_loss_properties():
    """Perceptual loss: exactly zero on identical images, positive and
    increasing with perturbation, deterministic across calls."""
    x = jax.random.uniform(jax.random.PRNGKey(5), (2, 16, 16, 3)) * 2 - 1
    zero = float(zl.perceptual_loss(x, x, (8, 16)))
    assert zero == 0.0
    n1 = x + 0.1 * jax.random.normal(jax.random.PRNGKey(6), x.shape)
    n2 = x + 0.5 * jax.random.normal(jax.random.PRNGKey(6), x.shape)
    l1 = float(zl.perceptual_loss(n1, x, (8, 16)))
    l2 = float(zl.perceptual_loss(n2, x, (8, 16)))
    assert 0 < l1 < l2
    assert float(zl.perceptual_loss(n1, x, (8, 16))) == l1


def test_conditional_vae_label_conditions_output():
    """Same image, different labels -> different posterior and different
    decode of the same z (both paths actually consume the label)."""
    from pytorch_vae_tpu.models import vae_models

    model = vae_models["ConditionalVAE"](**_TINY, num_classes=4)
    key = jax.random.PRNGKey(7)
    x = jax.random.uniform(key, (2, 16, 16, 3)) * 2 - 1
    y0 = jax.nn.one_hot(jnp.zeros((2,), jnp.int32), 4)
    y1 = jax.nn.one_hot(jnp.ones((2,), jnp.int32), 4)
    variables = model.init({"params": key, "reparam": key}, x, labels=y0,
                           train=False)
    mu0, _ = model.apply(variables, x, y0, method="encode")
    mu1, _ = model.apply(variables, x, y1, method="encode")
    assert float(jnp.max(jnp.abs(mu0 - mu1))) > 1e-6
    z = jax.random.normal(key, (2, model.latent_dim))
    d0 = model.apply(variables, z, y0, method="decode")
    d1 = model.apply(variables, z, y1, method="decode")
    assert float(jnp.max(jnp.abs(d0 - d1))) > 1e-6


def test_categorical_vae_temperature_follows_step():
    """The forward's Gumbel relaxation actually consumes the step-indexed
    temperature: with identical rng, late steps (colder) give sharper
    relaxed codes than step 0."""
    from pytorch_vae_tpu.models import vae_models

    model = vae_models["CategoricalVAE"](**_TINY, categorical_dim=6)
    key = jax.random.PRNGKey(8)
    x = jax.random.uniform(key, (4, 16, 16, 3)) * 2 - 1
    variables = model.init({"params": key, "reparam": key}, x, train=False)
    q = model.apply(variables, x, method="encode")
    t_hot = zl.anneal_temperature(0, model.temperature, model.anneal_rate,
                                  model.min_temp)
    t_cold = zl.anneal_temperature(10**7, model.temperature,
                                   model.anneal_rate, model.min_temp)
    s_hot = zl.gumbel_softmax(key, q, t_hot)
    s_cold = zl.gumbel_softmax(key, q, t_cold)
    assert float(jnp.mean(jnp.max(s_cold, -1))) > \
        float(jnp.mean(jnp.max(s_hot, -1)))


def test_conditional_zoo_experiment_fit_smoke(tmp_path):
    """ConditionalVAE end-to-end through ZooExperiment: pseudo-label
    threading (init + train step + eval) and sampling all work."""
    from pytorch_vae_tpu.training.zoo_experiment import ZooExperiment

    exp = ZooExperiment(
        {"name": "ConditionalVAE", "in_channels": 3, "latent_dim": 8,
         "num_classes": 4, "hidden_dims": (8, 16), "image_size": 16},
        {"LR": 1e-3, "manual_seed": 0, "kld_weight": 0.005,
         "print_every": 0, "save_samples": False,
         "checkpoint_dir": str(tmp_path / "ck")},
        {"img_size": 16, "train_batch_size": 8, "val_batch_size": 8,
         "synthetic_size": 16},
        {"max_epochs": 1}, verbose=False)
    state = exp.fit(max_epochs=1, log_dir=str(tmp_path / "logs"))
    assert int(state.step) == 2
    assert exp.sample(2).shape == (2, 16, 16, 3)


def test_step_conditioned_zoo_experiment_fit_smoke(tmp_path):
    """CategoricalVAE through ZooExperiment: the global step threads into
    the forward (Gumbel temperature schedule) without retracing."""
    from pytorch_vae_tpu.training.zoo_experiment import ZooExperiment

    exp = ZooExperiment(
        {"name": "CategoricalVAE", "in_channels": 3, "latent_dim": 8,
         "categorical_dim": 4, "hidden_dims": (8, 16), "image_size": 16},
        {"LR": 1e-3, "manual_seed": 0, "kld_weight": 0.005,
         "print_every": 0, "save_samples": False,
         "checkpoint_dir": str(tmp_path / "ck")},
        {"img_size": 16, "train_batch_size": 8, "val_batch_size": 8,
         "synthetic_size": 16},
        {"max_epochs": 1}, verbose=False)
    state = exp.fit(max_epochs=1, log_dir=str(tmp_path / "logs"))
    assert int(state.step) == 2
    assert exp.sample(2).shape == (2, 16, 16, 3)
