"""Classic VAE-zoo loss family as jit-fused reductions.

Covers the losses the upstream model zoo exposes (reference README model
list; BASELINE.json configs): Gaussian ELBO/KL, WAE-MMD with RBF and IMQ
kernels, IWAE/MIWAE importance-weighted bounds, beta-TC decomposition
terms, and MS-SSIM. Everything is a pure function over arrays; reductions
happen in float32 regardless of compute dtype.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def gaussian_kl(mu: jnp.ndarray, log_var: jnp.ndarray) -> jnp.ndarray:
    """KL(q(z|x) || N(0, I)) per sample, summed over latent dims -> [B]."""
    mu = mu.astype(jnp.float32)
    log_var = log_var.astype(jnp.float32)
    return -0.5 * jnp.sum(1 + log_var - mu**2 - jnp.exp(log_var), axis=-1)


def reparameterize(key: jax.Array, mu: jnp.ndarray,
                   log_var: jnp.ndarray) -> jnp.ndarray:
    std = jnp.exp(0.5 * log_var)
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    return mu + eps * std


def gaussian_log_prob(x: jnp.ndarray, mu: jnp.ndarray,
                      log_var: jnp.ndarray) -> jnp.ndarray:
    """log N(x; mu, diag(exp(log_var))) summed over the last axis."""
    x = x.astype(jnp.float32)
    mu = mu.astype(jnp.float32)
    log_var = log_var.astype(jnp.float32)
    return -0.5 * jnp.sum(
        log_var + math.log(2 * math.pi) + (x - mu) ** 2 / jnp.exp(log_var),
        axis=-1,
    )


def std_normal_log_prob(z: jnp.ndarray) -> jnp.ndarray:
    z = z.astype(jnp.float32)
    return -0.5 * jnp.sum(z**2 + math.log(2 * math.pi), axis=-1)


# ---------------------------------------------------------------------
# MMD kernels (WAE)
# ---------------------------------------------------------------------
def _sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise squared distances [N, M] via the expanded-norm form."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    aa = jnp.sum(a * a, axis=1, keepdims=True)
    bb = jnp.sum(b * b, axis=1, keepdims=True).T
    ab = a @ b.T
    return jnp.maximum(aa - 2 * ab + bb, 0.0)


def rbf_kernel(a: jnp.ndarray, b: jnp.ndarray,
               latent_var: float = 2.0) -> jnp.ndarray:
    """RBF kernel with the zoo's bandwidth convention
    sigma^2 = 2 * D * latent_var."""
    d = a.shape[-1]
    sigma2 = 2.0 * d * latent_var
    return jnp.exp(-_sq_dists(a, b) / sigma2)


def imq_kernel(a: jnp.ndarray, b: jnp.ndarray, latent_var: float = 2.0,
               scales: Tuple[float, ...] = (0.1, 0.2, 0.5, 1.0, 2.0, 5.0,
                                            10.0)) -> jnp.ndarray:
    """Inverse multiquadric kernel, summed over a scale ladder:
    sum_s C_s / (C_s + ||a-b||^2) with C_s = 2 * D * latent_var * s."""
    d = a.shape[-1]
    c_base = 2.0 * d * latent_var
    d2 = _sq_dists(a, b)
    out = jnp.zeros_like(d2)
    for s in scales:
        c = c_base * s
        out = out + c / (c + d2)
    return out


def mmd(z: jnp.ndarray, prior_z: jnp.ndarray, kernel_type: str = "imq",
        latent_var: float = 2.0, biased: bool = False) -> jnp.ndarray:
    """MMD^2 between the aggregate posterior and the prior.

    Default is the U-statistic (diagonal terms excluded from the same-set
    averages). ``biased=True`` keeps the diagonals (V-statistic) — the
    convention the upstream InfoVAE loss uses, where each kernel mean runs
    over all N^2 pairs.
    """
    kern = rbf_kernel if kernel_type == "rbf" else imq_kernel
    n = z.shape[0]
    k_zz = kern(z, z, latent_var)
    k_pp = kern(prior_z, prior_z, latent_var)
    k_zp = kern(z, prior_z, latent_var)
    if biased:
        return (jnp.mean(k_zz) + jnp.mean(k_pp) - 2.0 * jnp.mean(k_zp))
    off = 1.0 - jnp.eye(n, dtype=k_zz.dtype)
    denom = jnp.maximum(n * (n - 1), 1)
    return (
        jnp.sum(k_zz * off) / denom
        + jnp.sum(k_pp * off) / denom
        - 2.0 * jnp.sum(k_zp) / (n * n)
    )


# ---------------------------------------------------------------------
# IWAE / MIWAE bounds
# ---------------------------------------------------------------------
def iwae_bound(log_w: jnp.ndarray) -> jnp.ndarray:
    """-(logsumexp_k(log w) - log K) per sample; log_w: [B, K] -> [B]."""
    K = log_w.shape[-1]
    return -(jax.scipy.special.logsumexp(log_w, axis=-1) - math.log(K))


def miwae_bound(log_w: jnp.ndarray) -> jnp.ndarray:
    """Mean over M of the per-estimate IWAE_K bound; log_w: [B, M, K]."""
    K = log_w.shape[-1]
    per_m = jax.scipy.special.logsumexp(log_w, axis=-1) - math.log(K)
    return -jnp.mean(per_m, axis=-1)


# ---------------------------------------------------------------------
# beta-TC decomposition (minibatch-weighted sampling)
# ---------------------------------------------------------------------
def log_qz_matrix(z: jnp.ndarray, mu: jnp.ndarray,
                  log_var: jnp.ndarray) -> jnp.ndarray:
    """log q(z_i | x_j) per latent dim: [B, B, D]."""
    z = z.astype(jnp.float32)[:, None, :]
    mu = mu.astype(jnp.float32)[None, :, :]
    log_var = log_var.astype(jnp.float32)[None, :, :]
    return -0.5 * (
        log_var + math.log(2 * math.pi)
        + (z - mu) ** 2 / jnp.exp(log_var)
    )


def betatc_terms(z, mu, log_var, dataset_size: float):
    """(mutual-info, total-correlation, dim-wise KL) per batch, using the
    minibatch-weighted-sampling estimator of the TC decomposition."""
    B = z.shape[0]
    log_q_zx = gaussian_log_prob(z, mu, log_var)        # [B]
    log_p_z = std_normal_log_prob(z)                    # [B]
    mat = log_qz_matrix(z, mu, log_var)                 # [B, B, D]
    strat = math.log(B * max(dataset_size, B))
    log_qz = jax.scipy.special.logsumexp(
        jnp.sum(mat, axis=2), axis=1) - strat           # [B]
    log_prod_qzi = jnp.sum(
        jax.scipy.special.logsumexp(mat, axis=1) - strat, axis=1)  # [B]
    mi = jnp.mean(log_q_zx - log_qz)
    tc = jnp.mean(log_qz - log_prod_qzi)
    dwkl = jnp.mean(log_prod_qzi - log_p_z)
    return mi, tc, dwkl


# ---------------------------------------------------------------------
# MS-SSIM
# ---------------------------------------------------------------------
def _gaussian_window(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / jnp.sum(g)


def _ssim_pair(a: jnp.ndarray, b: jnp.ndarray, window_size: int = 11,
               sigma: float = 1.5, data_range: float = 2.0):
    """Per-channel SSIM + contrast-structure maps; a, b: NHWC in [-1, 1]."""
    C = a.shape[-1]
    w1 = _gaussian_window(window_size, sigma)
    kernel = jnp.outer(w1, w1)[:, :, None, None]  # [H, W, 1, 1]
    kernel = jnp.tile(kernel, (1, 1, 1, C))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kernel,
            window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )

    mu_a, mu_b = filt(a), filt(b)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    s_aa = filt(a * a) - mu_aa
    s_bb = filt(b * b) - mu_bb
    s_ab = filt(a * b) - mu_ab
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    cs = (2 * s_ab + c2) / (s_aa + s_bb + c2)
    ssim = ((2 * mu_ab + c1) / (mu_aa + mu_bb + c1)) * cs
    return jnp.mean(ssim), jnp.mean(cs)


def ms_ssim(a: jnp.ndarray, b: jnp.ndarray, levels: int = 3,
            window_size: int = 11, data_range: float = 2.0) -> jnp.ndarray:
    """Multi-scale SSIM over `levels` dyadic scales; NHWC inputs.

    Levels are capped so every scale stays >= window_size (a smaller map
    would make the VALID filter degenerate and poison the product).
    """
    min_hw = min(a.shape[1], a.shape[2])
    feasible = 1
    while feasible < levels and (min_hw >> feasible) >= window_size:
        feasible += 1
    levels = max(1, min(levels, feasible))
    weights = jnp.asarray([0.0448, 0.2856, 0.3001, 0.2363, 0.1333][:levels])
    weights = weights / jnp.sum(weights)
    vals = []
    for lv in range(levels):
        ssim, cs = _ssim_pair(a, b, window_size, data_range=data_range)
        vals.append(cs if lv < levels - 1 else ssim)
        if lv < levels - 1:
            a = jax.lax.reduce_window(
                a, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
            b = jax.lax.reduce_window(
                b, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
    vals = jnp.stack(vals)
    vals = jnp.clip(vals, 1e-6, 1.0)
    return jnp.prod(vals ** weights)


def dip_covariance_penalty(mu: jnp.ndarray, log_var: jnp.ndarray,
                           lambda_offdiag: float, lambda_diag: float,
                           dip_type: str = "ii") -> jnp.ndarray:
    """DIP-VAE disentanglement regularizer (Kumar et al. 2018).

    Penalizes the latent covariance toward identity:
      type "i":  Cov = Cov_batch[mu]
      type "ii": Cov = Cov_batch[mu] + E_batch[diag(exp(log_var))]
    penalty = lambda_offdiag * sum(offdiag(Cov)^2)
            + lambda_diag * sum((diag(Cov) - 1)^2)
    """
    mu = mu.astype(jnp.float32)
    centered = mu - jnp.mean(mu, axis=0, keepdims=True)
    cov = centered.T @ centered / mu.shape[0]
    if dip_type == "ii":
        cov = cov + jnp.diag(jnp.mean(jnp.exp(
            log_var.astype(jnp.float32)), axis=0))
    diag = jnp.diagonal(cov)
    offdiag_sq = jnp.sum(cov ** 2) - jnp.sum(diag ** 2)
    return (lambda_offdiag * offdiag_sq
            + lambda_diag * jnp.sum((diag - 1.0) ** 2))


def log_cosh(t: jnp.ndarray, alpha: float = 10.0) -> jnp.ndarray:
    """Elementwise log(cosh(alpha * t)) / alpha, overflow-safe.

    Uses log cosh x = |x| + log1p(exp(-2|x|)) - log 2, which is exact and
    never exponentiates a positive argument (naive cosh overflows f32 at
    alpha*t ~ 90; robust-loss papers run alpha in the 10-100 range).
    """
    a = jnp.abs(alpha * t.astype(jnp.float32))
    return (a + jnp.log1p(jnp.exp(-2.0 * a)) - jnp.log(2.0)) / alpha


# ---------------------------------------------------------------------
# Gumbel-Softmax / categorical latents (Categorical + Joint VAE)
# ---------------------------------------------------------------------
def gumbel_softmax(key: jax.Array, logits: jnp.ndarray,
                   temperature, eps: float = 1e-7) -> jnp.ndarray:
    """Differentiable categorical relaxation (Jang et al. 2017).

    logits [..., K] -> soft one-hot samples [..., K]:
    softmax((logits + g) / tau) with g = -log(-log U). `temperature` may
    be a traced scalar (it is a pure function of the train step here; the
    upstream zoo mutates `self.temp` in-place on a batch_idx cadence that
    resets every epoch — an acknowledged stateful quirk this rebuild
    replaces with the equivalent step-indexed schedule, see
    anneal_temperature).
    """
    u = jax.random.uniform(key, logits.shape, jnp.float32,
                           minval=eps, maxval=1.0 - eps)
    g = -jnp.log(-jnp.log(u))
    return jax.nn.softmax(
        (logits.astype(jnp.float32) + g) / temperature, axis=-1)


def anneal_temperature(step, t0: float = 0.5, anneal_rate: float = 3e-5,
                       min_temp: float = 0.2):
    """Gumbel temperature schedule: max(t0 * exp(-rate * step), min_temp).

    The upstream zoo multiplies a live `self.temp` attribute by
    exp(-rate * batch_idx) every `anneal_interval` batches, with batch_idx
    resetting each epoch — the effective trajectory depends on epoch
    length. This pure step-indexed exponential is the intended behavior
    without the reset artifact (documented deviation).
    """
    step = jnp.asarray(step, jnp.float32)
    return jnp.maximum(t0 * jnp.exp(-anneal_rate * step), min_temp)


def categorical_kl(q_probs: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """KL(q || uniform) per sample for categorical posteriors.

    q_probs [B, N, K] (N categorical variables over K classes) ->
    [B]: sum_{n,k} q log q - q log(1/K), the exact discrete KL the
    upstream CategoricalVAE/JointVAE losses compute from softmaxed logits.
    """
    q = q_probs.astype(jnp.float32)
    k = q.shape[-1]
    ent = q * jnp.log(q + eps)
    cross = q * math.log(1.0 / k)
    return jnp.sum(ent - cross, axis=(-2, -1))


def capacity_schedule(step, min_c: float, max_c: float, num_iter: float):
    """Linear information-capacity ramp (Burgess et al. 2018; JointVAE):
    C(step) = min_c + (max_c - min_c) * step / num_iter, clamped at max_c."""
    step = jnp.asarray(step, jnp.float32)
    c = min_c + (max_c - min_c) * step / float(num_iter)
    return jnp.clip(c, min_c, max_c)


# ---------------------------------------------------------------------
# DFC perceptual features
# ---------------------------------------------------------------------
def _fixed_pyramid_kernels(in_channels: int,
                           channels: Tuple[int, ...]) -> list:
    """Deterministic He-scaled random conv kernels for the feature
    pyramid. Same kernels every call (constant-folded under jit)."""
    kernels = []
    cin = in_channels
    key = jax.random.PRNGKey(71)
    for i, cout in enumerate(channels):
        k = jax.random.fold_in(key, i)
        w = jax.random.normal(k, (3, 3, cin, cout), jnp.float32)
        w = w * math.sqrt(2.0 / (9 * cin))
        kernels.append(w)
        cin = cout
    return kernels


def feature_pyramid(x: jnp.ndarray,
                    channels: Tuple[int, ...] = (32, 64, 128)) -> list:
    """Fixed random strided-conv feature pyramid for perceptual losses.

    The upstream DFC-VAE compares VGG19 feature maps at layers
    {14, 24, 34}; no pretrained VGG ships in this image (documented
    deviation), so the perceptual space here is a frozen random conv
    pyramid — random projections preserve pairwise structure
    (Johnson-Lindenstrauss) and random-feature perceptual losses are a
    standard proxy. Three stride-2 stages mirror VGG's multi-scale
    receptive fields. Returns the per-stage activation list.
    """
    feats = []
    h = x.astype(jnp.float32)
    for w in _fixed_pyramid_kernels(x.shape[-1], channels):
        h = jax.lax.conv_general_dilated(
            h, w, window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.leaky_relu(h, 0.2)
        feats.append(h)
    return feats


def perceptual_loss(recons: jnp.ndarray, target: jnp.ndarray,
                    channels: Tuple[int, ...] = (32, 64, 128)) -> jnp.ndarray:
    """Sum of per-stage feature MSEs (upstream DFC sums MSE over the
    selected VGG layers). Target features carry no gradient."""
    fr = feature_pyramid(recons, channels)
    ft = feature_pyramid(jax.lax.stop_gradient(target), channels)
    return sum(jnp.mean((a - b) ** 2) for a, b in zip(fr, ft))


def sliced_wasserstein(z: jnp.ndarray, prior_z: jnp.ndarray,
                       key: jax.Array, n_projections: int = 50,
                       p: int = 2) -> jnp.ndarray:
    """Sliced Wasserstein-p distance between two batches (SWAE).

    Project both batches onto `n_projections` random unit directions,
    sort each 1-D projection, and average |sorted_z - sorted_prior|^p —
    the exact 1-D optimal transport cost per slice. Sorting is the only
    non-elementwise op, so the whole estimator stays on-device.
    """
    d = z.shape[-1]
    theta = jax.random.normal(key, (d, n_projections), jnp.float32)
    theta = theta / jnp.linalg.norm(theta, axis=0, keepdims=True)
    pz = jnp.sort(z.astype(jnp.float32) @ theta, axis=0)
    pp = jnp.sort(prior_z.astype(jnp.float32) @ theta, axis=0)
    return jnp.mean(jnp.abs(pz - pp) ** p)
