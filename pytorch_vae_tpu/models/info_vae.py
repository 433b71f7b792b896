"""Info VAE: MMD-regularized VAE with scaled KL (Zhao et al. 2017).

Rebuilds the upstream zoo's Info VAE row (reference README.md:112). The
objective interpolates between ELBO and a pure MMD autoencoder:

    loss = beta * recons
         + (1 - alpha) * kld_weight * KL
         + (alpha + reg_weight - 1) * MMD(q(z), p(z))

with alpha <= 0 (upstream default -0.5), IMQ or RBF kernel, and the
biased (V-statistic) MMD estimate against a fresh standard-normal prior
batch — the upstream convention (all N^2 kernel pairs). The prior draw
comes from the loss-time PRNG key the train loop already threads.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import zoo_losses as zl
from .base import BaseVAE
from .conv import DEFAULT_HIDDEN_DIMS, ConvDecoder, ConvEncoder, \
    encoder_output_dim


class InfoVAE(BaseVAE):
    in_channels: int = 3
    latent_dim: int = 128
    hidden_dims: Sequence[int] = DEFAULT_HIDDEN_DIMS
    image_size: int = 64
    dtype: Any = jnp.float32
    alpha: float = -0.5
    beta: float = 5.0
    reg_weight: float = 100.0
    kernel_type: str = "imq"
    latent_var: float = 2.0

    def setup(self):
        if self.alpha > 1.0:
            raise ValueError("alpha must be <= 1 (InfoVAE objective)")
        self.encoder = ConvEncoder(self.hidden_dims, dtype=self.dtype)
        feat, hw = encoder_output_dim(self.hidden_dims, self.image_size)
        self.fc_mu = nn.Dense(self.latent_dim, dtype=jnp.float32)
        self.fc_var = nn.Dense(self.latent_dim, dtype=jnp.float32)
        self.decoder = ConvDecoder(self.hidden_dims, self.in_channels,
                                   base_hw=hw, dtype=self.dtype)

    def encode(self, x, train: bool = False):
        h = self.encoder(x, train=train)
        # log-var clamp: see vanilla_vae.encode
        return self.fc_mu(h), jnp.clip(self.fc_var(h), -30.0, 20.0)

    def decode(self, z, train: bool = False):
        return self.decoder(z, train=train)

    def __call__(self, x, train: bool = False):
        mu, log_var = self.encode(x, train=train)
        if train:
            z = zl.reparameterize(self.make_rng("reparam"), mu, log_var)
        else:
            z = mu
        recons = self.decode(z, train=train)
        return [recons, x, z, mu, log_var]

    def sample(self, num_samples: int, key, **kwargs):
        z = jax.random.normal(key, (num_samples, self.latent_dim))
        return self.decode(z)

    def generate(self, x, **kwargs):
        return self(x)[0]

    def loss(self, recons, x, z, mu, log_var, *, kld_weight: float = 1.0,
             key=None, **_) -> Dict[str, jnp.ndarray]:
        if key is None:
            key = jax.random.PRNGKey(0)
        recons_loss = jnp.mean(
            (recons.astype(jnp.float32) - x.astype(jnp.float32)) ** 2)
        kld = jnp.mean(zl.gaussian_kl(mu, log_var))
        prior_z = jax.random.normal(key, z.shape, jnp.float32)
        mmd = zl.mmd(z, prior_z, self.kernel_type, self.latent_var,
                     biased=True)
        loss = (self.beta * recons_loss
                + (1.0 - self.alpha) * kld_weight * kld
                + (self.alpha + self.reg_weight - 1.0) * mmd)
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "KLD": kld, "MMD": mmd}

    def loss_function(self, *args, **kwargs):
        kw = dict(kwargs)
        if "M_N" in kw:
            kw["kld_weight"] = kw.pop("M_N")
        return self.loss(*args, **kw)
