"""IWAE: importance-weighted autoencoder (K-sample tighter bound).

Forward draws K latent samples per input (one vmapped decode — the K axis
folds into the batch so the MXU sees one big matmul batch) and the loss is
-(logsumexp_k log w_k - log K) with

    log w = log p(x|z) + log p(z) - log q(z|x),

using a unit-variance Gaussian likelihood on pixels. MIWAE (miwae.py)
generalizes this to M independent K-sample estimates.
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


class IWAE(BaseVAE):
    in_channels: int = 3
    latent_dim: int = 128
    hidden_dims: Sequence[int] = DEFAULT_HIDDEN_DIMS
    image_size: int = 64
    dtype: Any = jnp.float32
    num_samples: int = 5  # K

    def setup(self):
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

    def _draw(self, mu, log_var, k: int, key):
        """[B, D] -> z [B, k, D] via k reparameterized draws."""
        B, D = mu.shape
        eps = jax.random.normal(key, (B, k, D), jnp.float32)
        return mu[:, None, :] + eps * jnp.exp(0.5 * log_var)[:, None, :]

    def __call__(self, x, train: bool = False):
        mu, log_var = self.encode(x, train=train)
        key = (self.make_rng("reparam") if train
               else jax.random.PRNGKey(0))
        z = self._draw(mu, log_var, self.num_samples, key)  # [B, K, D]
        B, K, D = z.shape
        recons = self.decode(z.reshape(B * K, D), train=train)
        recons = recons.reshape(B, K, *recons.shape[1:])  # [B, K, H, W, C]
        return [recons, x, mu, log_var, z]

    def sample(self, num_samples: int, key, **kwargs):
        z = jax.random.normal(key, (num_samples, self.latent_dim))
        return self.decode(z)

    def generate(self, x, **kwargs):
        return self(x)[0][:, 0]

    def _log_w(self, recons, x, mu, log_var, z):
        """log importance weights [B, K]."""
        B, K = recons.shape[:2]
        x_flat = x.reshape(B, 1, -1).astype(jnp.float32)
        r_flat = recons.reshape(B, K, -1).astype(jnp.float32)
        log_px_z = -0.5 * jnp.sum((r_flat - x_flat) ** 2, axis=-1)
        log_pz = zl.std_normal_log_prob(z)
        log_qz = zl.gaussian_log_prob(z, mu[:, None, :], log_var[:, None, :])
        return log_px_z + log_pz - log_qz

    def loss(self, recons, x, mu, log_var, z, **_) -> Dict[str, jnp.ndarray]:
        log_w = self._log_w(recons, x, mu, log_var, z)
        bound = jnp.mean(zl.iwae_bound(log_w))
        recons_loss = jnp.mean(
            (recons[:, 0].astype(jnp.float32) - x.astype(jnp.float32)) ** 2)
        kld = jnp.mean(zl.gaussian_kl(mu, log_var))
        return {"loss": bound, "Reconstruction_Loss": recons_loss,
                "KLD": kld, "IWAE_Bound": bound}

    def loss_function(self, *args, **kwargs):
        return self.loss(*args, **kwargs)
