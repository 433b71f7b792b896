"""Vanilla VAE (Gaussian encoder/decoder, ELBO loss) for 64x64 images.

API parity with the zoo convention (reference models/base.py:5-28):
forward returns [recons, input, mu, log_var]; loss_function takes those plus
M_N (the minibatch/dataset KLD weight). NHWC, bf16-capable conv stacks.
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


class VanillaVAE(BaseVAE):
    in_channels: int = 3
    latent_dim: int = 128
    hidden_dims: Sequence[int] = DEFAULT_HIDDEN_DIMS
    image_size: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = ConvEncoder(self.hidden_dims, dtype=self.dtype)
        feat, hw = encoder_output_dim(self.hidden_dims, self.image_size)
        self.fc_mu = nn.Dense(self.latent_dim, dtype=jnp.float32)
        self.fc_var = nn.Dense(self.latent_dim, dtype=jnp.float32)
        self.decoder = ConvDecoder(self.hidden_dims, self.in_channels,
                                   base_hw=hw, dtype=self.dtype)

    def encode(self, x, train: bool = False):
        h = self.encoder(x, train=train)
        # clamp log-variance: exp() overflows to inf under aggressive LRs
        # (stability addition over the reference zoo; inert in the normal
        # operating range)
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
        return [recons, x, mu, log_var]

    def sample(self, num_samples: int, key, **kwargs):
        z = jax.random.normal(key, (num_samples, self.latent_dim))
        return self.decode(z)

    def generate(self, x, **kwargs):
        return self(x)[0]

    def loss(self, recons, x, mu, log_var, *, kld_weight: float = 1.0,
             step=0, **_) -> Dict[str, jnp.ndarray]:
        """Pure ELBO loss; callable outside apply (no module state)."""
        recons_loss = jnp.mean(
            (recons.astype(jnp.float32) - x.astype(jnp.float32)) ** 2)
        kld = jnp.mean(zl.gaussian_kl(mu, log_var))
        loss = recons_loss + kld_weight * kld
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "KLD": kld}

    # reference-API alias (models/base.py loss_function convention)
    def loss_function(self, *args, **kwargs):
        kw = {k: v for k, v in kwargs.items()}
        if "M_N" in kw:
            kw["kld_weight"] = kw.pop("M_N")
        return self.loss(*args, **kw)
