"""Categorical VAE: Gumbel-Softmax discrete latents (Jang et al. 2017).

Rebuilds the upstream zoo's Categorical VAE row (reference
README.md:110): the latent is `latent_dim` categorical variables over
`categorical_dim` classes, sampled through the Gumbel-Softmax relaxation
with a temperature annealed over training, and the KL is the exact
discrete KL(q || uniform).

The upstream implementation anneals `self.temp` in-place on a
batch-index cadence that resets every epoch; here the temperature is a
pure function of the global step (ops/zoo_losses.anneal_temperature), so
the forward stays jit-pure — the model takes `step` as an argument
(`takes_step = True` tells the zoo train loop to thread it).
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


class CategoricalVAE(BaseVAE):
    in_channels: int = 3
    latent_dim: int = 64          # number of categorical variables
    categorical_dim: int = 10     # classes per variable
    hidden_dims: Sequence[int] = DEFAULT_HIDDEN_DIMS
    image_size: int = 64
    dtype: Any = jnp.float32
    temperature: float = 0.5
    anneal_rate: float = 3e-5
    min_temp: float = 0.2
    alpha: float = 30.0           # reconstruction weight (upstream default)

    takes_step = True  # zoo_experiment passes step into apply()

    def setup(self):
        self.encoder = ConvEncoder(self.hidden_dims, dtype=self.dtype)
        feat, hw = encoder_output_dim(self.hidden_dims, self.image_size)
        self.fc_z = nn.Dense(self.latent_dim * self.categorical_dim,
                             dtype=jnp.float32)
        self.decoder = ConvDecoder(self.hidden_dims, self.in_channels,
                                   base_hw=hw, dtype=self.dtype)

    def encode(self, x, train: bool = False):
        """-> categorical logits [B, latent_dim, categorical_dim]."""
        h = self.encoder(x, train=train)
        q = self.fc_z(h)
        return q.reshape(-1, self.latent_dim, self.categorical_dim)

    def decode(self, s, train: bool = False):
        """s: relaxed one-hots [B, latent_dim, categorical_dim]."""
        return self.decoder(s.reshape(s.shape[0], -1), train=train)

    def __call__(self, x, train: bool = False, step=0):
        q = self.encode(x, train=train)
        temp = zl.anneal_temperature(step, self.temperature,
                                     self.anneal_rate, self.min_temp)
        key = (self.make_rng("reparam") if train
               else jax.random.PRNGKey(0))
        s = zl.gumbel_softmax(key, q, temp)
        recons = self.decode(s, train=train)
        return [recons, x, q]

    def sample(self, num_samples: int, key, **kwargs):
        """Random hard one-hot code per categorical variable (the
        upstream sampler draws uniform class indices)."""
        idx = jax.random.randint(
            key, (num_samples, self.latent_dim), 0, self.categorical_dim)
        s = jax.nn.one_hot(idx, self.categorical_dim)
        return self.decode(s)

    def generate(self, x, **kwargs):
        return self(x)[0]

    def loss(self, recons, x, q, *, kld_weight: float = 1.0,
             **_) -> Dict[str, jnp.ndarray]:
        recons_loss = jnp.mean(
            (recons.astype(jnp.float32) - x.astype(jnp.float32)) ** 2)
        q_p = jax.nn.softmax(q.astype(jnp.float32), axis=-1)
        kld = jnp.mean(zl.categorical_kl(q_p))
        loss = self.alpha * recons_loss + kld_weight * kld
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "KLD": kld}

    def loss_function(self, *args, **kwargs):
        kw = dict(kwargs)
        if "M_N" in kw:
            kw["kld_weight"] = kw.pop("M_N")
        return self.loss(*args, **kw)
