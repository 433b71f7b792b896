"""Joint VAE: continuous + discrete latents with capacity annealing
(Dupont 2018).

Rebuilds the upstream zoo's Joint VAE row (reference README.md:111): a
Gaussian latent and a Gumbel-Softmax categorical latent are concatenated
for the decoder, and each KL is driven toward a linearly-growing
information capacity C(step):

    loss = alpha * recons
         + kld_weight * ( cont_gamma * |KL_cont - C_cont(step)|
                        + disc_gamma * |KL_disc - C_disc(step)| )

with the discrete capacity clamped at its ceiling log(categorical_dim).
Capacities and temperature are pure functions of the global step
(takes_step = True), replacing the upstream's mutable `num_iter`/`temp`
module attributes.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import zoo_losses as zl
from .base import BaseVAE
from .conv import DEFAULT_HIDDEN_DIMS, ConvDecoder, ConvEncoder, \
    encoder_output_dim


class JointVAE(BaseVAE):
    in_channels: int = 3
    latent_dim: int = 32          # continuous dims
    categorical_dim: int = 40     # one categorical variable over K classes
    hidden_dims: Sequence[int] = DEFAULT_HIDDEN_DIMS
    image_size: int = 64
    dtype: Any = jnp.float32
    temperature: float = 0.5
    anneal_rate: float = 3e-5
    min_temp: float = 0.2
    alpha: float = 30.0
    cont_min_capacity: float = 0.0
    cont_max_capacity: float = 25.0
    cont_gamma: float = 30.0
    cont_num_iter: float = 25000.0
    disc_min_capacity: float = 0.0
    disc_max_capacity: float = 25.0
    disc_gamma: float = 30.0
    disc_num_iter: float = 25000.0

    takes_step = True

    def setup(self):
        self.encoder = ConvEncoder(self.hidden_dims, dtype=self.dtype)
        feat, hw = encoder_output_dim(self.hidden_dims, self.image_size)
        self.fc_mu = nn.Dense(self.latent_dim, dtype=jnp.float32)
        self.fc_var = nn.Dense(self.latent_dim, dtype=jnp.float32)
        self.fc_q = nn.Dense(self.categorical_dim, dtype=jnp.float32)
        self.decoder = ConvDecoder(self.hidden_dims, self.in_channels,
                                   base_hw=hw, dtype=self.dtype)

    def encode(self, x, train: bool = False):
        h = self.encoder(x, train=train)
        # log-var clamp: see vanilla_vae.encode
        return (self.fc_mu(h), jnp.clip(self.fc_var(h), -30.0, 20.0),
                self.fc_q(h))

    def decode(self, z, train: bool = False):
        """z: [B, latent_dim + categorical_dim] (continuous ++ one-hot)."""
        return self.decoder(z, train=train)

    def __call__(self, x, train: bool = False, step=0):
        mu, log_var, q = self.encode(x, train=train)
        temp = zl.anneal_temperature(step, self.temperature,
                                     self.anneal_rate, self.min_temp)
        if train:
            kc, kd = jax.random.split(self.make_rng("reparam"))
            z_cont = zl.reparameterize(kc, mu, log_var)
        else:
            kd = jax.random.PRNGKey(0)
            z_cont = mu
        s = zl.gumbel_softmax(kd, q[:, None, :], temp)[:, 0, :]
        z = jnp.concatenate([z_cont, s], axis=-1)
        recons = self.decode(z, train=train)
        return [recons, x, mu, log_var, q]

    def sample(self, num_samples: int, key, **kwargs):
        kz, kc = jax.random.split(key)
        z = jax.random.normal(kz, (num_samples, self.latent_dim))
        idx = jax.random.randint(kc, (num_samples,), 0,
                                 self.categorical_dim)
        s = jax.nn.one_hot(idx, self.categorical_dim)
        return self.decode(jnp.concatenate([z, s], axis=-1))

    def generate(self, x, **kwargs):
        return self(x)[0]

    def loss(self, recons, x, mu, log_var, q, *, kld_weight: float = 1.0,
             step=0, **_) -> Dict[str, jnp.ndarray]:
        recons_loss = jnp.mean(
            (recons.astype(jnp.float32) - x.astype(jnp.float32)) ** 2)
        cont_kld = jnp.mean(zl.gaussian_kl(mu, log_var))
        q_p = jax.nn.softmax(q.astype(jnp.float32), axis=-1)
        disc_kld = jnp.mean(zl.categorical_kl(q_p[:, None, :]))
        c_cont = zl.capacity_schedule(step, self.cont_min_capacity,
                                      self.cont_max_capacity,
                                      self.cont_num_iter)
        c_disc = jnp.minimum(
            zl.capacity_schedule(step, self.disc_min_capacity,
                                 self.disc_max_capacity,
                                 self.disc_num_iter),
            math.log(self.categorical_dim))
        capacity = (self.cont_gamma * jnp.abs(cont_kld - c_cont)
                    + self.disc_gamma * jnp.abs(disc_kld - c_disc))
        loss = self.alpha * recons_loss + kld_weight * capacity
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "Capacity_Loss": capacity, "KLD_Cont": cont_kld,
                "KLD_Disc": disc_kld}

    def loss_function(self, *args, **kwargs):
        kw = dict(kwargs)
        if "M_N" in kw:
            kw["kld_weight"] = kw.pop("M_N")
        return self.loss(*args, **kw)
