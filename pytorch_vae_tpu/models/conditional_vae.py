"""Conditional VAE: label-conditioned encoder and decoder.

Rebuilds the upstream zoo's ConditionalVAE row (reference
README.md:99 "Conditional VAE"): the class label is embedded as an extra
image-plane channel on the encoder input, and concatenated one-hot onto
the latent before decoding, so both q(z|x,y) and p(x|z,y) see y.

Deviation (documented): the reference CelebA attribute files don't ship
in this image, so the training loop conditions on deterministic
pseudo-labels drawn per batch (training/zoo_experiment.py); the model
itself is label-agnostic and accepts any one-hot [B, num_classes].
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


class ConditionalVAE(BaseVAE):
    in_channels: int = 3
    num_classes: int = 40
    latent_dim: int = 128
    hidden_dims: Sequence[int] = DEFAULT_HIDDEN_DIMS
    image_size: int = 64
    dtype: Any = jnp.float32

    conditional = True  # zoo_experiment threads labels into apply()

    def setup(self):
        # label -> one extra image plane; 1x1 conv re-embeds the pixels so
        # the encoder's first conv sees a learned mix (upstream convention)
        self.embed_class = nn.Dense(self.image_size * self.image_size,
                                    dtype=jnp.float32)
        self.embed_data = nn.Conv(self.in_channels, (1, 1),
                                  dtype=self.dtype)
        self.encoder = ConvEncoder(self.hidden_dims, dtype=self.dtype)
        feat, hw = encoder_output_dim(self.hidden_dims, self.image_size)
        self.fc_mu = nn.Dense(self.latent_dim, dtype=jnp.float32)
        self.fc_var = nn.Dense(self.latent_dim, dtype=jnp.float32)
        self.decoder = ConvDecoder(self.hidden_dims, self.in_channels,
                                   base_hw=hw, dtype=self.dtype)

    def _label_plane(self, labels):
        B = labels.shape[0]
        plane = self.embed_class(labels.astype(jnp.float32))
        return plane.reshape(B, self.image_size, self.image_size, 1)

    def encode(self, x, labels, train: bool = False):
        h = jnp.concatenate(
            [self.embed_data(x), self._label_plane(labels)], axis=-1)
        h = self.encoder(h, train=train)
        # log-var clamp: see vanilla_vae.encode
        return self.fc_mu(h), jnp.clip(self.fc_var(h), -30.0, 20.0)

    def decode(self, z, labels=None, train: bool = False):
        if labels is not None:
            z = jnp.concatenate([z, labels.astype(jnp.float32)], axis=-1)
        return self.decoder(z, train=train)

    def __call__(self, x, labels=None, train: bool = False):
        if labels is None:
            # label-free fallback (e.g. generic generate()): class 0
            labels = jax.nn.one_hot(
                jnp.zeros((x.shape[0],), jnp.int32), self.num_classes)
        mu, log_var = self.encode(x, labels, train=train)
        if train:
            z = zl.reparameterize(self.make_rng("reparam"), mu, log_var)
        else:
            z = mu
        recons = self.decode(z, labels, train=train)
        return [recons, x, mu, log_var]

    def sample(self, num_samples: int, key, labels=None, **kwargs):
        kz, kl_ = jax.random.split(key)
        z = jax.random.normal(kz, (num_samples, self.latent_dim))
        if labels is None:
            labels = jax.nn.one_hot(
                jax.random.randint(kl_, (num_samples,), 0, self.num_classes),
                self.num_classes)
        return self.decode(z, labels)

    def generate(self, x, labels=None, **kwargs):
        return self(x, labels=labels)[0]

    def loss(self, recons, x, mu, log_var, *, kld_weight: float = 1.0,
             **_) -> Dict[str, jnp.ndarray]:
        recons_loss = jnp.mean(
            (recons.astype(jnp.float32) - x.astype(jnp.float32)) ** 2)
        kld = jnp.mean(zl.gaussian_kl(mu, log_var))
        loss = recons_loss + kld_weight * kld
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "KLD": kld}

    def loss_function(self, *args, **kwargs):
        kw = dict(kwargs)
        if "M_N" in kw:
            kw["kld_weight"] = kw.pop("M_N")
        return self.loss(*args, **kw)
