"""DFC-VAE: deep feature consistent VAE (Hou et al. 2016).

Rebuilds the upstream zoo's DFCVAE row (reference README.md:107): the
reconstruction objective is augmented with a perceptual term comparing
feature maps of the reconstruction and the input. Upstream uses
pretrained VGG19 layers {14, 24, 34}; no pretrained VGG ships in this
image, so the perceptual space is a frozen random strided-conv pyramid
(ops/zoo_losses.feature_pyramid — documented deviation with the
Johnson-Lindenstrauss rationale).

    loss = (recons_mse + feature_mse) + kld_weight * KL

matching the upstream weighting where pixel and feature losses are
summed unweighted against the scaled KL.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import zoo_losses as zl
from .base import BaseVAE
from .conv import DEFAULT_HIDDEN_DIMS, ConvDecoder, ConvEncoder, \
    encoder_output_dim


class DFCVAE(BaseVAE):
    in_channels: int = 3
    latent_dim: int = 128
    hidden_dims: Sequence[int] = DEFAULT_HIDDEN_DIMS
    image_size: int = 64
    dtype: Any = jnp.float32
    feature_channels: Tuple[int, ...] = (32, 64, 128)

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
             **_) -> Dict[str, jnp.ndarray]:
        recons_loss = jnp.mean(
            (recons.astype(jnp.float32) - x.astype(jnp.float32)) ** 2)
        feature_loss = zl.perceptual_loss(recons, x, self.feature_channels)
        kld = jnp.mean(zl.gaussian_kl(mu, log_var))
        loss = recons_loss + feature_loss + kld_weight * kld
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "Feature_Loss": feature_loss, "KLD": kld}

    def loss_function(self, *args, **kwargs):
        kw = dict(kwargs)
        if "M_N" in kw:
            kw["kld_weight"] = kw.pop("M_N")
        return self.loss(*args, **kw)
