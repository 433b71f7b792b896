"""WAE-MMD: Wasserstein autoencoder with MMD penalty (RBF or IMQ kernel).

Deterministic encoder; the regularizer matches the aggregate posterior to
N(0, I) via an unbiased MMD^2 estimate (ops/zoo_losses.py). The prior
sample batch is drawn inside the loss with an explicit key.
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


class WAE_MMD(BaseVAE):
    in_channels: int = 3
    latent_dim: int = 128
    hidden_dims: Sequence[int] = DEFAULT_HIDDEN_DIMS
    image_size: int = 64
    dtype: Any = jnp.float32
    kernel_type: str = "imq"  # "rbf" | "imq"
    reg_weight: float = 100.0
    latent_var: float = 2.0

    def setup(self):
        self.encoder = ConvEncoder(self.hidden_dims, dtype=self.dtype)
        feat, hw = encoder_output_dim(self.hidden_dims, self.image_size)
        self.fc_z = nn.Dense(self.latent_dim, dtype=jnp.float32)
        self.decoder = ConvDecoder(self.hidden_dims, self.in_channels,
                                   base_hw=hw, dtype=self.dtype)

    def encode(self, x, train: bool = False):
        return self.fc_z(self.encoder(x, train=train))

    def decode(self, z, train: bool = False):
        return self.decoder(z, train=train)

    def __call__(self, x, train: bool = False):
        z = self.encode(x, train=train)
        recons = self.decode(z, train=train)
        return [recons, x, z]

    def sample(self, num_samples: int, key, **kwargs):
        z = jax.random.normal(key, (num_samples, self.latent_dim))
        return self.decode(z)

    def generate(self, x, **kwargs):
        return self(x)[0]

    def loss(self, recons, x, z, *, key=None, reg_weight=None,
             **_) -> Dict[str, jnp.ndarray]:
        recons_loss = jnp.mean(
            (recons.astype(jnp.float32) - x.astype(jnp.float32)) ** 2)
        if key is None:
            key = jax.random.PRNGKey(0)
        prior_z = jax.random.normal(key, z.shape, jnp.float32)
        mmd_val = zl.mmd(z, prior_z, self.kernel_type, self.latent_var)
        rw = self.reg_weight if reg_weight is None else reg_weight
        loss = recons_loss + rw * mmd_val
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "MMD": mmd_val}

    def loss_function(self, *args, **kwargs):
        return self.loss(*args, **kwargs)
