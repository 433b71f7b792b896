"""MIWAE: M independent K-sample importance-weighted estimates.

Draws M*K latents per input in one batched decode and averages the
per-estimate IWAE_K bounds (ops/zoo_losses.miwae_bound). BASELINE.json
config: K=5, M=3.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops import zoo_losses as zl
from .iwae import IWAE


class MIWAE(IWAE):
    num_samples: int = 5   # K
    num_estimates: int = 3  # M

    def __call__(self, x, train: bool = False):
        mu, log_var = self.encode(x, train=train)
        key = (self.make_rng("reparam") if train
               else jax.random.PRNGKey(0))
        MK = self.num_estimates * self.num_samples
        z = self._draw(mu, log_var, MK, key)  # [B, M*K, D]
        B, _, D = z.shape
        recons = self.decode(z.reshape(B * MK, D), train=train)
        recons = recons.reshape(B, MK, *recons.shape[1:])
        return [recons, x, mu, log_var, z]

    def loss(self, recons, x, mu, log_var, z, **_) -> Dict[str, jnp.ndarray]:
        log_w = self._log_w(recons, x, mu, log_var, z)  # [B, M*K]
        B = log_w.shape[0]
        log_w = log_w.reshape(B, self.num_estimates, self.num_samples)
        bound = jnp.mean(zl.miwae_bound(log_w))
        recons_loss = jnp.mean(
            (recons[:, 0].astype(jnp.float32) - x.astype(jnp.float32)) ** 2)
        kld = jnp.mean(zl.gaussian_kl(mu, log_var))
        return {"loss": bound, "Reconstruction_Loss": recons_loss,
                "KLD": kld, "MIWAE_Bound": bound}
