"""Beta-TC-VAE: ELBO with the total-correlation decomposition.

loss = recon + alpha*MI + beta*TC + gamma*dim-wise-KL, with the
minibatch-weighted-sampling estimator (ops/zoo_losses.betatc_terms).
anneal_steps linearly ramps the gamma-weighted terms.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops import zoo_losses as zl
from .vanilla_vae import VanillaVAE


class BetaTCVAE(VanillaVAE):
    alpha: float = 1.0
    beta: float = 6.0
    gamma: float = 1.0
    anneal_steps: int = 10_000
    dataset_size: float = 40_000.0

    def __call__(self, x, train: bool = False):
        mu, log_var = self.encode(x, train=train)
        key = (self.make_rng("reparam") if train
               else jax.random.PRNGKey(0))
        z = zl.reparameterize(key, mu, log_var)
        recons = self.decode(z, train=train)
        return [recons, x, mu, log_var, z]

    def loss(self, recons, x, mu, log_var, z, *, step=0,
             **_) -> Dict[str, jnp.ndarray]:
        recons_loss = jnp.mean(
            (recons.astype(jnp.float32) - x.astype(jnp.float32)) ** 2)
        mi, tc, dwkl = zl.betatc_terms(z, mu, log_var, self.dataset_size)
        anneal = jnp.clip(
            jnp.asarray(step, jnp.float32) / max(self.anneal_steps, 1),
            0.0, 1.0)
        loss = (recons_loss + self.alpha * mi + self.beta * tc
                + anneal * self.gamma * dwkl)
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "MI": mi, "TC": tc, "KLD": dwkl}
