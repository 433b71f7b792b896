"""Beta-VAE with both disentanglement objectives.

loss_type "H" (Higgins): ELBO with a constant beta > 1 on the KL.
loss_type "B" (Burgess): capacity-annealed |KL - C(t)| objective, with the
capacity C ramped from 0 to capacity_max_nats over capacity_stop_iter
steps (the "Disentangled Beta-VAE" entry of BASELINE.json). The global
train step drives the ramp, replacing the reference zoo's hidden
num_iter counter state.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp

from ..ops import zoo_losses as zl
from .conv import DEFAULT_HIDDEN_DIMS
from .vanilla_vae import VanillaVAE


class BetaVAE(VanillaVAE):
    in_channels: int = 3
    latent_dim: int = 128
    hidden_dims: Sequence[int] = DEFAULT_HIDDEN_DIMS
    image_size: int = 64
    dtype: Any = jnp.float32
    beta: float = 4.0
    gamma: float = 1000.0
    loss_type: str = "H"  # "H" (Higgins) | "B" (Burgess capacity-annealed)
    capacity_max_nats: float = 25.0
    capacity_stop_iter: int = 100_000

    def loss(self, recons, x, mu, log_var, *, kld_weight: float = 1.0,
             step=0, **_) -> Dict[str, jnp.ndarray]:
        recons_loss = jnp.mean(
            (recons.astype(jnp.float32) - x.astype(jnp.float32)) ** 2)
        kld = jnp.mean(zl.gaussian_kl(mu, log_var))
        if self.loss_type == "H":
            loss = recons_loss + self.beta * kld_weight * kld
        elif self.loss_type == "B":
            c = jnp.clip(
                self.capacity_max_nats
                * jnp.asarray(step, jnp.float32) / self.capacity_stop_iter,
                0.0, self.capacity_max_nats)
            loss = recons_loss + self.gamma * kld_weight * jnp.abs(kld - c)
        else:
            raise ValueError(f"Undefined loss type: {self.loss_type}")
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "KLD": kld}
