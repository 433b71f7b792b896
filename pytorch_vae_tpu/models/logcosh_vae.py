"""LogCosh-VAE: ELBO with a log-hyperbolic-cosine reconstruction term.

Zoo-extension entry beyond the reference fork (which registers only VQVAE,
/root/reference/models/__init__.py:8); the upstream AntixK zoo carries
LogCoshVAE. log cosh behaves like L2 near zero and L1 in the tails, so
reconstruction is robust to outlier pixels. The implementation uses the
overflow-safe identity in ops/zoo_losses.log_cosh rather than
exponentiating cosh directly.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..ops import zoo_losses as zl
from .vanilla_vae import VanillaVAE


class LogCoshVAE(VanillaVAE):
    alpha: float = 10.0
    beta: float = 1.0

    def loss(self, recons, x, mu, log_var, *, kld_weight: float = 1.0,
             step=0, **_) -> Dict[str, jnp.ndarray]:
        t = recons.astype(jnp.float32) - x.astype(jnp.float32)
        recons_loss = jnp.mean(jnp.sum(
            zl.log_cosh(t, self.alpha).reshape(t.shape[0], -1), axis=-1))
        kld = jnp.mean(zl.gaussian_kl(mu, log_var))
        loss = recons_loss + self.beta * kld_weight * kld
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "KLD": kld}
