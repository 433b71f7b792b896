"""DIP-VAE: ELBO + disentangled-inferred-prior covariance penalty.

Zoo-extension entry beyond the reference fork (which registers only VQVAE,
/root/reference/models/__init__.py:8): the upstream AntixK zoo the fork's
README still documents carries DIPVAE, and BASELINE.json frames the zoo
surface. loss = recon + kld_weight * KLD + dip_covariance_penalty
(ops/zoo_losses.py: type "ii" adds the mean encoder variance to the
mu-covariance before pushing it toward identity).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..ops import zoo_losses as zl
from .vanilla_vae import VanillaVAE


class DIPVAE(VanillaVAE):
    lambda_diag: float = 10.0
    lambda_offdiag: float = 5.0
    dip_type: str = "ii"

    def loss(self, recons, x, mu, log_var, *, kld_weight: float = 1.0,
             step=0, **_) -> Dict[str, jnp.ndarray]:
        recons_loss = jnp.mean(
            (recons.astype(jnp.float32) - x.astype(jnp.float32)) ** 2)
        kld = jnp.mean(zl.gaussian_kl(mu, log_var))
        dip = zl.dip_covariance_penalty(
            mu, log_var, self.lambda_offdiag, self.lambda_diag,
            self.dip_type)
        loss = recons_loss + kld_weight * kld + dip
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "KLD": kld, "DIP_Loss": dip}
