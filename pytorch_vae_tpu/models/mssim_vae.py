"""MS-SSIM VAE: Gaussian VAE with a multi-scale SSIM reconstruction loss.

Same trunk as VanillaVAE; the pixel-MSE reconstruction term is replaced by
1 - MS-SSIM(recons, x) (ops/zoo_losses.ms_ssim), which is perceptually
closer on face data.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..ops import zoo_losses as zl
from .vanilla_vae import VanillaVAE


class MSSIMVAE(VanillaVAE):
    window_size: int = 11
    ssim_levels: int = 3

    def loss(self, recons, x, mu, log_var, *, kld_weight: float = 1.0,
             step=0, **_) -> Dict[str, jnp.ndarray]:
        ssim_val = zl.ms_ssim(recons.astype(jnp.float32),
                              x.astype(jnp.float32),
                              levels=self.ssim_levels,
                              window_size=self.window_size)
        recons_loss = 1.0 - ssim_val
        kld = jnp.mean(zl.gaussian_kl(mu, log_var))
        loss = recons_loss + kld_weight * kld
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "KLD": kld, "MS_SSIM": ssim_val}
