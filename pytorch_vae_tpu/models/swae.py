"""SWAE: Wasserstein autoencoder with the sliced-Wasserstein penalty.

Zoo-extension entry beyond the reference fork (which registers only VQVAE,
/root/reference/models/__init__.py:8); the upstream AntixK zoo carries
SWAE. Same deterministic-encoder structure as WAE-MMD, but the aggregate
posterior is matched to N(0, I) with the sliced Wasserstein distance
(ops/zoo_losses.sliced_wasserstein): random 1-D projections, per-slice
sort, exact 1-D OT cost — no kernel bandwidth to tune.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops import zoo_losses as zl
from .wae_mmd import WAE_MMD


class SWAE(WAE_MMD):
    n_projections: int = 50
    wasserstein_p: int = 2

    def loss(self, recons, x, z, *, key=None, reg_weight=None,
             **_) -> Dict[str, jnp.ndarray]:
        recons_loss = jnp.mean(
            (recons.astype(jnp.float32) - x.astype(jnp.float32)) ** 2)
        if key is None:
            # a fixed key would freeze the random projections and prior
            # sample across steps, silently biasing the SW estimator
            raise ValueError(
                "SWAE.loss requires a PRNG key (random slice directions "
                "+ prior draw); ZooExperiment threads one automatically")
        kp, kt = jax.random.split(key)
        prior_z = jax.random.normal(kp, z.shape, jnp.float32)
        swd = zl.sliced_wasserstein(z, prior_z, kt, self.n_projections,
                                    self.wasserstein_p)
        rw = self.reg_weight if reg_weight is None else reg_weight
        loss = recons_loss + rw * swd
        return {"loss": loss, "Reconstruction_Loss": recons_loss,
                "SWD": swd}
