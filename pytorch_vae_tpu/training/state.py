"""Explicit train-state pytree.

Everything the reference keeps as hidden module state — training_steps
(models/vq_vae.py:449), EMA codebook buffers, epoch diagnostics — is carried
here, so the jitted step is a pure function (state, batch, weights, rng) ->
(state, metrics). This is what makes resume/checkpointing exact and the step
donate-able.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import struct

from ..models.quantizer import VQEpochStats, VQState


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    vq_state: Optional[VQState]
    ep_stats: Optional[VQEpochStats]
    step: jnp.ndarray  # int32 scalar: completed optimizer steps
    epoch: jnp.ndarray  # int32 scalar (host-maintained, saved for resume)

    def next(self, params, opt_state, vq_state, ep_stats) -> "TrainState":
        return self.replace(
            params=params,
            opt_state=opt_state,
            vq_state=vq_state,
            ep_stats=ep_stats,
            step=self.step + 1,
        )
