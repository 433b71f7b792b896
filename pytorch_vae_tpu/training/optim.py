"""Optimizer + LR schedule construction (optax).

Reproduces the reference's four LR modes (experiment.py:169-197,339-343):

  - "onecycle": torch OneCycleLR(cos) == optax.cosine_onecycle_schedule
    with the same max_lr / pct_start / div_factor / final_div_factor,
  - "cosine":   CosineAnnealingLR(T_max=max_epochs, eta_min=LR*1e-6); here
    stepped per optimizer step instead of per epoch (smoother, same curve),
  - "none":     constant LR,
  - manual epoch schedule ("LR" in exp_params.schedules): the reference sets
    the param-group LR once per epoch from the piecewise-linear knots; here
    the same value is computed inside the schedule as a function of
    epoch = step // steps_per_epoch, so one compile covers the whole run.

The optimizer is AdamW + global-norm clipping (experiment.py:170;
trainer gradient_clip_val, run.py:191).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np
import optax


def epoch_knot_schedule(
    pairs, steps_per_epoch: int
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """LR-from-epoch-knots, constant within an epoch (experiment.py:14-34)."""
    xs = np.asarray([p[0] for p in pairs], np.float32)
    vs = np.asarray([p[1] for p in pairs], np.float32)

    def fn(step):
        epoch = jnp.floor(step / float(max(1, steps_per_epoch)))
        return jnp.interp(epoch, xs, vs)

    return fn


def build_lr_schedule(
    exp_params: Dict,
    steps_per_epoch: int,
    max_epochs: int,
) -> Callable:
    lr = float(exp_params.get("LR", 1e-3))
    schedules = exp_params.get("schedules") or {}
    if "LR" in schedules and schedules["LR"]:
        return epoch_knot_schedule(schedules["LR"], steps_per_epoch)

    name = str(exp_params.get("lr_scheduler", "cosine")).lower()
    total_steps = max(1, steps_per_epoch * max_epochs)
    if name == "none":
        return optax.constant_schedule(lr)
    if name == "onecycle":
        # optax.cosine_onecycle_schedule NaNs when transition_steps is tiny
        # (integer boundary collapse -> 0-width interval); this direct
        # implementation of OneCycleLR(anneal='cos') is safe for any T.
        return onecycle_cos_schedule(
            total_steps=total_steps,
            max_lr=lr,
            pct_start=float(exp_params.get("onecycle_pct_start", 0.15)),
            div_factor=float(exp_params.get("onecycle_div_factor", 25.0)),
            final_div_factor=float(
                exp_params.get("onecycle_final_div", 1500.0)),
        )
    # cosine (default)
    return optax.cosine_decay_schedule(
        init_value=lr, decay_steps=total_steps, alpha=1e-6
    )


def onecycle_cos_schedule(
    total_steps: int,
    max_lr: float,
    pct_start: float = 0.15,
    div_factor: float = 25.0,
    final_div_factor: float = 1500.0,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """torch OneCycleLR (cos anneal): init -> peak -> final.

    init = max_lr / div_factor; final = init / final_div_factor
    (experiment.py:180-192 parameterization).
    """
    init_lr = max_lr / div_factor
    final_lr = init_lr / final_div_factor
    warm = max(1.0, pct_start * total_steps)
    cool = max(1.0, total_steps - warm)

    def cos_interp(a, b, t):
        return b + (a - b) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        t_up = jnp.clip(step / warm, 0.0, 1.0)
        t_dn = jnp.clip((step - warm) / cool, 0.0, 1.0)
        up = cos_interp(init_lr, max_lr, t_up)
        dn = cos_interp(max_lr, final_lr, t_dn)
        return jnp.where(step <= warm, up, dn)

    return fn


def build_optimizer(
    exp_params: Dict,
    steps_per_epoch: int,
    max_epochs: int,
    gradient_clip_val: Optional[float] = 1.0,
) -> tuple[optax.GradientTransformation, Callable]:
    lr_fn = build_lr_schedule(exp_params, steps_per_epoch, max_epochs)
    wd = float(exp_params.get("weight_decay", 0.0))
    chain = []
    if gradient_clip_val and gradient_clip_val > 0:
        chain.append(optax.clip_by_global_norm(float(gradient_clip_val)))
    chain.append(optax.adamw(learning_rate=lr_fn, weight_decay=wd))
    return optax.chain(*chain), lr_fn
