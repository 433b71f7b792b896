"""Fully fused self-attention block: QKV projection + attention + output
projection in ONE Pallas TPU kernel.

Rebuilds the hot path of torch.nn.TransformerEncoderLayer's self-attention
(reference: models/vq_vae.py:455-473 drives nn.MultiheadAttention) the TPU
way. The unfused pipeline per layer is

    x --[conv fusion]--> q,k,v --[layout copy]--> flash kernel
      --[layout copy]--> o --[conv fusion]--> y

which materializes four [B, L, E] tensors in HBM (q, k, v, o), plus the
layout conversions XLA inserts at every pallas_call edge because its
preferred activation layouts are batch-minor while Pallas requires default
layouts (measured ~10 ms/step of pure copies at the flagship config). This
kernel reads x once, keeps the projection weights resident in VMEM across
the whole (B,) grid, and writes only y:

    per grid cell b:
        qkv = x_b @ Wqkv + bqkv          # one [L, 3E] MXU matmul
        per head j: o_j = softmax(q_j k_j^T * s + bias) v_j   (+dropout)
        y_b = concat_j(o_j) @ Wo + bo

Design notes (TPU-first):

- Grid is (B,); every block spans the full (L, E) / (E, 3E) extent of its
  operand, so all block dims equal the array dims — trivially legal under
  hardware Mosaic's 128-lane block rule (no head-group tiling needed,
  unlike ops/flash_attention.py). Weight blocks map every grid index to
  block (0, 0): Mosaic keeps them in VMEM across all B iterations.
- Backward recomputes everything from x (q, k, v, e, o) rather than
  saving activations: HBM is the bottleneck, MXU FLOPs are not.
- Weight/bias gradients are reductions over the batch grid: their output
  blocks also map every grid index to (0, 0), zero-initialized at b == 0
  and accumulated in f32 across the sequential TPU grid — the canonical
  Pallas reduction-output pattern.
- In-kernel probability dropout shares the seed/cell contract of
  ops/flash_attention.py (_keep_mask): cell = b * H + j, so fwd and bwd
  regenerate identical masks from the int32 seed pair alone.
- The per-head lane slices (qkv[:, j*Dh:(j+1)*Dh]) are value relayouts,
  cheap next to the two MXU matmuls per head (measured in the flash
  kernel, same pattern).

Available to models/layers.py::MultiHeadAttention when q, k, v are the
same tensor (encoder / decoder self-attention) via `use_fused` /
set_fused_override; cross-attention always uses the flash kernel path.

MEASURED RESULT (TPU v5e, flagship B=128 L=350 E=512 H=8): the fused
block is ~4 ms/step SLOWER than flash attention + XLA projections
(128.5 vs 124.6 ms). The in-kernel per-cell [L, E] x [E, 3E] projection
matmuls run below the efficiency of XLA's single [B*L, E] x [E, E]
batched projections, outweighing the saved q/k/v/o HBM round-trips and
boundary layout copies. Kept as a validated opt-in (hardware-validated
by benchmarks/validate_flash_tpu.py section [5]) because the trade-off
may flip at small L where per-op overhead dominates; the default
dispatch is OFF everywhere.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_vae_tpu.ops.flash_attention import (
    _RATE_BITS,
    _exp_rows,
    _keep_mask,
)

_NEG_BIG = -1e30

# Tri-state override mirroring flash_attention's: None = default (OFF on
# every backend — see the measured result above), True/False = force.
_FORCE_FUSED: Optional[bool] = None


def set_fused_override(value: Optional[bool]) -> None:
    global _FORCE_FUSED
    _FORCE_FUSED = value


def fused_enabled() -> bool:
    if _FORCE_FUSED is not None:
        return _FORCE_FUSED
    return False


def _attn_head(q, k, v, bias, seed_ref, cell, thresh24, hw_rng):
    """One head forward: returns (o, e, l) for reuse in the backward."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bias
    e, l = _exp_rows(s)
    rscale = 1.0 / l
    if thresh24 > 0:
        keep = _keep_mask(e.shape, seed_ref[0], seed_ref[1],
                          jnp.uint32(cell), thresh24, hw_rng)
        e = jnp.where(keep, e, 0.0)
        rscale = rscale * (1.0 / (1.0 - thresh24 / float(1 << _RATE_BITS)))
    o = jnp.dot(e.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return (o * rscale).astype(v.dtype), e, l


def _fwd_kernel(seed_ref, bias_ref, x_ref, wqkv_ref, bqkv_ref, wo_ref,
                bo_ref, y_ref,
                *, num_heads: int, scale: float, thresh24: int,
                hw_rng: bool):
    x = x_ref[0]                                    # [L, E]
    E = x.shape[-1]
    dh = E // num_heads
    qkv = (jax.lax.dot_general(
        x, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[0][None, :]).astype(x.dtype)       # [L, 3E]
    bias = bias_ref[0, 0][None, :]                  # [1, L] f32
    b = pl.program_id(0)
    outs = []
    for j in range(num_heads):
        q = qkv[:, j * dh:(j + 1) * dh] * jnp.asarray(scale, qkv.dtype)
        k = qkv[:, E + j * dh:E + (j + 1) * dh]
        v = qkv[:, 2 * E + j * dh:2 * E + (j + 1) * dh]
        o, _, _ = _attn_head(q, k, v, bias, seed_ref,
                             b * num_heads + j, thresh24, hw_rng)
        outs.append(o)
    o = outs[0] if num_heads == 1 else jnp.concatenate(outs, axis=-1)
    y = jax.lax.dot_general(
        o, wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bo_ref[0][None, :]
    y_ref[0] = y.astype(y_ref.dtype)


def _bwd_kernel(seed_ref, bias_ref, x_ref, wqkv_ref, bqkv_ref, wo_ref,
                g_ref, dx_ref, dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref,
                *, num_heads: int, scale: float, thresh24: int,
                hw_rng: bool):
    b = pl.program_id(0)
    x = x_ref[0]                                    # [L, E]
    g = g_ref[0]                                    # [L, E] = dL/dy
    E = x.shape[-1]
    dh = E // num_heads
    qkv = (jax.lax.dot_general(
        x, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[0][None, :]).astype(x.dtype)       # recompute [L, 3E]
    bias = bias_ref[0, 0][None, :]

    # dL/do = g @ Wo^T   (contract over the output-feature dim)
    do = jax.lax.dot_general(
        g, wo_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(g.dtype)                               # [L, E]

    inv = 1.0 / (1.0 - thresh24 / float(1 << _RATE_BITS)) \
        if thresh24 > 0 else 1.0
    os, dqs, dks, dvs = [], [], [], []
    for j in range(num_heads):
        q = qkv[:, j * dh:(j + 1) * dh] * jnp.asarray(scale, qkv.dtype)
        k = qkv[:, E + j * dh:E + (j + 1) * dh]
        v = qkv[:, 2 * E + j * dh:2 * E + (j + 1) * dh]
        gj = do[:, j * dh:(j + 1) * dh]
        cell = b * num_heads + j
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias
        e, l = _exp_rows(s)
        rl0 = 1.0 / l
        graw = jax.lax.dot_general(                 # dO V^T
            gj, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if thresh24 > 0:
            keep = _keep_mask(e.shape, seed_ref[0], seed_ref[1],
                              jnp.uint32(cell), thresh24, hw_rng)
            rl = rl0 * inv
            et = jnp.where(keep, e, 0.0)
            gdrop = jnp.where(keep, graw, 0.0) * inv
        else:
            rl = rl0
            et = e
            gdrop = graw
        # o is re-derived for dWo (same math as the forward)
        os.append((jnp.dot(et.astype(v.dtype), v,
                           preferred_element_type=jnp.float32)
                   * rl).astype(v.dtype))
        gs = (gj.astype(jnp.float32) * rl).astype(gj.dtype)
        dvs.append(jnp.dot(
            et.astype(gj.dtype).T, gs, preferred_element_type=jnp.float32
        ).astype(qkv.dtype))
        d = jnp.sum(et * graw, axis=-1, keepdims=True) * rl
        ds = (e * (gdrop - d) * rl0).astype(q.dtype)
        # q carried the score scale, so dq/d(qkv) re-applies it
        dqs.append((jnp.dot(
            ds, k, preferred_element_type=jnp.float32
        ) * scale).astype(qkv.dtype))
        dks.append(jnp.dot(
            ds.T, q, preferred_element_type=jnp.float32
        ).astype(qkv.dtype))
    o = os[0] if num_heads == 1 else jnp.concatenate(os, axis=-1)
    dqkv = jnp.concatenate(
        [dqs[0] if num_heads == 1 else jnp.concatenate(dqs, axis=-1),
         dks[0] if num_heads == 1 else jnp.concatenate(dks, axis=-1),
         dvs[0] if num_heads == 1 else jnp.concatenate(dvs, axis=-1)],
        axis=-1)                                    # [L, 3E]

    dx_ref[0] = jax.lax.dot_general(
        dqkv, wqkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)

    # weight/bias grads: f32 reduction blocks shared across the whole
    # grid (index_map is constant) — zero at the first cell, accumulate
    @pl.when(b == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[...] = jnp.zeros_like(dbqkv_ref)
        dwo_ref[...] = jnp.zeros_like(dwo_ref)
        dbo_ref[...] = jnp.zeros_like(dbo_ref)

    dwqkv_ref[...] += jax.lax.dot_general(
        x, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbqkv_ref[0] += jnp.sum(dqkv.astype(jnp.float32), axis=0)
    dwo_ref[...] += jax.lax.dot_general(
        o, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dbo_ref[0] += jnp.sum(g.astype(jnp.float32), axis=0)


def _specs(B, L, E):
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    bias_spec = pl.BlockSpec((1, 1, L), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((1, L, E), lambda b: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    wqkv_spec = pl.BlockSpec((E, 3 * E), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)
    bqkv_spec = pl.BlockSpec((1, 3 * E), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)
    wo_spec = pl.BlockSpec((E, E), lambda b: (0, 0),
                           memory_space=pltpu.VMEM)
    bo_spec = pl.BlockSpec((1, E), lambda b: (0, 0),
                           memory_space=pltpu.VMEM)
    return (seed_spec, bias_spec, x_spec, wqkv_spec, bqkv_spec, wo_spec,
            bo_spec)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10))
def _fused_core(x, wqkv, bqkv, wo, bo, bias, seed,
                num_heads, scale, thresh24, interpret):
    """x [B,L,E], wqkv [E,3E], bqkv [1,3E], wo [E,E], bo [1,E],
    bias [B,1,L] f32, seed int32[2] -> y [B,L,E]."""
    return _fused_core_fwd(x, wqkv, bqkv, wo, bo, bias, seed,
                           num_heads, scale, thresh24, interpret)[0]


def _fused_core_fwd(x, wqkv, bqkv, wo, bo, bias, seed,
                    num_heads, scale, thresh24, interpret):
    B, L, E = x.shape
    (seed_spec, bias_spec, x_spec, wqkv_spec, bqkv_spec, wo_spec,
     bo_spec) = _specs(B, L, E)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads, scale=scale,
                          thresh24=thresh24, hw_rng=not interpret),
        grid=(B,),
        in_specs=[seed_spec, bias_spec, x_spec, wqkv_spec, bqkv_spec,
                  wo_spec, bo_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((B, L, E), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * (3 * E * E + 2 * num_heads
                               * L * (E // num_heads) + E * E),
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + (wqkv.size + wo.size) * wqkv.dtype.itemsize
            + bias.size * 4,
            transcendentals=B * num_heads * L * L,
        ),
        interpret=interpret,
    )(seed, bias, x, wqkv, bqkv, wo, bo)
    return y, (x, wqkv, bqkv, wo, bo, bias, seed)


def _fused_core_bwd(num_heads, scale, thresh24, interpret, res, g):
    x, wqkv, bqkv, wo, bo, bias, seed = res
    B, L, E = x.shape
    (seed_spec, bias_spec, x_spec, wqkv_spec, bqkv_spec, wo_spec,
     bo_spec) = _specs(B, L, E)
    f32 = jnp.float32
    dx, dwqkv, dbqkv, dwo, dbo = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads, scale=scale,
                          thresh24=thresh24, hw_rng=not interpret),
        grid=(B,),
        in_specs=[seed_spec, bias_spec, x_spec, wqkv_spec, bqkv_spec,
                  wo_spec, x_spec],
        out_specs=[x_spec, wqkv_spec, bqkv_spec, wo_spec, bo_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, E), x.dtype),
            jax.ShapeDtypeStruct((E, 3 * E), f32),
            jax.ShapeDtypeStruct((1, 3 * E), f32),
            jax.ShapeDtypeStruct((E, E), f32),
            jax.ShapeDtypeStruct((1, E), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * B * L * (3 * E * E + 2 * num_heads
                               * L * (E // num_heads) + E * E),
            bytes_accessed=4 * x.size * x.dtype.itemsize
            + 2 * (wqkv.size + wo.size) * wqkv.dtype.itemsize
            + bias.size * 4,
            transcendentals=B * num_heads * L * L,
        ),
        interpret=interpret,
    )(seed, bias, x, wqkv, bqkv, wo, g)
    return (dx, dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
            dwo.astype(wo.dtype), dbo.astype(bo.dtype),
            jnp.zeros_like(bias),
            np.zeros(seed.shape, dtype=jax.dtypes.float0))


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


def fused_self_attention(
    x: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    wo: jnp.ndarray,
    bo: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    *,
    num_heads: int,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused self-attention block: (x @ Wqkv -> MHA -> @ Wo).

    Args:
      x: [B, L, E] block input (post-LayerNorm activations).
      wqkv: [E, 3E] stacked q|k|v projection weights.
      bqkv: [3E] stacked projection biases.
      wo: [E, E] output projection weight.
      bo: [E] output projection bias.
      key_mask: [B, L] bool, True = valid position.
      num_heads: number of attention heads (E % num_heads == 0).
      scale: score scale; default 1/sqrt(E / num_heads).
      dropout_rate / dropout_key: in-kernel attention-probability dropout
        (same seed/cell contract as ops/flash_attention.py).
      interpret: Pallas interpreter toggle; default True off-TPU.

    Returns: [B, L, E] block output (pre-residual).
    """
    B, L, E = x.shape
    if scale is None:
        scale = 1.0 / ((E // num_heads) ** 0.5)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    thresh24 = 0
    seed = jnp.zeros((2,), jnp.int32)
    if dropout_rate > 0.0:
        if dropout_key is None:
            raise ValueError("dropout_rate > 0 requires dropout_key")
        thresh24 = min((1 << _RATE_BITS) - 1,
                       int(round(dropout_rate * (1 << _RATE_BITS))))
        seed = jax.lax.bitcast_convert_type(
            jax.random.key_data(dropout_key).reshape(-1)[:2], jnp.int32)

    if key_mask is None:
        valid = jnp.ones((B, L), bool)
    else:
        valid = key_mask
    bias = jnp.where(valid, 0.0, _NEG_BIG).astype(jnp.float32)[:, None, :]

    return _fused_core(x, wqkv, bqkv.reshape(1, 3 * E), wo,
                       bo.reshape(1, E), bias, seed,
                       num_heads, float(scale), thresh24, bool(interpret))
