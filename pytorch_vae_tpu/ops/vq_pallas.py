"""Fused nearest-code search for VQ, as a Pallas TPU kernel.

The hot op of the VQ-VAE (reference: VectorQuantizerEMA.forward,
models/vq_vae.py:182-188 — `||z||^2 - 2 z E^T + ||E||^2` then argmin) is a
[N, K] distance matrix. Written naively in XLA, the matmul result round-trips
through HBM (e.g. N=8192, K=4096 -> 128 MB of f32 traffic) just to feed an
argmin. This kernel tiles N onto the grid, keeps the [BN, K] score block in
VMEM, runs the z @ E^T contraction on the MXU, and writes out only:

  - idx [N] int32: nearest code per row,
  - d1  [N] f32:   squared distance to the nearest code,
  - d2  [N] f32:   squared distance to the runner-up (codebook margin).

d1/d2 feed the quantization-error / margin epoch diagnostics that the
reference allocates but never fills (models/vq_vae.py:56-62,133-134) — here
they come for free out of the fused kernel.

A pure-XLA fallback (`nearest_codes_xla`) covers CPU tests and non-TPU
backends; `nearest_codes` dispatches on the default backend.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_BIG = -1e30
_PAD_DIST = 1e30


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _nearest_kernel(z_ref, et_ref, e2_ref, idx_ref, d1_ref, d2_ref):
    """One grid step: a [BN, D] block of rows against the full codebook.

    z_ref:  [BN, D]  queries (VMEM)
    et_ref: [D, K]   codebook, pre-transposed (VMEM)
    e2_ref: [1, K]   per-code squared norms, with +inf on padded codes (VMEM)
    idx_ref/d1_ref/d2_ref: [BN, 1] outputs
    """
    z = z_ref[:]
    scores = jnp.dot(z, et_ref[:], preferred_element_type=jnp.float32)
    # distance without the per-row ||z||^2 constant (irrelevant to argmin,
    # added back for d1/d2 below)
    part = e2_ref[:] - 2.0 * scores  # [BN, K]

    k = part.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, part.shape, dimension=1)

    min1 = jnp.min(part, axis=-1, keepdims=True)  # [BN, 1]
    is_min = part <= min1
    # first index achieving the min (matches jnp.argmin tie-breaking)
    idx1 = jnp.min(jnp.where(is_min, col, k), axis=-1, keepdims=True)
    masked = jnp.where(col == idx1, _PAD_DIST, part)
    min2 = jnp.min(masked, axis=-1, keepdims=True)

    z2 = jnp.sum(z * z, axis=-1, keepdims=True)
    idx_ref[:] = idx1.astype(jnp.int32)
    d1_ref[:] = jnp.maximum(min1 + z2, 0.0)
    d2_ref[:] = jnp.maximum(min2 + z2, 0.0)


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def nearest_codes_pallas(
    flat: jnp.ndarray,
    emb: jnp.ndarray,
    block_n: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """flat [N, D], emb [K, D] -> (idx [N] i32, d1 [N] f32, d2 [N] f32)."""
    n, d = flat.shape
    k = emb.shape[0]
    f32 = jnp.float32

    kp = _round_up(k, 128)
    np_ = _round_up(n, block_n)
    dp = _round_up(d, 128)

    z = jnp.zeros((np_, dp), f32).at[:n, :d].set(flat.astype(f32))
    et = jnp.zeros((dp, kp), f32).at[:d, :k].set(emb.astype(f32).T)
    e2 = jnp.full((1, kp), _PAD_DIST, f32).at[0, :k].set(
        jnp.sum(emb.astype(f32) ** 2, axis=-1)
    )

    grid = (np_ // block_n,)
    idx, d1, d2 = pl.pallas_call(
        _nearest_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, dp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dp, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((np_, 1), jnp.int32),
            jax.ShapeDtypeStruct((np_, 1), f32),
            jax.ShapeDtypeStruct((np_, 1), f32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * np_ * dp * kp,
            bytes_accessed=(np_ * dp + dp * kp + 3 * np_) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(z, et, e2)
    return idx[:n, 0], d1[:n, 0], d2[:n, 0]


def nearest_codes_xla(
    flat: jnp.ndarray, emb: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reference XLA path: expanded-norm distances + argmin + top-2."""
    f = flat.astype(jnp.float32)
    e = emb.astype(jnp.float32)
    scores = jnp.dot(f, e.T, precision=jax.lax.Precision.HIGHEST)
    d2_all = (
        jnp.sum(f * f, axis=1, keepdims=True)
        - 2.0 * scores
        + jnp.sum(e * e, axis=1)[None, :]
    )
    neg_top2, top2_idx = jax.lax.top_k(-d2_all, 2)
    idx = top2_idx[:, 0].astype(jnp.int32)
    d1 = jnp.maximum(-neg_top2[:, 0], 0.0)
    d2 = jnp.maximum(-neg_top2[:, 1], 0.0)
    return idx, d1, d2


def nearest_codes(
    flat: jnp.ndarray, emb: jnp.ndarray, use_pallas: bool | None = None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Dispatch: Pallas on TPU, XLA elsewhere (or force via use_pallas)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return nearest_codes_pallas(flat, emb)
    return nearest_codes_xla(flat, emb)
