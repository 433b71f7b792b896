"""Fused transformer FFN (matmul -> act -> dropout -> matmul) Pallas kernel.

Replaces the two-Dense FeedForward path of models/layers.py (reference:
the dim_feedforward MLP inside torch TransformerEncoderLayer,
models/vq_vae.py:455-473 of /root/reference). XLA cannot fuse two chained
matmuls, so the [N, 4E] hidden activation makes a full HBM round-trip
every layer: at the flagship config (B=128, L=350, E=512, FF=2048, bf16)
that is ~367 MB per layer forward (write + read of h) and more on the
backward — the round-2 profile put the FFN "convolution fusions" at
~62 ms/step, HBM-bound at ~90% of peak. This kernel keeps the hidden
activation in VMEM for one row-tile at a time and writes only the [N, E]
output, cutting FFN HBM traffic roughly in half.

MEASURED PERF NEGATIVE at flagship scale (kept as a hardware-validated
opt-in, cf. ops/fused_qkv_attention.py): full-step A/B on the real chip
(benchmarks/validate_fused_ffn_tpu.py step [4], alternating x2 in one
process) gave 149.9 ms fused vs 121.7 ms control
(benchmarks/fused_ffn_ab.json, +28 ms). Root cause matches the fused-QKV
finding: XLA's batch-minor conv-form fusions run the projections well
above what the in-kernel per-row-tile dots achieve, and the VMEM-capped
dW pass (rt<=256, th<=512) adds grid steps the big batched XLA backward
never pays. The HBM saved on the hidden round-trip does not cover that
gap at E=512/FF=2048. Correctness is fully validated (parity, seeded
dropout, VMEM fit, Mosaic lowering) so the kernel stays available via
PVT_FUSED_FFN=1 / set_fused_ffn_override for shapes where it may win
(narrower E with wider FF ratios); the default stays OFF.

Design (TPU-first; no reference-kernel counterpart exists to port):

- Grid over row tiles of the flattened [N, E] input; both weight
  matrices live VMEM-resident across the whole grid (constant block
  index -> fetched once). Hidden dim is tiled by a STATIC in-kernel
  loop (like flash_attention's head loop) so no output block is ever
  revisited non-consecutively.
- Backward splits into two kernels so each fits VMEM comfortably:
    A (grid = row tiles): recomputes pre-activations and produces dx.
    B (grid = (hidden tiles, row tiles), rows innermost): accumulates
      dW1/dW2/db1/db2 into f32 output blocks whose index depends only
      on the hidden tile — consecutive-revisit accumulation, zeroed at
      row step 0 and flushed automatically when the hidden tile
      advances.
  Recomputing x@W1 in both (flash-style) avoids storing the [N, FF]
  hidden tensor entirely: FLOPs are cheap here, HBM is not.
- Dropout mask is a pure function of the ABSOLUTE element position
  (global row, global hidden column) and the seed — one fmix32
  finalizer round over a salted counter — so forward and the two
  backward kernels reproduce the identical mask under *different*
  tilings, and the interpreter (CPU tests) matches hardware bit-for-bit.
  Rate is quantized to 1/2^24 with the survivor scale using the actual
  quantized rate (unbiased estimator), cf. CheapDropout's 1/256 in
  models/layers.py.
- Numerics mirror the bf16 Dense path: matmuls take bf16 operands with
  f32 MXU accumulation; bias-add and activation run in f32; the hidden
  activation is rounded to the model dtype once before the second
  matmul (exactly where the unfused path rounds fc1's output).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RATE_BITS = 24  # dropout rate quantized to 1/2^24

# Tri-state override: None = auto (env PVT_FUSED_FFN, else OFF until the
# hardware A/B in benchmarks/validate_fused_ffn_tpu.py says otherwise);
# True/False = force. Tests force True to run the interpreter on CPU.
_FORCE_FUSED: Optional[bool] = None

# Row count below which the kernel is skipped (pallas_call boundary
# layout copies outweigh the traffic saved on tiny inputs, cf.
# flash_min_kv): tokenizer FFNs run at N = B*16 rows.
_MIN_ROWS = 2048


def set_fused_ffn_override(value: Optional[bool]) -> None:
    global _FORCE_FUSED
    _FORCE_FUSED = value


def fused_ffn_enabled() -> bool:
    if _FORCE_FUSED is not None:
        return _FORCE_FUSED
    env = os.environ.get("PVT_FUSED_FFN", "")
    if env == "1":
        return jax.default_backend() == "tpu"
    return False


def fused_ffn_supported(n_rows: int, dim: int, hidden: int) -> bool:
    """Mosaic lane rule (last block dims must be 128-multiples) plus the
    hardware-validated VMEM envelope: the anchored tile bound in
    _fit_dw_tiles only covers E<=512 / FF<=2048 (the flagship FFN and
    everything below it); wider dims would need a fresh on-chip check."""
    return (dim % 128 == 0 and hidden % 128 == 0
            and dim <= 512 and hidden <= 2048
            and n_rows >= max(_MIN_ROWS, 8))


def _fmix32(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3 32-bit finalizer (full avalanche)."""
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h


def _keep_mask(shape: Tuple[int, int], row0, col0, s0, s1,
               thresh24: int, hidden: int) -> jnp.ndarray:
    """Keep mask for a [rows, cols] tile at global offset (row0, col0).

    Position-based (counter = global_row * hidden + global_col), so any
    tiling of the same array yields the same mask — the backward kernels
    tile differently from the forward. fmix32 is used on hardware too
    (unlike flash_attention's hw-PRNG path): the per-cell PRNG stream
    cannot be made tiling-independent, and this kernel is MXU/HBM-bound,
    not VPU-bound, so the hash is off the critical path.
    """
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0) + row0
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1) + col0
    ctr = rows * jnp.uint32(hidden) + cols
    salt = (s0.astype(jnp.uint32)
            ^ (s1.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)))
    h = _fmix32(ctr ^ salt)
    return (h >> jnp.uint32(32 - _RATE_BITS)) >= jnp.uint32(thresh24)


def _dot(a: jnp.ndarray, b: jnp.ndarray, dims) -> jnp.ndarray:
    """dot_general with f32 MXU accumulation at DEFAULT precision.

    Deliberately bf16-grade for f32 operands: the unfused Dense path
    this kernel replaces also runs at the stack's default (bf16-grade)
    matmul precision, so that IS the parity bar. Two hardware negatives
    pin this choice (benchmarks/validate_fused_ffn_tpu.py): requesting
    Precision.HIGHEST made Mosaic materialize multi-pass operand splits
    and blew the dW kernel's scoped VMEM 19.5 -> 21.3 MB (16 MB limit),
    and element-wise max-abs parity vs a HIGHEST reference fails anyway
    because bf16-grade `pre` flips relu gates near 0 — the validator
    therefore compares at default precision with a norm metric."""
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _act(pre: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == "relu":
        return jnp.maximum(pre, 0.0)
    if kind == "gelu":  # tanh approximation (flax nn.gelu default)
        c = np.sqrt(2.0 / np.pi).astype(np.float32)
        return 0.5 * pre * (1.0 + jnp.tanh(c * (pre + 0.044715 * pre**3)))
    raise ValueError(f"unsupported activation {kind!r}")


def _act_grad(pre: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == "relu":
        return (pre > 0.0).astype(pre.dtype)
    if kind == "gelu":
        c = np.sqrt(2.0 / np.pi).astype(np.float32)
        u = c * (pre + 0.044715 * pre**3)
        t = jnp.tanh(u)
        du = c * (1.0 + 3.0 * 0.044715 * pre**2)
        return 0.5 * (1.0 + t) + 0.5 * pre * (1.0 - t * t) * du
    raise ValueError(f"unsupported activation {kind!r}")


def _dropout_scale(thresh24: int) -> float:
    return 1.0 / (1.0 - thresh24 / float(1 << _RATE_BITS))


# ---------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------
def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                *, th: int, thresh24: int, activation: str, hidden: int):
    x = x_ref[...]                                   # [RT, E] model dtype
    row0 = jnp.uint32(pl.program_id(0) * x.shape[0])
    nj = hidden // th
    acc = jnp.zeros((x.shape[0], o_ref.shape[1]), jnp.float32)
    for j in range(nj):                              # static hidden tiles
        w1 = w1_ref[:, j * th:(j + 1) * th]
        pre = _dot(x, w1, ((1,), (0,))) + b1_ref[
            0, j * th:(j + 1) * th][None, :].astype(jnp.float32)
        h = _act(pre, activation)
        if thresh24 > 0:
            keep = _keep_mask(h.shape, row0, jnp.uint32(j * th),
                              seed_ref[0], seed_ref[1], thresh24, hidden)
            h = jnp.where(keep, h * _dropout_scale(thresh24), 0.0)
        acc = acc + _dot(h.astype(x.dtype),
                         w2_ref[j * th:(j + 1) * th, :], ((1,), (0,)))
    o_ref[...] = (acc + b2_ref[0][None, :].astype(jnp.float32)
                  ).astype(o_ref.dtype)


def _bwd_dx_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, g_ref, dx_ref,
                   *, th: int, thresh24: int, activation: str, hidden: int):
    x = x_ref[...]
    g = g_ref[...]                                   # dy [RT, E]
    row0 = jnp.uint32(pl.program_id(0) * x.shape[0])
    nj = hidden // th
    acc = jnp.zeros(x.shape, jnp.float32)
    for j in range(nj):
        w1 = w1_ref[:, j * th:(j + 1) * th]          # [E, TH]
        w2 = w2_ref[j * th:(j + 1) * th, :]          # [TH, E]
        pre = _dot(x, w1, ((1,), (0,))) + b1_ref[
            0, j * th:(j + 1) * th][None, :].astype(jnp.float32)
        dh = _dot(g, w2, ((1,), (1,)))               # dy @ W2^T
        if thresh24 > 0:
            keep = _keep_mask(dh.shape, row0, jnp.uint32(j * th),
                              seed_ref[0], seed_ref[1], thresh24, hidden)
            dh = jnp.where(keep, dh * _dropout_scale(thresh24), 0.0)
        dpre = dh * _act_grad(pre, activation)
        acc = acc + _dot(dpre.astype(x.dtype), w1,   # dpre @ W1^T
                         ((1,), (1,)))
    dx_ref[...] = acc.astype(dx_ref.dtype)


def _bwd_dw_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, g_ref,
                   dw1_ref, db1_ref, dw2_ref, db2_ref,
                   *, rt: int, thresh24: int, activation: str, hidden: int):
    # grid = (hidden tiles, row tiles), rows innermost: the f32 output
    # blocks (index = hidden tile only) accumulate across consecutive row
    # steps and flush when the hidden tile advances.
    j = pl.program_id(0)
    r = pl.program_id(1)
    th = dw1_ref.shape[1]

    @pl.when(r == 0)
    def _zero():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)

    # db2's block index is CONSTANT (0, 0): it lives across the whole
    # grid, so it must be zeroed exactly once (first cell), not at every
    # hidden tile's first row step — that would wipe the j=0 accumulation.
    @pl.when((r == 0) & (j == 0))
    def _zero_db2():
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[...]                                   # [RT, E]
    g = g_ref[...]                                   # [RT, E]
    row0 = (r * rt).astype(jnp.uint32)
    col0 = (j * th).astype(jnp.uint32)
    pre = _dot(x, w1_ref[...], ((1,), (0,))) + b1_ref[
        0][None, :].astype(jnp.float32)              # [RT, TH]
    h = _act(pre, activation)
    dh = _dot(g, w2_ref[...], ((1,), (1,)))          # dy @ W2^T
    if thresh24 > 0:
        keep = _keep_mask(pre.shape, row0, col0,
                          seed_ref[0], seed_ref[1], thresh24, hidden)
        scale = _dropout_scale(thresh24)
        h = jnp.where(keep, h * scale, 0.0)
        dh = jnp.where(keep, dh * scale, 0.0)
    dpre = dh * _act_grad(pre, activation)
    xd = x.astype(jnp.bfloat16) if x.dtype == jnp.bfloat16 else x
    dw1_ref[...] += _dot(xd, dpre.astype(xd.dtype),  # x^T @ dpre
                         ((0,), (0,)))
    db1_ref[...] += jnp.sum(dpre, axis=0, keepdims=True)
    dw2_ref[...] += _dot(h.astype(xd.dtype), g,      # h~^T @ dy
                         ((0,), (0,)))

    @pl.when(j == 0)
    def _db2():
        db2_ref[...] += jnp.sum(g.astype(jnp.float32), axis=0,
                                keepdims=True)


# ---------------------------------------------------------------------
# tiling
# ---------------------------------------------------------------------
# Scoped VMEM per kernel is 16 MB on current TPUs, and the interpreter
# can't see it — the dW pass's fit is hardware-anchored in _fit_dw_tiles.
# The fwd/dx row tile still uses a conservative estimator (those kernels
# keep BOTH full weight matrices resident, so their budget is row-tile
# dominated and the estimate over-counts via full double-buffering).
_VMEM_BUDGET = 13 * 2**20


def _rowpass_vmem(rt: int, th: int, e: int, ff: int, isz: int) -> int:
    """Estimated scoped-VMEM bytes for the fwd/dx kernels (full weights
    resident, x/g/out row tiles, f32 acc + up to 3 [rt, th] f32 temps)."""
    return (2 * e * ff * isz + 6 * rt * e * isz
            + 4 * rt * e + 12 * rt * th)


def _row_tile(n: int, cap: int) -> Tuple[int, int]:
    """(padded_n, row_tile): largest divisor of n that is a multiple of 8
    and <= cap; pads n up to a multiple of min(cap, 512) if none exists.
    Padded rows are zeros, so their dW/db contributions vanish."""
    for rt in range((min(cap, n) // 8) * 8, 7, -8):
        if n % rt == 0:
            return n, rt
    rt = min(cap, 512)
    return ((n + rt - 1) // rt) * rt, rt


def _hidden_tile(ff: int, cap: int) -> int:
    for th in range((min(cap, ff) // 128) * 128, 127, -128):
        if ff % th == 0:
            return th
    return ff


def _fit_row_tile(n: int, th: int, e: int, ff: int, isz: int,
                  vmem_fn) -> Tuple[int, int]:
    """Largest row tile whose estimated VMEM fits the budget."""
    for cap in (512, 256, 128, 64, 32, 16, 8):
        n_pad, rt = _row_tile(n, cap)
        if vmem_fn(rt, th, e, ff, isz) <= _VMEM_BUDGET:
            return n_pad, rt
    return _row_tile(n, 8)


def _fit_dw_tiles(n: int, e: int, ff: int, isz: int) -> Tuple[int, int, int]:
    """(padded_n, row_tile, hidden_tile) for the dW pass.

    Hardware-anchored rather than estimated: at (rt=448, th=1024,
    E=512, FF=2048, f32) Mosaic measured 19.52 MB of scoped VMEM
    (> the 16 MB limit). Every term in that allocation scales with rt,
    th, or rt*th, so (rt<=256, th<=512) bounds the same workload at
    19.52 * 256/448 = 11.2 MB; bf16 operand terms only shrink further.
    fused_ffn_supported() gates dims to E<=512 / FF<=2048 so this bound
    actually covers every shape the kernel accepts."""
    th = _hidden_tile(ff, 512)
    n_pad, rt = _row_tile(n, 256)
    return n_pad, rt, th


# ---------------------------------------------------------------------
# custom-VJP core (bf16/f32 operands as the module passes them)
# ---------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _core(x, w1, b1, w2, b2, seed, thresh24, activation, interpret):
    """x [N, E]; w1 [E, FF]; b1 [1, FF]; w2 [FF, E]; b2 [1, E];
    seed int32[2]. Returns [N, E] in x.dtype."""
    return _core_fwd(x, w1, b1, w2, b2, seed, thresh24, activation,
                     interpret)[0]


def _specs(rt, n, e, ff):
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    x_spec = pl.BlockSpec((rt, e), lambda r: (r, 0),
                          memory_space=pltpu.VMEM)
    w1_spec = pl.BlockSpec((e, ff), lambda r: (0, 0),
                           memory_space=pltpu.VMEM)
    b1_spec = pl.BlockSpec((1, ff), lambda r: (0, 0),
                           memory_space=pltpu.VMEM)
    w2_spec = pl.BlockSpec((ff, e), lambda r: (0, 0),
                           memory_space=pltpu.VMEM)
    b2_spec = pl.BlockSpec((1, e), lambda r: (0, 0),
                           memory_space=pltpu.VMEM)
    return seed_spec, x_spec, w1_spec, b1_spec, w2_spec, b2_spec


def _pad_rows(a, n_pad):
    if a.shape[0] == n_pad:
        return a
    return jnp.pad(a, ((0, n_pad - a.shape[0]), (0, 0)))


def _core_fwd(x, w1, b1, w2, b2, seed, thresh24, activation, interpret):
    n, e = x.shape
    ff = w1.shape[1]
    isz = x.dtype.itemsize
    th = _hidden_tile(ff, 512)
    n_pad, rt = _fit_row_tile(n, th, e, ff, isz, _rowpass_vmem)
    xp = _pad_rows(x, n_pad)
    seed_spec, x_spec, w1_spec, b1_spec, w2_spec, b2_spec = _specs(
        rt, n_pad, e, ff)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, th=th, thresh24=thresh24,
                          activation=activation, hidden=ff),
        grid=(n_pad // rt,),
        in_specs=[seed_spec, x_spec, w1_spec, b1_spec, w2_spec, b2_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, e), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * n_pad * e * ff,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + (w1.size + w2.size) * w1.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seed, xp, w1, b1, w2, b2)
    return out[:n], (x, w1, b1, w2, b2, seed)


def _core_bwd(thresh24, activation, interpret, res, g):
    x, w1, b1, w2, b2, seed = res
    n, e = x.shape
    ff = w1.shape[1]
    isz = x.dtype.itemsize
    th_a = _hidden_tile(ff, 512)
    n_pad, rt = _fit_row_tile(n, th_a, e, ff, isz, _rowpass_vmem)
    xp = _pad_rows(x, n_pad)
    gp = _pad_rows(g, n_pad)
    seed_spec, x_spec, w1_spec, b1_spec, w2_spec, _ = _specs(
        rt, n_pad, e, ff)
    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, th=th_a, thresh24=thresh24,
                          activation=activation, hidden=ff),
        grid=(n_pad // rt,),
        in_specs=[seed_spec, x_spec, w1_spec, b1_spec, w2_spec, x_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, e), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=6 * n_pad * e * ff,
            bytes_accessed=3 * x.size * x.dtype.itemsize
            + (w1.size + w2.size) * w1.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seed, xp, w1, b1, w2, gp)[:n]

    # dW pass: wider hidden tiles (fewer re-reads of x/dy), f32 outputs;
    # its own (smaller) row tile + padding — the [rt, th] f32 temps plus
    # the f32 weight-grad output blocks dominate this kernel's VMEM.
    n_pad_b, rt_b, th_b = _fit_dw_tiles(n, e, ff, isz)
    xpb = _pad_rows(x, n_pad_b)
    gpb = _pad_rows(g, n_pad_b)
    w1t_spec = pl.BlockSpec((e, th_b), lambda j, r: (0, j),
                            memory_space=pltpu.VMEM)
    b1t_spec = pl.BlockSpec((1, th_b), lambda j, r: (0, j),
                            memory_space=pltpu.VMEM)
    w2t_spec = pl.BlockSpec((th_b, e), lambda j, r: (j, 0),
                            memory_space=pltpu.VMEM)
    b2t_spec = pl.BlockSpec((1, e), lambda j, r: (0, 0),
                            memory_space=pltpu.VMEM)
    xr_spec = pl.BlockSpec((rt_b, e), lambda j, r: (r, 0),
                           memory_space=pltpu.VMEM)
    dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, rt=rt_b, thresh24=thresh24,
                          activation=activation, hidden=ff),
        grid=(ff // th_b, n_pad_b // rt_b),
        in_specs=[seed_spec, xr_spec, w1t_spec, b1t_spec, w2t_spec,
                  xr_spec],
        out_specs=[w1t_spec, b1t_spec, w2t_spec, b2t_spec],
        out_shape=[
            jax.ShapeDtypeStruct((e, ff), jnp.float32),
            jax.ShapeDtypeStruct((1, ff), jnp.float32),
            jax.ShapeDtypeStruct((ff, e), jnp.float32),
            jax.ShapeDtypeStruct((1, e), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * n_pad_b * e * ff,
            bytes_accessed=(ff // th_b) * 2 * x.size * x.dtype.itemsize
            + 2 * (w1.size + w2.size) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(seed, xpb, w1, b1, w2, gpb)

    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype),
            np.zeros(seed.shape, dtype=jax.dtypes.float0))


_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------
def fused_ffn(
    x: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    *,
    activation: str = "relu",
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused linear -> activation -> dropout -> linear.

    Args:
      x: [..., E] input (any leading shape; flattened internally).
      w1: [E, FF] first kernel;  b1: [FF] bias.
      w2: [FF, E] second kernel; b2: [E] bias.
      activation: "relu" or "gelu" (tanh approximation).
      dropout_rate: dropout on the hidden activation (between act and
        the second matmul, matching FeedForward's CheapDropout site).
      dropout_key: PRNG key; required when dropout_rate > 0.
      interpret: Pallas interpreter mode; default True off-TPU.

    Returns: [..., E] in x.dtype.
    """
    lead = x.shape[:-1]
    e = x.shape[-1]
    ff = w1.shape[1]
    if w1.shape[0] != e or w2.shape != (ff, e):
        raise ValueError(f"shape mismatch: x[..., {e}], w1 {w1.shape}, "
                         f"w2 {w2.shape}")
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

    out = _core(x.reshape(-1, e), w1, b1.reshape(1, ff), w2,
                b2.reshape(1, e), seed, thresh24, str(activation),
                bool(interpret))
    return out.reshape(lead + (e,))
