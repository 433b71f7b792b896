"""Fused attention (softmax + prob-dropout + PV) as a Pallas TPU kernel.

Replaces the einsum attention path of models/layers.py for the shapes this
framework actually runs (L <= ~512 curve positions, N <= 64 latent tokens;
reference: torch nn.MultiheadAttention inside models/vq_vae.py:455-533).
The XLA einsum path materializes the [B, H, Lq, Lk] probability tensor plus
a same-shaped dropout mask in HBM every layer, fwd and bwd — at the
flagship config (B=128, H=8, L=350) that is ~600 MB of f32 traffic per
materialization and was measured to dominate the 265 ms train step
(attention fwd+bwd ~53 ms + a large share of the ~120 ms elementwise
"fusion" bucket; see CLAUDE.md profile notes). This kernel keeps the score
matrix in VMEM for one (batch, head) at a time, applies the key-padding
bias, softmax, and dropout in-kernel, and writes only the [Lq, Dh] output.

Design choices (TPU-first, intentionally NOT a port of any CUDA kernel):

- Whole-row kernel, not a streaming flash loop: Lq, Lk <= ~1024 here, so
  the full [Lq_pad, Lk_pad] f32 score block fits VMEM comfortably
  (384x384 = 576 KB). No running-max bookkeeping, no saved logsumexp —
  the backward simply recomputes the softmax (FLOPs are cheap, HBM is
  not). Grid is (B, H); each instance does 2 MXU matmuls fwd, 5 bwd.
- In-kernel dropout regenerated from the int32 seed pair alone: the
  backward kernel reproduces the identical mask, nothing else is carried
  between fwd and bwd. On hardware the bits come from the TPU PRNG
  (pltpu.prng_seed(s0, s1, cell) + prng_random_bits); under the Pallas
  interpreter — where prng_random_bits returns zeros — a stateless
  murmur3-fmix32 counter hash with the same contract is used instead
  (see _keep_mask).
- Dropout rate is quantized to 1/2^24 (cf. CheapDropout's 1/256 in
  models/layers.py); the survivor scale uses the actual quantized rate so
  the estimator stays unbiased.
- No host-side padding: block shapes equal the array dims (allowed by
  Mosaic for any size), so HBM traffic is exactly the tensor bytes and
  the compiler handles lane/sublane padding internally. Masked-out rows
  never NaN: the -1e30 additive bias degrades them to a uniform
  distribution, matching the einsum path's behavior.

Gradient math with dropout (M = keep mask, s = 1/(1-p), P = softmax(S),
Pt = M*P*s, O = Pt V):
    dV = Pt^T dO
    G  = M * (dO V^T) * s
    D_i = sum_k Pt_ik (dO V^T)_ik = rowsum(P * G)
    dS = P * (G - D)            (softmax Jacobian)
    dQ = dS K * scale,  dK = dS^T Q * scale
which reduces to standard attention backward when p = 0.
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

_NEG_BIG = -1e30
_RATE_BITS = 24  # dropout rate quantized to 1/2^24

# Tri-state override for the default dispatch in models/layers.py:
# None = auto (flash on TPU, einsum elsewhere); True/False = force.
# Tests force True to exercise the kernel under the interpreter on CPU.
_FORCE_FLASH: Optional[bool] = None


def set_flash_override(value: Optional[bool]) -> None:
    global _FORCE_FLASH
    _FORCE_FLASH = value


def flash_enabled() -> bool:
    if _FORCE_FLASH is not None:
        return _FORCE_FLASH
    return jax.default_backend() == "tpu"


# Minimum key/value length for the Pallas path. Every pallas_call edge
# costs a layout copy (XLA's surrounding fusions prefer batch-minor
# {0,2,1} layouts, profile r2: ~10 ms/step total); for short-memory
# attention (cross-attn over N=64 latent tokens) the XLA einsum path has
# no boundary and a small probability tensor, so the kernel can lose on
# copies alone. 0 = always use flash when enabled.
_FLASH_MIN_KV: int = 0


def set_flash_min_kv(n: int) -> None:
    global _FLASH_MIN_KV
    _FLASH_MIN_KV = int(n)


def flash_min_kv() -> int:
    return _FLASH_MIN_KV


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fmix32(h: jnp.ndarray) -> jnp.ndarray:
    """murmur3 32-bit finalizer: full-avalanche mix of a uint32 lattice."""
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h


def _keep_mask(shape: Tuple[int, int], s0, s1, cell: jnp.ndarray,
               thresh24: int, hw_rng: bool) -> jnp.ndarray:
    """Deterministic per-element keep mask for one (b, h) grid cell.

    Two bit sources with the same determinism contract (same seed pair +
    cell -> same mask, so the backward regenerates it exactly):

      - hw_rng=True: the TPU's PRNG (pltpu.prng_seed + prng_random_bits),
        a dedicated instruction — used on hardware, where the murmur hash
        was measurable VPU time on this VPU-bound kernel.
      - hw_rng=False: one fmix32 finalizer round (full-avalanche by
        construction) over a seed-and-cell-salted element counter — used
        under the Pallas interpreter, where prng_random_bits returns
        zeros; also the reproducible-everywhere reference for tests.
    """
    if hw_rng:
        # single int32 seed: this backend's tpu.prng_set_seed_32 rejects
        # multi-operand seeds, so (s0, s1, cell) are mixed into one salt
        salt = (s0.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
                ^ s1.astype(jnp.uint32)
                ^ cell * jnp.uint32(0x7FEB352D))
        # top bit dropped: scalar u32->s32 bitcasts don't lower in Mosaic
        pltpu.prng_seed((salt >> jnp.uint32(1)).astype(jnp.int32))
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        return (bits >> jnp.uint32(32 - _RATE_BITS)) >= jnp.uint32(thresh24)
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    ctr = rows * jnp.uint32(shape[1]) + cols
    salt = (s0.astype(jnp.uint32)
            ^ (s1.astype(jnp.uint32) * jnp.uint32(0x9E3779B9))
            ^ (cell.astype(jnp.uint32) * jnp.uint32(0x7FEB352D)))
    h = _fmix32(ctr ^ salt)
    return (h >> jnp.uint32(32 - _RATE_BITS)) >= jnp.uint32(thresh24)


def _exp_rows(s: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stable unnormalized softmax: exp(s - rowmax) and its row sums.

    Normalization is deferred to the [Lq, Dh] output (a row scale), not
    spent as a division pass over the [Lq, Lk] matrix — the kernel is
    VPU-bound on these full-matrix passes, not on the MXU matmuls.
    """
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e, jnp.sum(e, axis=-1, keepdims=True)


# exp(x) lowers on the TPU VPU as exp2(x * log2e) — an extra full-matrix
# multiply per softmax pass on this VPU-bound kernel. With PVT_FLASH_EXP2=1
# the flash kernels instead take scores already in log2 space (log2e is
# folded into the host-side q scale and the mask bias, [L, Dh]/[1, Lk]
# elements instead of [Lq, Lk]) and call exp2 directly. exp2(log2e*x) ==
# exp(x), so every probability-space quantity (P, row sums, dV, D) is
# unchanged; only the score-gradient picks up d exp2/dx = ln2 * exp2(x),
# paid as a ln2 on the [LQP, 1] row-scale column in the backward (see
# _bwd_kernel). Default OFF until benchmarks/validate_flash_tpu.py has
# passed on real hardware (the interpreter can't prove Mosaic lowering).
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453
_USE_EXP2 = os.environ.get("PVT_FLASH_EXP2", "0") == "1"


def _exp2_rows(s: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """_exp_rows for scores pre-scaled by log2e: exp2(s - rowmax), sums."""
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2(s - m)
    return e, jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(seed_ref, bias_ref, q_ref, k_ref, v_ref, o_ref,
                *, thresh24: int, num_heads: int, hpb: int, hw_rng: bool):
    """One (batch, head-group) cell: hpb heads, statically unrolled.

    Hardware Mosaic requires the lane (last) block dim to be a multiple
    of 128 or the full array width; a single Dh=64 head violates that in
    the 3D [B, L, H*Dh] layout, so each grid cell owns `hpb` consecutive
    heads (hpb*Dh % 128 == 0) and loops them in-register. Per-head value
    slices at lane offsets j*Dh are plain vector relayouts — cheap next
    to the two MXU matmuls per head.
    """
    qb = q_ref[0]                         # [LQP, hpb*DH]
    kb = k_ref[0]
    vb = v_ref[0]
    dh = qb.shape[-1] // hpb
    dhv = vb.shape[-1] // hpb
    bias = bias_ref[0, 0][None, :]        # [1, LKP] f32
    outs = []
    for j in range(hpb):
        q = qb[:, j * dh:(j + 1) * dh]
        k = kb[:, j * dh:(j + 1) * dh]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias                          # [LQP, LKP] f32
        e, l = (_exp2_rows if _USE_EXP2 else _exp_rows)(s)
        rscale = 1.0 / l                  # [LQP, 1]
        if thresh24 > 0:
            head = pl.program_id(1) * hpb + j
            cell = pl.program_id(0) * num_heads + head
            keep = _keep_mask(e.shape, seed_ref[0], seed_ref[1],
                              jnp.uint32(cell), thresh24, hw_rng)
            e = jnp.where(keep, e, 0.0)
            # survivor rescale folds into the row normalization
            rscale = rscale * (
                1.0 / (1.0 - thresh24 / float(1 << _RATE_BITS)))
        o = jnp.dot(e.astype(vb.dtype), vb[:, j * dhv:(j + 1) * dhv],
                    preferred_element_type=jnp.float32)
        outs.append((o * rscale).astype(o_ref.dtype))
    o_ref[0] = outs[0] if hpb == 1 else jnp.concatenate(outs, axis=-1)


def _bwd_kernel(seed_ref, bias_ref, q_ref, k_ref, v_ref, g_ref,
                dq_ref, dk_ref, dv_ref,
                *, thresh24: int, num_heads: int, hpb: int, hw_rng: bool):
    # gradient math (see module docstring), normalization kept as row
    # scales on [L, Dh]-shaped tensors wherever possible:
    #   P = e * rl,  P~ = M.e.(rl.inv)
    #   dV = e~^T (dO * rl.inv)            e~ = M.e
    #   D  = rowsum(e~ * Graw) * rl.inv    Graw = dO V^T
    #   dS = e * (M.Graw.inv - D) * rl
    qb = q_ref[0]
    kb = k_ref[0]
    vb = v_ref[0]
    gb = g_ref[0]
    dh = qb.shape[-1] // hpb
    dhv = vb.shape[-1] // hpb
    bias = bias_ref[0, 0][None, :]
    dqs, dks, dvs = [], [], []
    for j in range(hpb):
        q = qb[:, j * dh:(j + 1) * dh]
        k = kb[:, j * dh:(j + 1) * dh]
        v = vb[:, j * dhv:(j + 1) * dhv]
        g = gb[:, j * dhv:(j + 1) * dhv]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bias
        e, l = (_exp2_rows if _USE_EXP2 else _exp_rows)(s)  # [LQP, LKP]
        rl0 = 1.0 / l                                       # [LQP, 1]
        graw = jax.lax.dot_general(                         # dO V^T
            g, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if thresh24 > 0:
            head = pl.program_id(1) * hpb + j
            cell = pl.program_id(0) * num_heads + head
            keep = _keep_mask(e.shape, seed_ref[0], seed_ref[1],
                              jnp.uint32(cell), thresh24, hw_rng)
            inv = 1.0 / (1.0 - thresh24 / float(1 << _RATE_BITS))
            rl = rl0 * inv
            et = jnp.where(keep, e, 0.0)                    # e~
            gdrop = jnp.where(keep, graw, 0.0) * inv
        else:
            rl = rl0
            et = e
            gdrop = graw
        gs = (g.astype(jnp.float32) * rl).astype(g.dtype)   # [LQP, DHV]
        dvs.append(jnp.dot(
            et.astype(g.dtype).T, gs, preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype))
        d = jnp.sum(et * graw, axis=-1, keepdims=True) * rl  # [LQP, 1]
        # exp2 mode: d exp2/dx carries ln2 (scores live in log2 space);
        # folded into the [LQP, 1] row-scale column, not a full matrix
        ds = (e * (gdrop - d)
              * (rl0 * _LN2 if _USE_EXP2 else rl0)).astype(q.dtype)
        dqs.append(jnp.dot(
            ds, k, preferred_element_type=jnp.float32
        ).astype(dq_ref.dtype))
        dks.append(jnp.dot(
            ds.T, q, preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype))
    cat = (lambda xs: xs[0] if hpb == 1
           else jnp.concatenate(xs, axis=-1))
    dq_ref[0] = cat(dqs)
    dk_ref[0] = cat(dks)
    dv_ref[0] = cat(dvs)


_HPB_OVERRIDE: Optional[int] = None


def set_hpb_override(value: Optional[int]) -> None:
    """Force the head-group size (bench knob; None = auto-minimal)."""
    global _HPB_OVERRIDE
    _HPB_OVERRIDE = value


_VMEM_BUDGET = 15 * 1024 * 1024  # 16 MB scoped VMEM limit minus margin


def _heads_per_block(dh: int, dhv: int, n_heads: int,
                     lq: int = 0, lk: int = 0, itemsize: int = 2) -> int:
    """LARGEST Mosaic-legal head-group size that fits the VMEM budget.

    The last block dim must be a multiple of 128 lanes (or the full array
    width), so hpb*dh and hpb*dhv must be multiples of 128. Bigger groups
    amortize per-grid-cell overhead: at the flagship config hpb=8 (one
    cell per batch row) measured 121.6 ms/step vs 125.2 at the minimal
    hpb=2 (benchmarks/hpb_ab.json, r3).

    The VMEM model covers the WORST-CASE (bwd) cell so fwd and bwd pick
    the same group size: 7 [L, hpb*D] blocks (q/k/v/g in, dq/dk/dv out)
    at the array dtype's `itemsize`, double-buffered by the pipeline,
    plus ~2 f32 [LQ, LK] score transients PER UNROLLED HEAD (Mosaic does
    not reuse stack across the static per-head loop). Calibrated against
    a measured Mosaic stack allocation: flagship fp32 at hpb=8 needs
    16.18 MB on-chip (model says 17.9) and fails the 16 MB scoped limit,
    while bf16 at hpb=8 lowers green (model 12.9) — so fp32 must drop to
    hpb=4 and bf16 must stay at 8.
    """
    def legal(hpb):
        return (n_heads % hpb == 0 and (hpb * dh) % 128 == 0
                and (hpb * dhv) % 128 == 0)

    def fits(hpb):
        if not lq or not lk:
            return True
        blocks = 2 * itemsize * hpb * (2 * lq * dh + 2 * lk * dh
                                       + 2 * lk * dhv + lq * dhv)
        transients = hpb * 2 * lq * lk * 4
        return blocks + transients < _VMEM_BUDGET

    if _HPB_OVERRIDE is not None and legal(_HPB_OVERRIDE):
        return _HPB_OVERRIDE
    for hpb in range(n_heads, 0, -1):
        if legal(hpb) and fits(hpb):
            return hpb
    return n_heads


def _io_specs(B, H, hpb, LQP, LKP, DP, DPV):
    """Blocks over the model-native [B, L, H*Dh] layout.

    Each (b, hg) grid cell reads a [LQP, hpb*DP] column slice (lane group
    hg) directly out of the projection output — no
    [B, L, H, Dh] -> [B, H, L, Dh] transpose ever materializes (those
    transposes cost several ms/step of copy/slice work at the flagship
    config). Sublane = L as before; lane = hpb*Dh, sized by
    _heads_per_block to satisfy hardware Mosaic's 128-lane block rule.
    """
    seed_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    # bias is [B, 1, LKP]; the singleton axis keeps the trailing two block
    # dims equal to the array dims (Mosaic tiling requirement)
    bias_spec = pl.BlockSpec((1, 1, LKP), lambda b, h: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((1, LQP, hpb * DP), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, LKP, hpb * DP), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, LKP, hpb * DPV), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec((1, LQP, hpb * DPV), lambda b, h: (b, 0, h),
                          memory_space=pltpu.VMEM)
    return seed_spec, bias_spec, q_spec, k_spec, v_spec, o_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_core(q, k, v, bias, seed, thresh24, num_heads, interpret):
    """q [B,LQP,H*DP] (pre-scaled), k/v [B,LKP,H*DP], bias [B,1,LKP] f32,
    seed int32[2]."""
    return _flash_core_fwd(q, k, v, bias, seed, thresh24, num_heads,
                           interpret)[0]


def _flash_core_fwd(q, k, v, bias, seed, thresh24, num_heads, interpret):
    H = num_heads
    B, LQP, _ = q.shape
    DP = q.shape[2] // H
    LKP = k.shape[1]
    DPV = v.shape[2] // H
    hpb = _heads_per_block(DP, DPV, H, LQP, LKP, q.dtype.itemsize)
    seed_spec, bias_spec, q_spec, k_spec, v_spec, o_spec = _io_specs(
        B, H, hpb, LQP, LKP, DP, DPV)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, thresh24=thresh24, num_heads=H,
                          hpb=hpb, hw_rng=not interpret),
        grid=(B, H // hpb),
        in_specs=[seed_spec, bias_spec, q_spec, k_spec, v_spec],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((B, LQP, H * DPV), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * LQP * LKP * (2 * DP),
            bytes_accessed=q.size * q.dtype.itemsize * 2
            + 2 * k.size * k.dtype.itemsize + bias.size * 4,
            transcendentals=B * H * LQP * LKP,
        ),
        interpret=interpret,
    )(seed, bias, q, k, v)
    return out, (q, k, v, bias, seed)


def _flash_core_bwd(thresh24, num_heads, interpret, res, g):
    q, k, v, bias, seed = res
    H = num_heads
    B, LQP, _ = q.shape
    DP = q.shape[2] // H
    LKP = k.shape[1]
    DPV = v.shape[2] // H
    hpb = _heads_per_block(DP, DPV, H, LQP, LKP, q.dtype.itemsize)
    seed_spec, bias_spec, q_spec, k_spec, v_spec, o_spec = _io_specs(
        B, H, hpb, LQP, LKP, DP, DPV)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, thresh24=thresh24, num_heads=H,
                          hpb=hpb, hw_rng=not interpret),
        grid=(B, H // hpb),
        in_specs=[seed_spec, bias_spec, q_spec, k_spec, v_spec, o_spec],
        out_specs=[q_spec, k_spec, v_spec],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * B * H * LQP * LKP * (2 * DP),
            bytes_accessed=2 * q.size * q.dtype.itemsize
            + 4 * k.size * k.dtype.itemsize + bias.size * 4,
            transcendentals=B * H * LQP * LKP,
        ),
        interpret=interpret,
    )(seed, bias, q, k, v, g)
    return (dq, dk, dv, jnp.zeros_like(bias),
            np.zeros(seed.shape, dtype=jax.dtypes.float0))


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    *,
    scale: Optional[float] = None,
    dropout_rate: float = 0.0,
    dropout_key: Optional[jax.Array] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused multi-head attention.

    Args:
      q: [B, Lq, H, Dh] queries (model layout, as produced by the qkv
        DenseGeneral projections in models/layers.py).
      k, v: [B, Lk, H, Dh] keys/values.
      key_mask: [B, Lk] bool, True = valid key (torch key_padding_mask
        semantics, inverted). None = all valid.
      scale: score scale; default 1/sqrt(Dh).
      dropout_rate: probability-dropout rate on the attention matrix.
      dropout_key: PRNG key; required when dropout_rate > 0.
      interpret: run the kernel in the Pallas interpreter (CPU tests);
        default: True unless running on TPU.

    Returns: [B, Lq, H, Dh] in q.dtype.
    """
    B, LQ, H, DH = q.shape
    LK = k.shape[1]
    DV = v.shape[3]
    if scale is None:
        scale = 1.0 / (DH ** 0.5)
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

    # No length/depth padding: every block spans the full (L, Dh) extent of
    # its (b, h) cell, and Mosaic accepts any block dim equal to the array
    # dim (internal lane/sublane padding is handled by the compiler). This
    # keeps HBM traffic at exactly the tensor sizes — an earlier version
    # padded Dh 64->128 and L 350->384 and spent ~26 ms/step on pad/slice
    # copies plus 2x matmul FLOPs at the flagship config.
    if key_mask is None:
        valid = jnp.ones((B, LK), bool)
    else:
        valid = key_mask
    # exp2 mode: the bias carries the log2e factor too (scores live in
    # log2 space in-kernel; see _exp2_rows)
    neg = _NEG_BIG * _LOG2E if _USE_EXP2 else _NEG_BIG
    bias = jnp.where(valid, 0.0, neg).astype(jnp.float32)[:, None, :]

    # fold score scale (and, in exp2 mode, log2e) into q host-side
    # ([Lq, Dh] elements instead of [Lq, Lk] passes in-kernel); the
    # multiply runs in f32 so the combined constant isn't itself rounded
    # to bf16 before it scales q. autodiff rescales dq through this.
    qmul = scale * _LOG2E if _USE_EXP2 else scale
    q_scaled = (q.astype(jnp.float32) * qmul).astype(q.dtype)
    # [B, L, H, Dh] -> [B, L, H*Dh] is a free reshape of contiguous memory;
    # the kernel block-indexes heads on the lane axis (see _io_specs)
    out = _flash_core(q_scaled.reshape(B, LQ, H * DH),
                      k.reshape(B, LK, H * DH), v.reshape(B, LK, H * DV),
                      bias, seed, thresh24, H, bool(interpret))
    return out.reshape(B, LQ, H, DV)
