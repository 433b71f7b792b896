"""EMA vector quantizer — single-level and residual (RVQ) in one module.

Functional re-design of the reference's `VectorQuantizerEMA`
(models/vq_vae.py:19-283). All mutable buffers (codebook, EMA stats, epoch
diagnostics) live in explicit pytrees threaded through the train step, so the
quantizer is pure and jit/pjit-safe:

  - nearest-code search runs through the fused Pallas kernel
    (ops/vq_pallas.py) on TPU,
  - EMA cluster statistics are computed as *global* sums — under pjit/GSPMD
    the batch is sharded on the data axis and XLA inserts the cross-replica
    reduction, so every replica keeps an identical codebook. (The reference
    never synchronizes EMA buffers across DDP replicas — a known quirk,
    SURVEY.md §2.2 — this build does the correct thing.)
  - dead-code reinit (models/vq_vae.py:91-107) is branchless: random batch
    rows replace dead codes under a jnp.where gated by the step predicate,
  - the residual loop preserves the reference's *sequential* semantics:
    each level's EMA update decays the full EMA buffers and refreshes the
    whole codebook before the next level quantizes its residual
    (models/vq_vae.py:85-89 run once per level),
  - RVQ flat indices keep the reference's level-major [Q*N] layout with
    global index = idx + level*K_per (models/vq_vae.py:246,260).

Epoch diagnostics (usage histogram, perplexity, dead ratio, QE mean/p90,
top1-top2 margin) are carried in `VQEpochStats`. The reference allocates the
margin/QE buffers but never fills them (models/vq_vae.py:56-62); here they
are populated from the kernel's top-2 distances.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ..ops.vq_pallas import nearest_codes


class VQState(struct.PyTreeNode):
    """Codebook + EMA buffers (reference buffers at models/vq_vae.py:50-53)."""

    embedding: jnp.ndarray         # [K, D]
    ema_cluster_size: jnp.ndarray  # [K]
    ema_embedding: jnp.ndarray     # [K, D]


class VQEpochStats(struct.PyTreeNode):
    """Per-epoch codebook diagnostics (reference: models/vq_vae.py:55-62)."""

    usage: jnp.ndarray      # [K]
    count: jnp.ndarray      # scalar: number of quantized positions
    top1_sum: jnp.ndarray   # scalar: sum of nearest distances
    top2_sum: jnp.ndarray   # scalar: sum of runner-up distances
    qe_sum: jnp.ndarray     # scalar: sum of quantization errors (== top1)
    qe_hist: jnp.ndarray    # [bins]


class VQConfig(struct.PyTreeNode):
    """Static quantizer configuration (pytree_node=False fields)."""

    num_quantizers: int = struct.field(pytree_node=False, default=1)
    codes_per_level: int = struct.field(pytree_node=False, default=512)
    code_dim: int = struct.field(pytree_node=False, default=128)
    eps: float = struct.field(pytree_node=False, default=1e-5)
    reinit_dead_codes: bool = struct.field(pytree_node=False, default=True)
    reinit_prob: float = struct.field(pytree_node=False, default=1.0)
    dead_usage_threshold: int = struct.field(pytree_node=False, default=0)
    diag_qe_cap: float = struct.field(pytree_node=False, default=10.0)
    diag_qe_bins: int = struct.field(pytree_node=False, default=64)

    @property
    def total_codes(self) -> int:
        return self.num_quantizers * self.codes_per_level


def init_vq_state(key: jax.Array, cfg: VQConfig) -> VQState:
    """Random-normal codebook scaled by 1/sqrt(D) (models/vq_vae.py:50)."""
    K, D = cfg.total_codes, cfg.code_dim
    emb = jax.random.normal(key, (K, D), jnp.float32) / math.sqrt(D)
    return VQState(
        embedding=emb,
        ema_cluster_size=jnp.zeros((K,), jnp.float32),
        ema_embedding=jnp.zeros((K, D), jnp.float32),
    )


def init_epoch_stats(cfg: VQConfig) -> VQEpochStats:
    # NOTE: each field gets its OWN zero buffer — sharing one jnp.zeros(())
    # across fields makes jit buffer donation reject the state
    # ("donate the same buffer twice").
    def z():
        return jnp.zeros((), jnp.float32)

    return VQEpochStats(
        usage=jnp.zeros((cfg.total_codes,), jnp.float32),
        count=z(), top1_sum=z(), top2_sum=z(), qe_sum=z(),
        qe_hist=jnp.zeros((cfg.diag_qe_bins,), jnp.float32),
    )


def init_state_from_centroids(
    centroids: jnp.ndarray, cfg: VQConfig
) -> VQState:
    """Codebook init from kmeans centroids, [K, D] or [L, K_per, D].

    Also seeds the EMA buffers (embedding copy, cluster size = 1), matching
    `init_codebook_from_centroids` (models/vq_vae.py:576-613).
    """
    C = jnp.asarray(centroids, jnp.float32)
    if C.ndim == 3:
        L, K_per, D = C.shape
        if D != cfg.code_dim:
            raise ValueError(
                f"Centroid D mismatch: expected {cfg.code_dim}, got {D}")
        if L * K_per != cfg.total_codes:
            raise ValueError(
                f"Centroid K mismatch: expected {cfg.total_codes}, "
                f"got {L * K_per}")
        C = C.reshape(-1, D)
    elif C.ndim == 2:
        if C.shape != (cfg.total_codes, cfg.code_dim):
            raise ValueError(
                f"Centroid shape mismatch: expected "
                f"{(cfg.total_codes, cfg.code_dim)}, got {tuple(C.shape)}")
    else:
        raise ValueError(f"Unsupported centroid shape: {tuple(C.shape)}")
    return VQState(
        embedding=C,
        ema_cluster_size=jnp.ones((cfg.total_codes,), jnp.float32),
        ema_embedding=C + 0.0,  # distinct buffer: donation-safe
    )


def _ema_step(
    state: VQState,
    flat: jnp.ndarray,
    global_idx: jnp.ndarray,
    valid_w: Optional[jnp.ndarray],
    decay: jnp.ndarray,
    eps: float,
    K: int,
) -> VQState:
    """One EMA update over the FULL buffer set (models/vq_vae.py:77-89).

    flat [N, D], global_idx [N] into the full codebook. valid_w [N] or None
    weights rows (masked positions contribute zero). Sums here are global
    batch sums; under pjit XLA reduces them across the data axis.
    """
    flat = jax.lax.stop_gradient(flat.astype(jnp.float32))
    if valid_w is None:
        ones = jnp.ones(flat.shape[:1], jnp.float32)
        wflat = flat
    else:
        ones = valid_w.astype(jnp.float32)
        wflat = flat * ones[:, None]
    cluster_size = jnp.zeros((K,), jnp.float32).at[global_idx].add(ones)
    embed_sum = jnp.zeros((K, flat.shape[1]), jnp.float32).at[global_idx].add(
        wflat
    )
    new_cs = state.ema_cluster_size * decay + cluster_size * (1.0 - decay)
    new_ee = state.ema_embedding * decay + embed_sum * (1.0 - decay)
    new_emb = new_ee / (new_cs[:, None] + eps)
    return VQState(embedding=new_emb, ema_cluster_size=new_cs,
                   ema_embedding=new_ee)


def _where_state(pred: jnp.ndarray, a: VQState, b: VQState) -> VQState:
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def _perplexity_dead(usage: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Codebook perplexity and dead ratio from a usage histogram.

    (reference: models/vq_vae.py:208-217)
    """
    total = jnp.clip(jnp.sum(usage), 1.0, None)
    probs = usage / total
    plogp = jnp.where(probs > 0, probs * jnp.log(jnp.clip(probs, 1e-12, None)),
                      0.0)
    ppl = jnp.exp(-jnp.sum(plogp))
    dead = jnp.mean((usage == 0).astype(jnp.float32))
    return ppl, dead


def quantize_ema(
    state: VQState,
    z_e: jnp.ndarray,
    cfg: VQConfig,
    *,
    train: bool,
    do_ema_update: jnp.ndarray,
    decay: jnp.ndarray,
    epoch_stats: Optional[VQEpochStats] = None,
    mask: Optional[jnp.ndarray] = None,
    use_pallas: Optional[bool] = None,
):
    """Quantize z_e [B, M, D]; returns (out, new_state, new_epoch_stats).

    out = (z_q_st, z_q_raw, indices, stats[2]) mirroring the reference's
    forward return (models/vq_vae.py:170-282): straight-through z_q, raw
    codebook z_q, indices ([B, M] single-level; flat level-major [Q*B*M] for
    RVQ), and stacked (perplexity, dead_ratio).

    `do_ema_update` and `decay` are dynamic scalars (step-dependent schedules
    live in the train state, SURVEY.md §2.3). `train` is static.
    """
    B, M, D = z_e.shape
    K = cfg.total_codes
    K_per = cfg.codes_per_level
    flat = z_e.reshape(-1, D).astype(jnp.float32)
    N = B * M
    valid = mask.reshape(-1) if mask is not None else None

    do_upd = jnp.asarray(do_ema_update) & jnp.asarray(train)

    if cfg.num_quantizers == 1:
        idx, d1, d2 = nearest_codes(jax.lax.stop_gradient(flat),
                                    state.embedding, use_pallas)
        z_q = jnp.take(state.embedding, idx, axis=0).reshape(B, M, D)
        z_q = z_q.astype(z_e.dtype)

        if train:
            upd = _ema_step(state, flat, idx, valid, decay, cfg.eps, K)
            new_state = _where_state(do_upd, upd, state)
        else:
            new_state = state

        z_q_st = z_e + jax.lax.stop_gradient(z_q - z_e)
        ones = (valid.astype(jnp.float32) if valid is not None
                else jnp.ones((N,), jnp.float32))
        usage_inst = jnp.zeros((K,), jnp.float32).at[idx].add(ones)
        ppl, dead = _perplexity_dead(usage_inst)
        indices_out = idx.reshape(B, M)
        all_d1, all_d2 = d1, d2
        n_positions = jnp.asarray(float(N), jnp.float32)
    else:
        residual = flat
        cur = state
        all_idx, all_zq, d1s, d2s = [], [], [], []
        for level in range(cfg.num_quantizers):
            start = level * K_per
            emb_l = cur.embedding[start : start + K_per]
            idx_l, d1_l, d2_l = nearest_codes(
                jax.lax.stop_gradient(residual), emb_l, use_pallas)
            gidx_l = idx_l + start
            zq_l = jnp.take(emb_l, idx_l, axis=0)
            all_idx.append(gidx_l)
            all_zq.append(zq_l)
            d1s.append(d1_l)
            d2s.append(d2_l)
            if train:
                # sequential per-level EMA over the FULL buffers, codebook
                # refreshed before the next level (models/vq_vae.py:233-258)
                upd = _ema_step(cur, residual, gidx_l, valid, decay,
                                cfg.eps, K)
                cur = _where_state(do_upd, upd, cur)
            residual = residual - jax.lax.stop_gradient(zq_l)
        new_state = cur
        indices_out = jnp.concatenate(all_idx, axis=0)  # [Q*N] level-major
        z_q = sum(all_zq).reshape(B, M, D).astype(z_e.dtype)
        z_q_st = z_e + jax.lax.stop_gradient(z_q - z_e)
        usage_inst = jnp.zeros((K,), jnp.float32).at[indices_out].add(1.0)
        ppl, dead = _perplexity_dead(usage_inst)
        all_d1 = jnp.concatenate(d1s)
        all_d2 = jnp.concatenate(d2s)
        n_positions = jnp.asarray(float(N * cfg.num_quantizers), jnp.float32)

    stats = jnp.stack([ppl, dead])

    new_epoch_stats = None
    if epoch_stats is not None:
        qe = jnp.sum(all_d1)
        hist_idx = jnp.clip(
            (all_d1 / (cfg.diag_qe_cap / cfg.diag_qe_bins)).astype(jnp.int32),
            0, cfg.diag_qe_bins - 1,
        )
        new_epoch_stats = VQEpochStats(
            usage=epoch_stats.usage + usage_inst,
            count=epoch_stats.count + n_positions,
            top1_sum=epoch_stats.top1_sum + qe,
            top2_sum=epoch_stats.top2_sum + jnp.sum(all_d2),
            qe_sum=epoch_stats.qe_sum + qe,
            qe_hist=epoch_stats.qe_hist.at[hist_idx].add(1.0),
        )

    return (z_q_st, z_q, indices_out, stats), new_state, new_epoch_stats


def maybe_reinit_dead_codes(
    state: VQState,
    flat: jnp.ndarray,
    usage: jnp.ndarray,
    cfg: VQConfig,
    key: jax.Array,
    do_reinit: jnp.ndarray,
) -> VQState:
    """Replace dead codes with random batch vectors, branchlessly.

    (reference: _maybe_reinit_dead_codes, models/vq_vae.py:91-107 — global
    coin flip with prob reinit_prob, random rows with replacement, EMA
    cluster size reset to 1)
    """
    if not cfg.reinit_dead_codes or cfg.reinit_prob <= 0.0:
        return state
    K = cfg.total_codes
    flat = jax.lax.stop_gradient(flat.astype(jnp.float32))
    k_coin, k_rows = jax.random.split(key)
    coin = jax.random.uniform(k_coin, ()) <= cfg.reinit_prob
    dead = usage <= float(cfg.dead_usage_threshold)
    rand_idx = jax.random.randint(k_rows, (K,), 0, flat.shape[0])
    new_vecs = jnp.take(flat, rand_idx, axis=0)  # [K, D]
    gate = (dead & coin & jnp.asarray(do_reinit))[:, None]
    gate1 = gate[:, 0]
    return VQState(
        embedding=jnp.where(gate, new_vecs, state.embedding),
        ema_embedding=jnp.where(gate, new_vecs, state.ema_embedding),
        ema_cluster_size=jnp.where(gate1, 1.0, state.ema_cluster_size),
    )


def epoch_stats_summary(stats: VQEpochStats, cfg: VQConfig) -> dict:
    """Host-side summary matching `get_epoch_stats` (models/vq_vae.py:118-164).

    Unlike the reference, margin/qe fields carry real values (the fused
    kernel emits top-2 distances).
    """
    import numpy as np

    usage = np.asarray(stats.usage)
    cnt = float(stats.count)
    if cnt <= 0:
        return {"usage_hist": usage, "margin_mean": 0.0, "qe_mean": 0.0,
                "qe_p90": 0.0, "n_positions": 0, "perplexity": 0.0,
                "dead_ratio": 0.0}
    margin_mean = float((stats.top2_sum - stats.top1_sum) / cnt)
    qe_mean = float(stats.qe_sum / cnt)
    total = float(usage.sum())
    if total > 0:
        p = np.clip(usage / max(total, 1e-12), 1e-12, None)
        perplexity = float(np.exp(-(p * np.log(p)).sum()))
        dead_ratio = float((usage == 0).mean())
    else:
        perplexity, dead_ratio = 0.0, 0.0
    qe_p90 = 0.0
    hist = np.asarray(stats.qe_hist)
    th = float(hist.sum())
    if th > 0:
        cdf = np.cumsum(hist) / max(th, 1e-12)
        idx = int(np.argmax(cdf >= 0.9)) if (cdf >= 0.9).any() \
            else cfg.diag_qe_bins - 1
        bin_w = cfg.diag_qe_cap / max(cfg.diag_qe_bins, 1)
        qe_p90 = (idx + 0.5) * bin_w
    return {
        "usage_hist": usage,
        "margin_mean": margin_mean,
        "qe_mean": qe_mean,
        "qe_p90": float(qe_p90),
        "n_positions": int(cnt),
        "perplexity": perplexity,
        "dead_ratio": dead_ratio,
    }
