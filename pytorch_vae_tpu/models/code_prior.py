"""Autoregressive prior over RVQ code indices for unconditional sampling.

The reference framework has no learned prior over stage-2 codes: its
`VQVAE.sample` draws each level's index uniformly (models/vq_vae.py
rebuild of reference vqvae.py sample()), which we measured keeps 1.2% of
curves at 2x256 capacity and 0% at 4x1024 (results/mixstats_r3/
vqsample_*.json) — residual levels are *conditioned* on earlier levels,
so independent uniform draws land far off-manifold and AE-OT was the
only viable generation path. This module closes that capability gap the
standard way (van den Oord et al., VQ-VAE/VQ-VAE-2): fit a small causal
transformer LM to the token-major code sequences exported by
scripts/extract_code_indices.py, then sample codes autoregressively and
decode them with the frozen stage-2 decoder.

Sequence layout: one curve = [M*Q] global flat indices, token-major
(token m's Q residual levels are adjacent), exactly the on-disk layout
of extract_code_indices.py. The level of position t is static
(q = t % Q), so a single [Q*K] embedding table plus a K-way output head
masked per-level is enough; no per-level towers.

Conditioning: curve length enters as a learned length-bucket embedding
at the BOS position (generation must pick a length before decoding —
run_aeot_end2end draws it from the bank; here we draw from the training
length histogram saved alongside the weights).

TPU notes: T = M*Q <= 128 at every shipped config, so attention is a
plain einsum with an additive causal bias — materialising the [B,H,T,T]
probabilities is a few hundred KB and XLA fuses the whole block; the
flash kernel's VMEM streaming buys nothing at this length (measured
negative at L<=96 for the flagship's cross-attn, CLAUDE.md flash_min_kv
note). Sampling recomputes the full forward per step under lax.scan on
a fixed-length buffer: static shapes, no KV-cache bookkeeping, and
128 * (128-token tiny forward) is microseconds on the MXU.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["CodePrior", "code_prior_loss", "sample_codes", "length_bucket"]


def length_bucket(length, n_buckets: int, min_len: int, max_len: int):
    """Map a curve length to a conditioning bucket id (clipped, static)."""
    span = max(1, max_len - min_len)
    frac = (jnp.asarray(length, jnp.float32) - min_len) / span
    b = jnp.floor(frac * n_buckets).astype(jnp.int32)
    return jnp.clip(b, 0, n_buckets - 1)


class _CausalBlock(nn.Module):
    """Pre-LN causal self-attention + GELU FFN (einsum path; T<=128)."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B, T, E = x.shape
        H = self.num_heads
        hd = E // H
        assert hd * H == E, "dim must divide num_heads"

        h = nn.LayerNorm(name="ln1")(x)
        qkv = nn.DenseGeneral((3, H, hd), dtype=self.dtype, name="qkv")(h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        causal = jnp.tril(jnp.ones((T, T), bool))
        logits = jnp.where(causal[None, None], logits, -1e30)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        probs = nn.Dropout(self.dropout, deterministic=deterministic)(
            probs).astype(self.dtype)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        x = x + nn.DenseGeneral(E, axis=(-2, -1), dtype=self.dtype,
                                name="out")(attn)

        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(4 * E, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        x = x + nn.Dense(E, dtype=self.dtype, name="fc2")(h)
        return x


class CodePrior(nn.Module):
    """Causal LM over token-major RVQ index sequences.

    Inputs are GLOBAL flat indices in [0, num_q*k_per). Position t's
    level is static (q = t % num_q), so the output head is K-way over
    that level's codes only — cross-level probability leakage is
    impossible by construction and sampled indices are always legal.
    """

    n_tokens: int          # M latent tokens per curve
    num_q: int             # Q residual levels
    k_per: int             # K codes per level
    d_model: int = 256
    n_layers: int = 4
    n_heads: int = 4
    dropout: float = 0.1
    n_len_buckets: int = 16
    min_len: int = 32
    max_len: int = 96
    dtype: Any = jnp.float32

    @property
    def seq_len(self) -> int:
        return self.n_tokens * self.num_q

    @nn.compact
    def __call__(self, codes, lengths, *, deterministic: bool = True):
        """codes [B, T] global flat int32, lengths [B] -> logits [B, T, K].

        logits[:, t] predicts codes[:, t] given codes[:, :t] and the
        length bucket (teacher forcing: the input at t is codes[:, t-1],
        and the BOS slot carries the length embedding).
        """
        B, T = codes.shape
        assert T == self.seq_len, (T, self.seq_len)
        K, Q = self.k_per, self.num_q

        tok_emb = nn.Embed(Q * K, self.d_model, dtype=self.dtype,
                           name="tok_emb")
        len_emb = nn.Embed(self.n_len_buckets, self.d_model,
                           dtype=self.dtype, name="len_emb")
        pos_emb = self.param(
            "pos_emb", nn.initializers.normal(0.02), (T, self.d_model))
        lvl_emb = self.param(
            "lvl_emb", nn.initializers.normal(0.02), (Q, self.d_model))

        bos = len_emb(length_bucket(lengths, self.n_len_buckets,
                                    self.min_len, self.max_len))
        shifted = tok_emb(codes[:, :-1])
        x = jnp.concatenate([bos[:, None], shifted], axis=1)
        # static host-side index pattern: params may arrive as plain
        # numpy (scripts/sample_code_prior.py loads the .npz artifact)
        # and numpy arrays can't be indexed by tracers
        levels = np.arange(T) % Q
        x = x + jnp.asarray(pos_emb)[None] + jnp.asarray(lvl_emb)[levels][None]
        x = x.astype(self.dtype)

        for i in range(self.n_layers):
            x = _CausalBlock(self.d_model, self.n_heads, self.dropout,
                             self.dtype, name=f"block{i}")(
                                 x, deterministic=deterministic)
        x = nn.LayerNorm(name="ln_f")(x)
        logits = nn.Dense(K, dtype=jnp.float32, name="head")(x)
        return logits.astype(jnp.float32)


def code_prior_loss(model: CodePrior, params, codes, lengths, *,
                    rngs: Optional[Dict[str, jax.Array]] = None,
                    deterministic: bool = True) -> Tuple[jnp.ndarray, Dict]:
    """Mean cross-entropy (nats/position) of global-flat code targets."""
    logits = model.apply(params, codes, lengths,
                         deterministic=deterministic, rngs=rngs or {})
    per_level = codes % model.k_per  # target within the position's level
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, per_level[..., None], axis=-1)[..., 0]
    loss = jnp.mean(nll)
    acc = jnp.mean(jnp.argmax(logits, -1) == per_level)
    return loss, {"loss": loss, "acc": acc,
                  "ppl_per_pos": jnp.exp(loss)}


def sample_codes(model: CodePrior, params, key, lengths, *,
                 temperature: float = 1.0, top_k: int = 0,
                 top_p: float = 0.0) -> jnp.ndarray:
    """Autoregressively sample [B, T] GLOBAL flat indices for `lengths`.

    Full-forward-per-step under lax.scan on a fixed [B, T] buffer:
    static shapes for XLA, no cache state. top_k=0 disables truncation;
    top_p in (0,1) enables nucleus truncation (smallest prefix of the
    descending-prob vocab whose mass reaches top_p; the argmax token is
    always kept). Both filters compose (top_k first, as in HF).
    """
    B = lengths.shape[0]
    T = model.seq_len
    K, Q = model.k_per, model.num_q

    def step(carry, t):
        codes, key = carry
        key, sub = jax.random.split(key)
        logits = model.apply(params, codes, lengths,
                             deterministic=True)[:, t]  # [B, K]
        logits = logits / jnp.maximum(temperature, 1e-6)
        if top_k and top_k < K:
            kth = jnp.sort(logits, axis=-1)[:, -top_k][:, None]
            logits = jnp.where(logits < kth, -1e30, logits)
        if 0.0 < top_p < 1.0:
            # nucleus: drop tokens outside the minimal top-p mass set.
            # Static shapes: full sort + scatter of a keep mask.
            order = jnp.argsort(-logits, axis=-1)               # desc
            sorted_logits = jnp.take_along_axis(logits, order, -1)
            probs = jax.nn.softmax(sorted_logits, axis=-1)
            cum = jnp.cumsum(probs, axis=-1)
            keep_sorted = (cum - probs) < top_p  # first always True
            keep = jnp.zeros_like(keep_sorted).at[
                jnp.arange(B)[:, None], order].set(keep_sorted)
            logits = jnp.where(keep, logits, -1e30)
        draw = jax.random.categorical(sub, logits)          # [B] in [0,K)
        flat = draw.astype(jnp.int32) + (t % Q) * K         # global flat
        codes = jax.lax.dynamic_update_slice_in_dim(
            codes, flat[:, None], t, axis=1)
        return (codes, key), None

    init = jnp.zeros((B, T), jnp.int32)
    (codes, _), _ = jax.lax.scan(step, (init, key), jnp.arange(T))
    return codes
