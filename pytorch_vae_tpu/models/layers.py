"""Transformer building blocks for the curve VQ-VAE (flax.linen).

Semantics mirror the PyTorch modules the reference composes
(models/vq_vae.py:455-533):

  - pre-LN ("norm_first") encoder/decoder blocks with ReLU FFNs of width
    `ffn_dim` (PyTorch's TransformerEncoderLayer default dim_feedforward is
    a fixed 2048 — NOT 4*d_model — and the reference never overrides it),
  - key-padding masks (True = valid here; inverted vs PyTorch),
  - attention-probability and residual dropout at the same sites,
  - sinusoidal positional encodings (models/vq_vae.py:478-483).

TPU-first details:
  - attention is written as explicit einsums with softmax in float32 so the
    whole block compiles to MXU matmuls + fused VPU epilogues,
  - every big kernel carries flax logical-partitioning metadata
    ("embed"/"heads"/"mlp" axes) so the same module runs replicated on one
    chip or tensor-parallel over a "model" mesh axis via
    parallel/sharding.py rules — XLA inserts the collectives,
  - masks are additive float biases built once per layer stack.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype

_MASK_BIAS = -1e30

# Flatten transformer-block Dense ops to 2-D [B*L, E] matmuls. XLA:TPU
# lowers >2-D dots through its convolution machinery, whose fusions
# prefer batch-minor ({0,2,1}) layouts — every pallas_call edge then pays
# a layout-conversion copy (r3 profile: ~10.4 ms/step, one 0.148 ms copy
# per kernel output, already at copy roofline). MEASURED (r3 TPU A/B):
# flattening ALL block denses to 2-D kills the copies but loses 45 ms
# (170.2 vs 125.6 ms) — the conv-form fusions are that much faster than
# plain 2-D matmuls, so the copies are cheap rent. Modes kept for
# regression benching: "off" (default), "all", "out_proj" (only the
# kernel-output consumer).
_DENSE2D: str = "off"


def set_dense2d(value) -> None:
    global _DENSE2D
    if value is True:
        value = "all"
    if value is False:
        value = "off"
    assert value in ("off", "all", "out_proj"), value
    _DENSE2D = value


def dense2d_enabled(site: str = "all") -> bool:
    if _DENSE2D == "off":
        return False
    if _DENSE2D == "all":
        return True
    return site == _DENSE2D


def sinusoidal_pos_enc(max_len: int, dim: int,
                       dtype: Dtype = jnp.float32) -> jnp.ndarray:
    """[1, max_len, dim] sin/cos table (models/vq_vae.py:478-483)."""
    pos = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / dim)
    )
    pe = jnp.zeros((max_len, dim), jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe[None].astype(dtype)


def key_padding_bias(mask: Optional[jnp.ndarray],
                     dtype: Dtype = jnp.float32) -> Optional[jnp.ndarray]:
    """[B, L] bool (True=valid) -> [B, 1, 1, L] additive attention bias."""
    if mask is None:
        return None
    return jnp.where(mask[:, None, None, :], 0.0, _MASK_BIAS).astype(dtype)


class CheapDropout(nn.Module):
    """Dropout from uint8 random bits (4x less RNG traffic than bernoulli).

    Attention-probability dropout masks dominate the flagship train step
    (measured 9.1 -> 6.9 ms per attention fwd+bwd with this form). The
    keep-threshold quantizes the rate to 1/256 granularity; the survivor
    scale uses the ACTUAL rate so the estimator stays unbiased.
    """

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if deterministic or self.rate == 0.0:
            return x
        thresh = int(round(self.rate * 256.0))
        actual_rate = thresh / 256.0
        bits = jax.random.bits(self.make_rng("dropout"), x.shape,
                               dtype=jnp.uint8)
        keep = bits >= thresh
        scale = jnp.asarray(1.0 / (1.0 - actual_rate), x.dtype)
        return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))


class MultiHeadAttention(nn.Module):
    """Batched multi-head attention with key-padding masking.

    Equivalent to torch.nn.MultiheadAttention(batch_first=True) with
    key_padding_mask (inverted: True = valid here), including dropout on
    the attention probabilities.

    Two compute paths share the same parameters:
      - fused Pallas kernel (ops/flash_attention.py): softmax + in-kernel
        prob-dropout + PV in VMEM, custom VJP — the TPU default,
      - explicit einsums with a materialized [B, H, Lq, Lk] probability
        tensor + CheapDropout — the CPU/fallback path.
    use_flash=None defers to ops.flash_attention.flash_enabled().
    The two paths draw different dropout masks from the same "dropout"
    RNG stream (both unbiased); outputs are identical when dropout is off.
    """

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    use_flash: Optional[bool] = None
    use_fused: Optional[bool] = None  # fused QKV block; opt-in, see below

    @nn.compact
    def __call__(self, q, k, v, key_mask=None, deterministic: bool = True):
        head_dim = self.dim // self.num_heads
        assert head_dim * self.num_heads == self.dim

        def proj(name):
            return nn.DenseGeneral(
                features=(self.num_heads, head_dim),
                dtype=self.dtype,
                kernel_init=nn.with_logical_partitioning(
                    nn.initializers.xavier_uniform(), ("embed", "heads", "kv")
                ),
                bias_init=nn.with_logical_partitioning(
                    nn.initializers.zeros_init(), ("heads", "kv")
                ),
                name=name,
            )

        out_mod = nn.DenseGeneral(
            features=self.dim,
            axis=(-2, -1),
            dtype=self.dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.xavier_uniform(), ("heads", "kv", "embed")
            ),
            bias_init=nn.with_logical_partitioning(
                nn.initializers.zeros_init(), ("embed",)
            ),
            name="out_proj",
        )
        q_mod, k_mod, v_mod = proj("q_proj"), proj("k_proj"), proj("v_proj")

        scale = 1.0 / math.sqrt(head_dim)
        use_flash = self.use_flash
        if use_flash is None:
            from pytorch_vae_tpu.ops.flash_attention import flash_enabled
            use_flash = flash_enabled()

        # Self-attention on one tensor can take the fully fused path: QKV
        # projection + attention + output projection in one Pallas kernel
        # (ops/fused_qkv_attention.py) — x read once, the four [B, L, E]
        # q/k/v/o intermediates never touch HBM. Parameters stay the
        # per-projection DenseGeneral modules (checkpoint/warm-start
        # layout unchanged); the kernel consumes them concatenated.
        # OPT-IN ONLY: measured ~4 ms/step slower than flash + XLA
        # projections at the flagship config (see the kernel docstring),
        # so the default dispatch keeps it off.
        use_fused = self.use_fused
        if use_fused is None:
            from pytorch_vae_tpu.ops.fused_qkv_attention import (
                fused_enabled,
            )
            use_fused = fused_enabled()
        if use_fused and q is k and k is v and q.shape[-1] == self.dim:
            from flax.core import meta as fmeta
            from pytorch_vae_tpu.ops.fused_qkv_attention import (
                fused_self_attention,
            )

            # create the params without paying for an unfused projection
            dummy = jnp.zeros((1, 1, self.dim), self.dtype)
            for m in (q_mod, k_mod, v_mod):
                m(dummy)
            out_mod(jnp.zeros((1, 1, self.num_heads, head_dim),
                              self.dtype))
            pv = self.variables["params"]

            def kern2d(name):
                w = fmeta.unbox(pv[name]["kernel"])
                return jnp.asarray(w, self.dtype).reshape(self.dim, -1)

            def bias1d(name):
                b = fmeta.unbox(pv[name]["bias"])
                return jnp.asarray(b, self.dtype).reshape(-1)

            wqkv = jnp.concatenate(
                [kern2d("q_proj"), kern2d("k_proj"), kern2d("v_proj")],
                axis=1)
            bqkv = jnp.concatenate(
                [bias1d("q_proj"), bias1d("k_proj"), bias1d("v_proj")])
            wo = fmeta.unbox(pv["out_proj"]["kernel"])
            wo = jnp.asarray(wo, self.dtype).reshape(self.dim, self.dim)
            bo = bias1d("out_proj")
            drop = 0.0 if deterministic else float(self.dropout)
            return fused_self_attention(
                q, wqkv, bqkv, wo, bo, key_mask=key_mask,
                num_heads=self.num_heads, scale=scale, dropout_rate=drop,
                dropout_key=(self.make_rng("dropout") if drop > 0.0
                             else None),
            )

        if dense2d_enabled("qkv"):
            # project on flattened [B*L, E] (see _DENSE2D note above)
            def p2(mod, x):
                y = mod(x.reshape(-1, x.shape[-1]))
                return y.reshape(x.shape[:-1] + y.shape[-2:])

            qh, kh, vh = p2(q_mod, q), p2(k_mod, k), p2(v_mod, v)
        else:
            qh = q_mod(q)  # [B, Lq, H, Dh]
            kh = k_mod(k)
            vh = v_mod(v)

        if use_flash:
            from pytorch_vae_tpu.ops.flash_attention import flash_min_kv
            if kh.shape[1] < flash_min_kv():
                use_flash = False  # short-memory: einsum beats the
                # pallas boundary copies (see flash_attention.flash_min_kv)
        if use_flash:
            from pytorch_vae_tpu.ops.flash_attention import flash_attention
            drop = 0.0 if deterministic else float(self.dropout)
            out = flash_attention(
                qh, kh, vh, key_mask=key_mask, scale=scale,
                dropout_rate=drop,
                dropout_key=(self.make_rng("dropout") if drop > 0.0
                             else None),
            )
        else:
            bias = key_padding_bias(key_mask, jnp.float32)
            scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
            if bias is not None:
                scores = scores + bias
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            probs = probs.astype(self.dtype)
            if self.dropout > 0.0:
                probs = CheapDropout(rate=self.dropout)(
                    probs, deterministic=deterministic
                )
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
        if dense2d_enabled("out_proj"):
            y = out_mod(out.reshape((-1,) + out.shape[-2:]))
            return y.reshape(out.shape[:-2] + (self.dim,))
        return out_mod(out)


class FeedForward(nn.Module):
    """linear -> act -> dropout -> linear, kernels sharded on the mlp axis.

    Two compute paths share the same parameters (cf. MultiHeadAttention):
      - fused Pallas kernel (ops/fused_ffn.py): both matmuls + activation
        + dropout in one kernel, the [N, hidden] intermediate never leaves
        VMEM — opt-in via use_fused / ops.fused_ffn.fused_ffn_enabled(),
      - two nn.Dense calls with CheapDropout — the default/fallback path.
    The two paths draw different dropout masks from the same "dropout"
    RNG stream (both unbiased); outputs match when dropout is off.
    """

    dim: int
    hidden: int
    dropout: float = 0.0
    activation: Callable = nn.relu
    dtype: Dtype = jnp.float32
    use_fused: Optional[bool] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        lead = x.shape[:-1]
        fc1 = nn.Dense(
            self.hidden,
            dtype=self.dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.xavier_uniform(), ("embed", "mlp")
            ),
            bias_init=nn.with_logical_partitioning(
                nn.initializers.zeros_init(), ("mlp",)
            ),
            name="fc1",
        )
        fc2 = nn.Dense(
            self.dim,
            dtype=self.dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.xavier_uniform(), ("mlp", "embed")
            ),
            bias_init=nn.with_logical_partitioning(
                nn.initializers.zeros_init(), ("embed",)
            ),
            name="fc2",
        )

        from pytorch_vae_tpu.ops import fused_ffn as ffk

        use_fused = self.use_fused
        if use_fused is None:
            use_fused = ffk.fused_ffn_enabled()
        act_name = {nn.relu: "relu", nn.gelu: "gelu"}.get(self.activation)
        n_rows = 1
        for d in lead:
            n_rows *= int(d)
        if (use_fused and act_name is not None
                and ffk.fused_ffn_supported(n_rows, self.dim, self.hidden)):
            from flax.core import meta as fmeta

            # materialize the params without paying for an unfused pass
            dummy = jnp.zeros((1, self.dim), self.dtype)
            fc2(fc1(dummy))
            pv = self.variables["params"]

            def unbox(name, field):
                w = fmeta.unbox(pv[name][field])
                return jnp.asarray(w, self.dtype)

            drop = 0.0 if deterministic else float(self.dropout)
            return ffk.fused_ffn(
                x,
                unbox("fc1", "kernel"), unbox("fc1", "bias"),
                unbox("fc2", "kernel"), unbox("fc2", "bias"),
                activation=act_name,
                dropout_rate=drop,
                dropout_key=(self.make_rng("dropout") if drop > 0.0
                             else None),
            )

        if dense2d_enabled("ffn"):  # see _DENSE2D note at module top
            x = x.reshape(-1, x.shape[-1])
        h = fc1(x)
        h = self.activation(h)
        if self.dropout > 0.0:
            h = CheapDropout(rate=self.dropout)(h,
                                                deterministic=deterministic)
        h = fc2(h)
        if dense2d_enabled("ffn"):
            h = h.reshape(lead + (self.dim,))
        return h


class EncoderBlock(nn.Module):
    """Pre-LN transformer encoder layer (torch norm_first semantics)."""

    dim: int
    num_heads: int
    ffn_dim: int = 2048
    dropout: float = 0.1
    activation: Callable = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key_mask=None, deterministic: bool = True):
        # LN output follows the block dtype; flax computes the mean/var
        # statistics in float32 regardless (nn._compute_stats upcasts), so
        # bf16 here only rounds the normalized output once — which the
        # bf16 projections would do anyway. f32 LN outputs were ~18 ms of
        # reduce-fusion HBM traffic per flagship step.
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        h = MultiHeadAttention(
            self.dim, self.num_heads, self.dropout, self.dtype, name="attn"
        )(h, h, h, key_mask=key_mask, deterministic=deterministic)
        h = CheapDropout(rate=self.dropout)(h, deterministic=deterministic)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        h = FeedForward(self.dim, self.ffn_dim, self.dropout,
                        self.activation, self.dtype, name="ffn")(
            h, deterministic=deterministic)
        h = CheapDropout(rate=self.dropout)(h, deterministic=deterministic)
        return x + h


class EncoderStack(nn.Module):
    """N stacked encoder blocks (torch nn.TransformerEncoder, no final LN).

    remat=True rematerializes each block on the backward pass
    (jax.checkpoint): ~30% more FLOPs for O(layers) less activation HBM,
    buying larger batches on a 16 GB chip.
    """

    dim: int
    num_heads: int
    num_layers: int
    ffn_dim: int = 2048
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        block_cls = (nn.remat(EncoderBlock, static_argnums=(3,))
                     if self.remat else EncoderBlock)
        for i in range(self.num_layers):
            x = block_cls(
                self.dim, self.num_heads, self.ffn_dim, self.dropout,
                dtype=self.dtype, name=f"layer_{i}",
            )(x, mask, deterministic)
        return x


class DecoderBlock(nn.Module):
    """Pre-LN transformer decoder layer: self-attn, cross-attn, FFN."""

    dim: int
    num_heads: int
    ffn_dim: int = 2048
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, memory, tgt_mask=None, memory_mask=None,
                 deterministic: bool = True):
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(x)
        h = MultiHeadAttention(
            self.dim, self.num_heads, self.dropout, self.dtype,
            name="self_attn",
        )(h, h, h, key_mask=tgt_mask, deterministic=deterministic)
        x = x + CheapDropout(rate=self.dropout)(h,
                                                deterministic=deterministic)

        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(x)
        h = MultiHeadAttention(
            self.dim, self.num_heads, self.dropout, self.dtype,
            name="cross_attn",
        )(h, memory, memory, key_mask=memory_mask,
          deterministic=deterministic)
        x = x + CheapDropout(rate=self.dropout)(h,
                                                deterministic=deterministic)

        h = nn.LayerNorm(dtype=self.dtype, name="ln3")(x)
        h = FeedForward(self.dim, self.ffn_dim, self.dropout,
                        nn.relu, self.dtype, name="ffn")(
            h, deterministic=deterministic)
        return x + CheapDropout(rate=self.dropout)(
            h, deterministic=deterministic)


class DecoderStack(nn.Module):
    """N stacked decoder blocks (torch nn.TransformerDecoder, no final LN).

    The reference decodes with tgt_mask=None (bidirectional self-attention
    over the L queries) and no memory mask (models/vq_vae.py:756-762).
    """

    dim: int
    num_heads: int
    num_layers: int
    ffn_dim: int = 2048
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, memory, tgt_mask=None, memory_mask=None,
                 deterministic: bool = True):
        block_cls = (nn.remat(DecoderBlock, static_argnums=(5,))
                     if self.remat else DecoderBlock)
        for i in range(self.num_layers):
            x = block_cls(
                self.dim, self.num_heads, self.ffn_dim, self.dropout,
                dtype=self.dtype, name=f"layer_{i}",
            )(x, memory, tgt_mask, memory_mask, deterministic)
        return x


class TokenizerBlock(nn.Module):
    """One learnable-query cross-attention block of the LatentTokenizer.

    q = q + drop(attn(LNq(q), LNkv(kv))); q = q + drop(GELU-FFN(LNo(q)))
    with a 4*d hidden width (models/vq_vae.py:296-322).
    """

    dim: int
    num_heads: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, kv, key_mask=None, deterministic: bool = True):
        qn = nn.LayerNorm(dtype=self.dtype, name="ln_q")(q)
        kvn = nn.LayerNorm(dtype=self.dtype, name="ln_kv")(kv)
        out = MultiHeadAttention(
            self.dim, self.num_heads, self.dropout, self.dtype, name="attn"
        )(qn, kvn, kvn, key_mask=key_mask, deterministic=deterministic)
        q = q + CheapDropout(rate=self.dropout)(out,
                                                deterministic=deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="ln_o")(q)
        h = FeedForward(self.dim, 4 * self.dim, dropout=0.0,
                        activation=nn.gelu, dtype=self.dtype, name="ffn")(
            h, deterministic=deterministic)
        q = q + CheapDropout(rate=self.dropout)(h,
                                                deterministic=deterministic)
        return q


class LatentTokenizer(nn.Module):
    """Perceiver-style L -> N tokenizer (models/vq_vae.py:288-322)."""

    dim: int
    n_tokens: int = 32
    num_heads: int = 8
    num_layers: int = 2
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        B = x.shape[0]
        queries = self.param(
            "queries",
            nn.with_logical_partitioning(
                nn.initializers.normal(stddev=0.02), (None, "embed")
            ),
            (self.n_tokens, self.dim),
            jnp.float32,
        )
        q = jnp.broadcast_to(
            queries[None].astype(self.dtype), (B, self.n_tokens, self.dim)
        )
        for i in range(self.num_layers):
            q = TokenizerBlock(
                self.dim, self.num_heads, self.dropout, self.dtype,
                name=f"block_{i}",
            )(q, x, key_mask=mask, deterministic=deterministic)
        return q
