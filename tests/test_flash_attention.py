"""Parity + gradient tests for the fused attention kernel.

The kernel (ops/flash_attention.py) must match the einsum attention path of
models/layers.py bit-for-tolerance when dropout is off (fwd and grads), and
with dropout on must (a) be deterministic in the seed, (b) drop at the
quantized rate with exact survivor rescaling, (c) have a custom VJP that is
the true gradient of the seeded forward. All tests run the kernel under the
Pallas interpreter on CPU (interpret=True is the flash_attention default
off-TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_vae_tpu.ops.flash_attention import (
    _RATE_BITS,
    flash_attention,
    flash_enabled,
    set_flash_override,
)

HP = jax.lax.Precision.HIGHEST


def ref_attention(q, k, v, key_mask=None, scale=None):
    """The einsum path of models/layers.py:MultiHeadAttention, dropout off."""
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, precision=HP) * scale
    if key_mask is not None:
        scores = scores + jnp.where(
            key_mask[:, None, None, :], 0.0, -1e30)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
                      precision=HP)


def make_qkv(key, B, LQ, LK, H, DH):
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, LQ, H, DH), jnp.float32)
    k = jax.random.normal(kk, (B, LK, H, DH), jnp.float32)
    v = jax.random.normal(kv, (B, LK, H, DH), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("shape", [
    (2, 37, 37, 2, 16),    # self-attention, odd length
    (2, 70, 35, 2, 8),     # decoder cross-attention shape class
    (1, 16, 150, 4, 32),   # tokenizer shape class (few queries, many keys)
])
def test_forward_parity_no_mask(shape):
    B, LQ, LK, H, DH = shape
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, LQ, LK, H, DH)
    out = flash_attention(q, k, v)
    ref = ref_attention(q, k, v)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_forward_parity_with_key_padding():
    B, LQ, LK, H, DH = 3, 40, 40, 2, 16
    q, k, v = make_qkv(jax.random.PRNGKey(1), B, LQ, LK, H, DH)
    # variable valid lengths, incl. one fully-valid row
    lengths = jnp.array([40, 17, 5])
    mask = jnp.arange(LK)[None, :] < lengths[:, None]
    out = flash_attention(q, k, v, key_mask=mask)
    ref = ref_attention(q, k, v, key_mask=mask)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_grad_parity_no_dropout():
    B, LQ, LK, H, DH = 2, 33, 21, 2, 8
    q, k, v = make_qkv(jax.random.PRNGKey(2), B, LQ, LK, H, DH)
    mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.8, (B, LK))
    cot = jax.random.normal(jax.random.PRNGKey(4), (B, LQ, H, DH))

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v, key_mask=mask) * cot)

    g_flash = jax.grad(loss(flash_attention), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss(ref_attention), argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(gf, gr, rtol=5e-5, atol=5e-5,
                                   err_msg=f"d{name}")


def test_exp2_mode_parity(monkeypatch):
    """PVT_FLASH_EXP2 mode (log2-space scores + exp2; ln2 on the bwd
    row-scale column) must match the einsum reference exactly like the
    default exp mode does — fwd, dq, dk, dv, with key padding."""
    import pytorch_vae_tpu.ops.flash_attention as fa

    monkeypatch.setattr(fa, "_USE_EXP2", True)
    B, LQ, LK, H, DH = 2, 33, 21, 2, 8
    q, k, v = make_qkv(jax.random.PRNGKey(12), B, LQ, LK, H, DH)
    mask = jax.random.bernoulli(jax.random.PRNGKey(13), 0.8, (B, LK))
    out = fa.flash_attention(q, k, v, key_mask=mask)
    ref = ref_attention(q, k, v, key_mask=mask)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)

    cot = jax.random.normal(jax.random.PRNGKey(14), (B, LQ, H, DH))

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v, key_mask=mask) * cot)

    g_flash = jax.grad(loss(fa.flash_attention), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss(ref_attention), argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(gf, gr, rtol=5e-5, atol=5e-5,
                                   err_msg=f"exp2 d{name}")


def test_dropout_deterministic_in_seed():
    B, LQ, LK, H, DH = 2, 24, 24, 2, 8
    q, k, v = make_qkv(jax.random.PRNGKey(5), B, LQ, LK, H, DH)
    key = jax.random.PRNGKey(7)
    a = flash_attention(q, k, v, dropout_rate=0.3, dropout_key=key)
    b = flash_attention(q, k, v, dropout_rate=0.3, dropout_key=key)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = flash_attention(q, k, v, dropout_rate=0.3,
                        dropout_key=jax.random.PRNGKey(8))
    assert not np.allclose(a, c)


def test_dropout_rate_and_rescale_exact():
    """Recover the dropped probability matrix via one-hot values.

    With H=1 and v[b, j, 0, :] = e_j, the output row i IS the post-dropout
    probability vector: where kept it must equal p * 1/(1-rate_q) with
    rate_q the 1/2^24-quantized rate; elsewhere exactly 0.
    """
    B, L, H = 4, 32, 1
    rate = 0.25
    q, k, _ = make_qkv(jax.random.PRNGKey(9), B, L, L, H, 16)
    v = jnp.broadcast_to(jnp.eye(L, dtype=jnp.float32)[None, :, None, :],
                         (B, L, H, L))
    probs = np.asarray(flash_attention(
        q, k, v, dropout_rate=rate, dropout_key=jax.random.PRNGKey(10)))
    ref = np.asarray(ref_attention(q, k, v))  # rows = softmax probs

    thresh = int(round(rate * (1 << _RATE_BITS)))
    actual = thresh / float(1 << _RATE_BITS)
    kept = probs > 0
    frac_dropped = 1.0 - kept.mean()
    assert abs(frac_dropped - actual) < 0.02, frac_dropped
    np.testing.assert_allclose(
        probs[kept], (ref / (1.0 - actual))[kept], rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(probs[~kept], 0.0)


def test_dropout_grad_is_true_gradient_of_seeded_forward():
    from jax.test_util import check_grads

    B, LQ, LK, H, DH = 1, 16, 12, 2, 8
    q, k, v = make_qkv(jax.random.PRNGKey(11), B, LQ, LK, H, DH)
    key = jax.random.PRNGKey(12)

    def f(q, k, v):
        return flash_attention(q, k, v, dropout_rate=0.3, dropout_key=key)

    check_grads(f, (q, k, v), order=1, modes=["rev"],
                rtol=2e-3, atol=2e-3)


def test_module_flash_matches_einsum_path():
    """MultiHeadAttention with use_flash True/False: same params, same out."""
    from pytorch_vae_tpu.models.layers import MultiHeadAttention

    B, LQ, LK, H, D = 2, 30, 20, 4, 32
    q = jax.random.normal(jax.random.PRNGKey(13), (B, LQ, D))
    kv = jax.random.normal(jax.random.PRNGKey(14), (B, LK, D))
    mask = jax.random.bernoulli(jax.random.PRNGKey(15), 0.7, (B, LK))

    mod_e = MultiHeadAttention(D, H, dropout=0.1, use_flash=False)
    params = mod_e.init(jax.random.PRNGKey(16), q, kv, kv)["params"]
    out_e = mod_e.apply({"params": params}, q, kv, kv, key_mask=mask,
                        deterministic=True)
    mod_f = MultiHeadAttention(D, H, dropout=0.1, use_flash=True)
    out_f = mod_f.apply({"params": params}, q, kv, kv, key_mask=mask,
                        deterministic=True)
    np.testing.assert_allclose(out_f, out_e, rtol=2e-5, atol=2e-5)


def test_full_model_forward_parity_flash_vs_einsum():
    """Tiny VQVAE forward: flash override on vs off, same recons."""
    from pytorch_vae_tpu.models.quantizer import init_vq_state
    from pytorch_vae_tpu.models.vq_vae import VQVAE

    model = VQVAE(hidden_dim=32, num_layers=1, num_heads=2, ffn_dim=64,
                  max_seq_len=48, use_vq=True, num_quantizers=2,
                  codebook_size=32, code_dim=16, latent_tokens=4,
                  tokenizer_layers=1)
    key = jax.random.PRNGKey(17)
    x = jax.random.normal(key, (2, 48, 6))
    mask = jnp.arange(48)[None, :] < jnp.array([[48], [30]])
    vqs = init_vq_state(jax.random.PRNGKey(18), model.vq_config)
    variables = model.init(
        {"params": key, "dropout": key, "aug": key, "reinit": key},
        x, mask, vqs, None, step=0, train=False)

    def fwd():
        out, _, _, _ = model.apply(variables, x, mask, vqs, None, step=0,
                                   train=False)
        return out[0]

    assert not flash_enabled()  # CPU default: einsum
    recons_e = fwd()
    set_flash_override(True)
    try:
        recons_f = fwd()
    finally:
        set_flash_override(None)
    np.testing.assert_allclose(recons_f, recons_e, rtol=1e-4, atol=1e-4)


def test_dropout_unbiased_over_seeds():
    """E_seed[dropout attention] ~= no-dropout attention."""
    B, L, H, DH = 1, 16, 1, 8
    q, k, v = make_qkv(jax.random.PRNGKey(19), B, L, L, H, DH)
    ref = np.asarray(ref_attention(q, k, v))
    keys = jax.random.split(jax.random.PRNGKey(20), 96)
    acc = np.zeros_like(ref)
    for kk in keys:
        acc += np.asarray(flash_attention(q, k, v, dropout_rate=0.25,
                                          dropout_key=kk))
    mean = acc / len(keys)
    # Monte-Carlo tolerance: std of the estimator ~ p/sqrt(N*keep)
    np.testing.assert_allclose(mean, ref, rtol=0.2, atol=0.08)


def test_hpb_auto_sizing_is_dtype_aware():
    """The head-group auto-sizer must account for the array dtype.

    Regression for a real on-chip Mosaic lowering failure (round 5): the
    flagship fp32 step at hpb=8 needs 16.18 MB of scoped VMEM and dies at
    the 16 MB limit, while bf16 at hpb=8 lowers green and is the measured
    perf optimum (121.6 ms, benchmarks/hpb_ab.json). The estimator used to
    hardcode 2-byte blocks and picked 8 for both.
    """
    from pytorch_vae_tpu.ops.flash_attention import _heads_per_block

    # flagship shape: H=8, Dh=Dhv=64, LQ=LK=350
    assert _heads_per_block(64, 64, 8, 350, 350, itemsize=2) == 8
    fp32 = _heads_per_block(64, 64, 8, 350, 350, itemsize=4)
    assert fp32 <= 4, f"fp32 flagship must shrink the head group, got {fp32}"
    # Mosaic legality must hold for whatever it picks
    assert (fp32 * 64) % 128 == 0 and 8 % fp32 == 0
