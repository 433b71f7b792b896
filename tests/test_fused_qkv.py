"""Parity tests for the fully fused self-attention block kernel
(ops/fused_qkv_attention.py): QKV projection + attention + out-projection
in one Pallas call, with weight gradients accumulated across the batch
grid. Reference is the einsum MultiHeadAttention path on identical
parameters (rebuilds torch nn.MultiheadAttention semantics,
/root/reference/models/vq_vae.py:455-473)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_vae_tpu.models.layers import MultiHeadAttention


def _mk(B=2, L=24, D=32, H=4, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(ks[0], (B, L, D))
    mask = jax.random.bernoulli(ks[1], 0.75, (B, L)).at[:, 0].set(True)
    mod = MultiHeadAttention(D, H, dropout=0.1, use_flash=False)
    params = mod.init(ks[2], x, x, x)["params"]
    return x, mask, params


def _apply(params, x, mask, *, flash, drop_key=None, deterministic=True,
           D=32, H=4):
    mod = MultiHeadAttention(D, H, dropout=0.1, use_flash=flash,
                             use_fused=flash)
    rngs = {"dropout": drop_key} if drop_key is not None else {}
    return mod.apply({"params": params}, x, x, x, key_mask=mask,
                     deterministic=deterministic, rngs=rngs)


def test_fused_forward_matches_einsum():
    x, mask, params = _mk()
    out_e = _apply(params, x, mask, flash=False)
    out_f = _apply(params, x, mask, flash=True)
    np.testing.assert_allclose(out_f, out_e, rtol=2e-5, atol=2e-5)


def test_fused_grads_match_einsum_params_and_input():
    """d loss / d {x, every projection weight+bias} through the fused
    kernel's custom VJP vs jax autodiff through the einsum path. This is
    the only test that exercises the cross-batch dW accumulation blocks."""
    x, mask, params = _mk(B=3, L=17)

    def loss(p, xx, flash):
        out = _apply(p, xx, mask, flash=flash)
        return jnp.sum(out * jnp.cos(out))  # non-trivial cotangent

    ge_p, ge_x = jax.grad(loss, argnums=(0, 1))(params, x, False)
    gf_p, gf_x = jax.grad(loss, argnums=(0, 1))(params, x, True)
    np.testing.assert_allclose(gf_x, ge_x, rtol=1e-4, atol=1e-4)
    flat_e = jax.tree_util.tree_leaves_with_path(ge_p)
    flat_f = jax.tree_util.tree_leaves_with_path(gf_p)
    assert len(flat_e) == len(flat_f) == 8  # 4 kernels + 4 biases
    for (pe, le), (pf, lf) in zip(flat_e, flat_f):
        assert pe == pf
        np.testing.assert_allclose(
            lf, le, rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pe)}")


def test_fused_dropout_deterministic_and_grad_consistent():
    """Same dropout key -> identical stochastic forward; the custom VJP
    gradient matches finite differences of that seeded forward."""
    x, mask, params = _mk(B=2, L=12)
    dk = jax.random.PRNGKey(99)

    def fwd(p):
        return _apply(p, x, mask, flash=True, drop_key=dk,
                      deterministic=False)

    o1, o2 = fwd(params), fwd(params)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    # masks actually drop something at rate 0.1
    o_det = _apply(params, x, mask, flash=True)
    assert not np.allclose(np.asarray(o1), np.asarray(o_det))

    def loss(p):
        return jnp.sum(fwd(p) ** 2)

    from flax.core import meta as fmeta

    g = jax.grad(loss)(params)
    plain = fmeta.unbox(params)  # strip LogicallyPartitioned boxes
    g_plain = fmeta.unbox(g)
    # numeric check on a handful of weight coordinates (loss() accepts the
    # unboxed tree: flax treats plain arrays as metadata-free params)
    for idx in [(0, 0, 0), (3, 1, 2)]:
        eps = 1e-3
        base = plain["q_proj"]["kernel"]
        up = {**plain, "q_proj": {**plain["q_proj"],
                                  "kernel": base.at[idx].add(eps)}}
        dn = {**plain, "q_proj": {**plain["q_proj"],
                                  "kernel": base.at[idx].add(-eps)}}
        num = (loss(up) - loss(dn)) / (2 * eps)
        ana = g_plain["q_proj"]["kernel"][idx]
        # loose bound: f32 centered differences carry ~1% noise here
        # (softmax row-max kinks + cancellation). Exact analytic parity
        # is covered by test_fused_grads_match_einsum_params_and_input
        # (2e-4); this check only guards against a wrong-by-construction
        # dropout VJP (sign/scale errors are >> 2.5e-2).
        np.testing.assert_allclose(ana, num, rtol=2.5e-2, atol=2.5e-2)


def test_fused_single_head_and_odd_length():
    """H=1 (no concatenate) and an odd sequence length lower fine."""
    x, mask, params_unused = _mk()
    D, H, L = 16, 1, 13
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    x = jax.random.normal(ks[0], (2, L, D))
    mask = jnp.ones((2, L), bool)
    mod_e = MultiHeadAttention(D, H, dropout=0.0, use_flash=False)
    params = mod_e.init(ks[2], x, x, x)["params"]
    out_e = mod_e.apply({"params": params}, x, x, x, key_mask=mask)
    mod_f = MultiHeadAttention(D, H, dropout=0.0, use_flash=True,
                               use_fused=True)
    out_f = mod_f.apply({"params": params}, x, x, x, key_mask=mask)
    np.testing.assert_allclose(out_f, out_e, rtol=2e-5, atol=2e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
