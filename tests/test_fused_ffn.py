"""Parity + gradient tests for the fused FFN kernel.

The kernel (ops/fused_ffn.py) must match the two-Dense FeedForward path of
models/layers.py when dropout is off (fwd and grads), and with dropout on
must (a) be deterministic in the seed and INDEPENDENT of the tiling (the
backward kernels tile differently from the forward), (b) drop at the
quantized rate with exact survivor rescaling, (c) have a custom VJP that is
the true gradient of the seeded forward. All tests run the kernel under the
Pallas interpreter on CPU (interpret=True is the fused_ffn default
off-TPU). Hardware lowering is validated separately by
benchmarks/validate_fused_ffn_tpu.py.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_vae_tpu.models.layers import FeedForward
from pytorch_vae_tpu.ops.fused_ffn import (
    _RATE_BITS,
    _dropout_scale,
    _keep_mask,
    fused_ffn,
    fused_ffn_enabled,
    fused_ffn_supported,
    set_fused_ffn_override,
)

HP = jax.lax.Precision.HIGHEST


def make_inputs(key, n, e, ff, dtype=jnp.float32):
    kx, k1, k2, kb1, kb2 = jax.random.split(key, 5)
    x = jax.random.normal(kx, (n, e), jnp.float32)
    w1 = jax.random.normal(k1, (e, ff), jnp.float32) / np.sqrt(e)
    b1 = jax.random.normal(kb1, (ff,), jnp.float32) * 0.1
    w2 = jax.random.normal(k2, (ff, e), jnp.float32) / np.sqrt(ff)
    b2 = jax.random.normal(kb2, (e,), jnp.float32) * 0.1
    return tuple(a.astype(dtype) for a in (x, w1, b1, w2, b2))


def ref_ffn(x, w1, b1, w2, b2, activation="relu"):
    """The two-Dense path of models/layers.py:FeedForward, dropout off."""
    act = {"relu": nn.relu, "gelu": nn.gelu}[activation]
    pre = (jnp.dot(x, w1, precision=HP,
                   preferred_element_type=jnp.float32)
           + b1.astype(jnp.float32))
    h = act(pre).astype(x.dtype)
    out = (jnp.dot(h, w2, precision=HP,
                   preferred_element_type=jnp.float32)
           + b2.astype(jnp.float32))
    return out.astype(x.dtype)


def ref_ffn_dropped(x, w1, b1, w2, b2, keep, thresh24, activation="relu"):
    """Reference forward using the kernel's own (position-based) mask."""
    act = {"relu": nn.relu, "gelu": nn.gelu}[activation]
    pre = (jnp.dot(x, w1, precision=HP,
                   preferred_element_type=jnp.float32)
           + b1.astype(jnp.float32))
    h = act(pre)
    h = jnp.where(keep, h * _dropout_scale(thresh24), 0.0)
    out = (jnp.dot(h.astype(x.dtype), w2, precision=HP,
                   preferred_element_type=jnp.float32)
           + b2.astype(jnp.float32))
    return out.astype(x.dtype)


@pytest.mark.parametrize("activation", ["relu", "gelu"])
@pytest.mark.parametrize("n", [64, 41])  # 41 exercises the row-pad path
def test_forward_parity_f32(activation, n):
    x, w1, b1, w2, b2 = make_inputs(jax.random.PRNGKey(0), n, 128, 256)
    out = fused_ffn(x, w1, b1, w2, b2, activation=activation)
    ref = ref_ffn(x, w1, b1, w2, b2, activation=activation)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_forward_parity_leading_shape():
    x, w1, b1, w2, b2 = make_inputs(jax.random.PRNGKey(1), 48, 128, 256)
    x3 = x.reshape(4, 12, 128)
    out = fused_ffn(x3, w1, b1, w2, b2)
    assert out.shape == (4, 12, 128)
    ref = ref_ffn(x, w1, b1, w2, b2).reshape(4, 12, 128)
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_forward_parity_bf16():
    x, w1, b1, w2, b2 = make_inputs(
        jax.random.PRNGKey(2), 64, 128, 256, dtype=jnp.bfloat16)
    out = fused_ffn(x, w1, b1, w2, b2)
    # f32 oracle on the bf16 operands; bf16 output tolerance
    ref = ref_ffn(*(a.astype(jnp.float32) for a in (x, w1, b1, w2, b2)))
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("activation", ["relu", "gelu"])
@pytest.mark.parametrize("n", [64, 41])
def test_grads_match_autodiff_no_dropout(activation, n):
    x, w1, b1, w2, b2 = make_inputs(jax.random.PRNGKey(3), n, 128, 256)
    cot = jax.random.normal(jax.random.PRNGKey(4), (n, 128), jnp.float32)

    def loss_fused(*args):
        return jnp.sum(fused_ffn(*args, activation=activation) * cot)

    def loss_ref(*args):
        return jnp.sum(ref_ffn(*args, activation=activation) * cot)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        x, w1, b1, w2, b2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for gf, gr, name in zip(g_fused, g_ref, "x w1 b1 w2 b2".split()):
        np.testing.assert_allclose(
            gf, gr, rtol=3e-5, atol=3e-5,
            err_msg=f"grad mismatch for {name}")


def _thresh24(rate):
    return min((1 << _RATE_BITS) - 1, int(round(rate * (1 << _RATE_BITS))))


def _kernel_mask(key, n, ff, rate):
    """The mask the kernel derives: full-array tile at offset (0, 0)."""
    seed = jax.lax.bitcast_convert_type(
        jax.random.key_data(key).reshape(-1)[:2], jnp.int32)
    return _keep_mask((n, ff), jnp.uint32(0), jnp.uint32(0),
                      seed[0], seed[1], _thresh24(rate), ff)


def test_dropout_forward_matches_seeded_reference():
    """Position-based mask => one reference mask explains every tiling."""
    rate = 0.25
    key = jax.random.PRNGKey(7)
    x, w1, b1, w2, b2 = make_inputs(jax.random.PRNGKey(5), 64, 128, 256)
    out = fused_ffn(x, w1, b1, w2, b2, dropout_rate=rate, dropout_key=key)
    keep = _kernel_mask(key, 64, 256, rate)
    ref = ref_ffn_dropped(x, w1, b1, w2, b2, keep, _thresh24(rate))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_dropout_grads_match_seeded_reference():
    """The custom VJP must be the true gradient of the seeded forward —
    including the two backward kernels re-deriving the identical mask
    under their own (different) tilings."""
    rate = 0.4
    key = jax.random.PRNGKey(11)
    n, e, ff = 48, 128, 384
    x, w1, b1, w2, b2 = make_inputs(jax.random.PRNGKey(6), n, e, ff)
    cot = jax.random.normal(jax.random.PRNGKey(8), (n, e), jnp.float32)
    keep = _kernel_mask(key, n, ff, rate)

    def loss_fused(*args):
        return jnp.sum(fused_ffn(*args, dropout_rate=rate,
                                 dropout_key=key) * cot)

    def loss_ref(*args):
        return jnp.sum(ref_ffn_dropped(*args, keep, _thresh24(rate)) * cot)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        x, w1, b1, w2, b2)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for gf, gr, name in zip(g_fused, g_ref, "x w1 b1 w2 b2".split()):
        np.testing.assert_allclose(
            gf, gr, rtol=3e-5, atol=3e-5,
            err_msg=f"grad mismatch for {name}")


def test_dropout_rate_and_scale():
    rate = 0.5
    key = jax.random.PRNGKey(13)
    n, e, ff = 256, 128, 512
    keep = np.asarray(_kernel_mask(key, n, ff, rate))
    # quantized rate is exact in expectation; 128k samples, loose band
    assert abs(keep.mean() - (1.0 - rate)) < 0.01
    # determinism in the seed
    keep2 = np.asarray(_kernel_mask(key, n, ff, rate))
    np.testing.assert_array_equal(keep, keep2)
    keep3 = np.asarray(_kernel_mask(jax.random.PRNGKey(14), n, ff, rate))
    assert (keep != keep3).mean() > 0.3


def test_dropout_requires_key():
    x, w1, b1, w2, b2 = make_inputs(jax.random.PRNGKey(9), 16, 128, 256)
    with pytest.raises(ValueError, match="dropout_key"):
        fused_ffn(x, w1, b1, w2, b2, dropout_rate=0.1)


def test_feedforward_module_fused_matches_unfused():
    """FeedForward(use_fused=True) == the Dense path, same params."""
    e, ff = 128, 256
    mod_ref = FeedForward(dim=e, hidden=ff, dropout=0.1)
    x = jax.random.normal(jax.random.PRNGKey(15), (4, 16, e), jnp.float32)
    params = mod_ref.init(jax.random.PRNGKey(16), x)
    set_fused_ffn_override(True)
    try:
        # 64*32 = 2048 rows clears the _MIN_ROWS gate
        xb = jax.random.normal(jax.random.PRNGKey(17), (64, 32, e),
                               jnp.float32)
        out_fused = FeedForward(dim=e, hidden=ff, dropout=0.1).apply(
            params, xb, deterministic=True)
    finally:
        set_fused_ffn_override(None)
    out_ref = mod_ref.apply(params, xb, deterministic=True)
    np.testing.assert_allclose(out_fused, out_ref, rtol=2e-5, atol=2e-5)


def test_feedforward_module_fused_dropout_trains():
    """Fused path with dropout: grads flow, params layout unchanged."""
    e, ff = 128, 256
    mod = FeedForward(dim=e, hidden=ff, dropout=0.2)
    x = jax.random.normal(jax.random.PRNGKey(18), (64, 32, e), jnp.float32)
    params = mod.init(jax.random.PRNGKey(19), x)
    set_fused_ffn_override(True)
    try:
        def loss(p):
            out = mod.apply(p, x, deterministic=False,
                            rngs={"dropout": jax.random.PRNGKey(20)})
            return jnp.sum(out ** 2)

        val, grads = jax.value_and_grad(loss)(params)
    finally:
        set_fused_ffn_override(None)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_supported_gate():
    assert fused_ffn_supported(44800, 512, 2048)
    assert not fused_ffn_supported(64, 512, 2048)      # too few rows
    assert not fused_ffn_supported(44800, 510, 2048)   # lane rule
    assert not fused_ffn_supported(44800, 512, 2000)   # lane rule
    assert not fused_ffn_enabled()  # default off until hardware A/B
