"""Decoder-side bond legalization (ops/geometry.legalize_bond_lengths).

Round-5 extension, no reference counterpart: the reference decoder emits
raw coordinates (models/vq_vae.py:745-765) and its strict filter then
rejects ~20% of quantized decodes on short bonds (the measured 21.9%
reconstruction-ceiling keep, results/prior_r3). The legalization layer
makes every decode path legal-by-construction on bond lengths while
preserving bond directions, and is the identity wherever bonds are
already in band.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_vae_tpu.ops.geometry import (bond_lengths,
                                          legalize_bond_lengths)

LO, HI = 2.5, 5.2


def _rand_curves(key, B=4, L=24, scale=3.0):
    return jax.random.normal(key, (B, L, 3)) * scale


def test_output_bonds_always_in_band():
    """Arbitrary inputs — including coincident points — produce bonds in
    [lo, hi] at every real position."""
    xyz = np.array(_rand_curves(jax.random.PRNGKey(0), scale=5.0))
    xyz[0, 3] = xyz[0, 2]          # exactly coincident pair
    xyz[1, 10] = xyz[1, 9] + 1e-9  # nearly coincident
    xyz[2, 5] = xyz[2, 4] + 40.0   # absurdly long bond
    mask = np.ones(xyz.shape[:2], bool)
    out = legalize_bond_lengths(jnp.asarray(xyz), jnp.asarray(mask), LO, HI)
    ln = np.asarray(bond_lengths(out))
    assert ln.min() >= LO - 1e-4
    assert ln.max() <= HI + 1e-4


def test_identity_when_already_legal():
    """A chain whose bonds are all inside the band passes through
    bit-near-exactly (the map costs nothing at convergence)."""
    rng = np.random.default_rng(1)
    B, L = 3, 16
    d = rng.normal(size=(B, L - 1, 3))
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    d = d * rng.uniform(LO + 0.2, HI - 0.2, size=(B, L - 1, 1))
    xyz = np.concatenate([np.zeros((B, 1, 3)), np.cumsum(d, 1)], 1)
    out = legalize_bond_lengths(jnp.asarray(xyz), None, LO, HI)
    np.testing.assert_allclose(np.asarray(out), xyz, atol=1e-5)


def test_directions_preserved():
    """Clamping changes lengths only: every bond's unit direction is
    unchanged, so bond angles and dihedrals are invariant."""
    xyz = _rand_curves(jax.random.PRNGKey(2), scale=6.0)
    out = legalize_bond_lengths(xyz, None, LO, HI)
    d_in = np.asarray(xyz[:, 1:] - xyz[:, :-1])
    d_out = np.asarray(out[:, 1:] - out[:, :-1])
    u_in = d_in / np.linalg.norm(d_in, axis=-1, keepdims=True)
    u_out = d_out / np.linalg.norm(d_out, axis=-1, keepdims=True)
    np.testing.assert_allclose(u_in, u_out, atol=1e-5)


def test_pad_invariance():
    """Garbage in the padded tail never moves a real position."""
    key = jax.random.PRNGKey(3)
    xyz = np.asarray(_rand_curves(key, B=2, L=20, scale=5.0))
    mask = np.zeros((2, 20), bool)
    mask[:, :12] = True
    garbage = xyz.copy()
    garbage[:, 12:] = 1e6 * np.random.default_rng(4).normal(
        size=garbage[:, 12:].shape)
    out_a = np.asarray(legalize_bond_lengths(
        jnp.asarray(xyz), jnp.asarray(mask), LO, HI))
    out_b = np.asarray(legalize_bond_lengths(
        jnp.asarray(garbage), jnp.asarray(mask), LO, HI))
    np.testing.assert_allclose(out_a[:, :12], out_b[:, :12], atol=1e-5)


def test_straight_through_gradient():
    """The clamp is an STE: gradients flow through clamped bonds as if
    unclamped, so xyz losses keep pulling raw lengths toward truth."""
    xyz = _rand_curves(jax.random.PRNGKey(5), B=1, L=8, scale=0.3)
    # scale 0.3 -> every bond far below lo -> every bond clamped

    def loss(x):
        out = legalize_bond_lengths(x, None, LO, HI)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(xyz)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0.0


def test_numpy_oracle_single_chain():
    """Exact re-integration against a literal numpy loop."""
    rng = np.random.default_rng(6)
    L = 10
    xyz = rng.normal(size=(1, L, 3)) * 4.0
    out = np.asarray(legalize_bond_lengths(jnp.asarray(xyz), None, LO, HI))
    expect = np.zeros_like(xyz)
    expect[0, 0] = xyz[0, 0]
    for i in range(1, L):
        d = xyz[0, i] - xyz[0, i - 1]
        ln = np.linalg.norm(d)
        u = d / ln if ln > 1e-6 else np.array([0.0, 0.0, 1.0])
        expect[0, i] = expect[0, i - 1] + u * np.clip(ln, LO, HI)
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_model_decode_legal_by_construction():
    """A VQVAE with legalize_bonds=True emits legal bonds from a FRESH
    (untrained) decoder — the property the recon-ceiling push relies on."""
    from pytorch_vae_tpu.models.vq_vae import VQVAE

    model = VQVAE(input_dim=6, hidden_dim=32, num_layers=1, num_heads=2,
                  max_seq_len=16, codebook_size=8, code_dim=8,
                  latent_tokens=4, tokenizer_layers=1, ffn_dim=32,
                  use_vq=False, legalize_bonds=True,
                  legalize_lo=LO, legalize_hi=HI)
    x = jnp.asarray(np.random.default_rng(7).normal(size=(2, 16, 6)),
                    jnp.float32)
    mask = jnp.ones((2, 16), bool)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1),
         "dropout": jax.random.PRNGKey(2)},
        x, mask, train=False)
    (recons, _tgt, _pack, _m), _, _, _ = model.apply(
        variables, x, mask, train=False)
    ln = np.asarray(bond_lengths(recons[..., :3]))
    assert ln.min() >= LO - 1e-3
    assert ln.max() <= HI + 1e-3


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))
