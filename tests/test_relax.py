"""Decoder-side collision relaxation (ops/geometry.relax_collisions).

Round-5 extension, no reference counterpart: the reference filter simply
rejects clashing decodes (prior/filter_curves.py); after bond
legalization closed the bond_out reject class, the residual rejects of
every sampler are point/segment collisions and low angles. The
relaxation runs a few projected-gradient steps on a clash energy matched
to the filter gates (pipelines/filtering.py), re-legalizing bonds each
step, and is the identity on clash-free curves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_vae_tpu.ops.geometry import (bond_angle_cos, bond_lengths,
                                          collision_energy,
                                          relax_collisions)
from pytorch_vae_tpu.pipelines.filtering import (segment_clash_count,
                                                 self_collision_count)

LO, HI = 2.5, 5.2


def _hairpin(offset=1.0, n_out=8, bond=3.0):
    """A chain that runs out +x and folds back at a clashing offset.

    The return strand sits `offset` above the outbound strand, so point
    pairs across strands are ~`offset` apart — far below the filter's
    2.0 A point gate and the 1.3 A segment gate when offset is small.
    """
    out = np.stack([np.arange(n_out) * bond,
                    np.zeros(n_out), np.zeros(n_out)], -1)
    back = np.stack([np.arange(n_out - 1, -1, -1) * bond,
                     np.full(n_out, offset), np.zeros(n_out)], -1)
    return np.concatenate([out, back], 0)[None].astype(np.float32)


def _clash_counts(c):
    return (self_collision_count(c, 2.0, 2),
            segment_clash_count(c, 1.3, 1, 5))


def test_relax_clears_hairpin_clashes():
    """The filter's own oracles report zero collisions after relaxation,
    with every bond still inside the legal band."""
    xyz = _hairpin(offset=1.0)
    pts0, segs0 = _clash_counts(xyz[0])
    assert pts0 > 0 and segs0 > 0  # genuinely clashing input
    out = np.asarray(relax_collisions(jnp.asarray(xyz), None,
                                      bond_lo=LO, bond_hi=HI))
    pts1, segs1 = _clash_counts(out[0])
    assert pts1 == 0 and segs1 == 0
    ln = np.asarray(bond_lengths(jnp.asarray(out)))
    assert ln.min() >= LO - 1e-3 and ln.max() <= HI + 1e-3


def test_identity_on_clash_free_curves():
    """Zero energy -> zero gradient -> the map reduces to the bond
    legalization (identity for in-band bonds)."""
    rng = np.random.default_rng(0)
    d = np.tile(np.array([3.5, 0.0, 0.0]), (1, 15, 1))
    d += rng.normal(scale=0.1, size=d.shape)
    xyz = np.concatenate([np.zeros((1, 1, 3)), np.cumsum(d, 1)],
                         1).astype(np.float32)
    assert float(collision_energy(jnp.asarray(xyz), None)[0]) == 0.0
    out = np.asarray(relax_collisions(jnp.asarray(xyz), None,
                                      bond_lo=LO, bond_hi=HI))
    np.testing.assert_allclose(out, xyz, atol=1e-4)


def test_relaxed_angles_clear_the_hard_gate():
    """A near-reversal vertex (~8 deg) relaxes past the filter's
    10-degree hard minimum.

    Convention check: the filter's vertex angle uses vectors OUT of the
    vertex (bond_angle_stats), so a sharp fold-back has chain-direction
    cos (bond_angle_cos) near -1; the violation is cos < -cos(10 deg).
    """
    pts = np.array([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0], [0.1, 0.4, 0.0],
                    [-2.0, 2.5, 0.0], [-4.0, 5.0, 0.0],
                    [-6.0, 7.5, 0.0]], np.float32)[None]
    gate = -np.cos(np.deg2rad(10.0))
    cos0 = np.asarray(bond_angle_cos(jnp.asarray(pts)))
    assert cos0.min() < gate  # violating vertex exists
    out = relax_collisions(jnp.asarray(pts), None, bond_lo=LO, bond_hi=HI)
    cos1 = np.asarray(bond_angle_cos(out))
    assert cos1.min() > gate
    ln = np.asarray(bond_lengths(out))
    assert ln.min() >= LO - 1e-3 and ln.max() <= HI + 1e-3


def test_pad_invariance():
    """Garbage in the padded tail never moves a real position."""
    xyz = np.tile(_hairpin(offset=1.0), (2, 1, 1))
    L = xyz.shape[1]
    mask = np.zeros((2, L), bool)
    mask[:, :L - 4] = True
    garbage = xyz.copy()
    garbage[:, L - 4:] = 1e4 * np.random.default_rng(1).normal(
        size=garbage[:, L - 4:].shape)
    out_a = np.asarray(relax_collisions(
        jnp.asarray(xyz), jnp.asarray(mask), bond_lo=LO, bond_hi=HI))
    out_b = np.asarray(relax_collisions(
        jnp.asarray(garbage), jnp.asarray(mask), bond_lo=LO, bond_hi=HI))
    np.testing.assert_allclose(out_a[:, :L - 4], out_b[:, :L - 4],
                               atol=1e-3)


def test_energy_matches_filter_oracles_direction():
    """More clashes -> more energy; the energy is zero iff the numpy
    filter oracles see margin-clear geometry."""
    tight = collision_energy(jnp.asarray(_hairpin(offset=0.5)), None)
    loose = collision_energy(jnp.asarray(_hairpin(offset=1.5)), None)
    clear = collision_energy(jnp.asarray(_hairpin(offset=6.0)), None)
    assert float(tight[0]) > float(loose[0]) > 0.0
    assert float(clear[0]) == 0.0


def test_model_decode_relaxed_and_trainable():
    """A VQVAE with relax_collisions=True emits clash-free legal curves
    from a fresh decoder, and the STE keeps gradients finite/nonzero."""
    from pytorch_vae_tpu.models.vq_vae import VQVAE

    model = VQVAE(input_dim=6, hidden_dim=32, num_layers=1, num_heads=2,
                  max_seq_len=16, codebook_size=8, code_dim=8,
                  latent_tokens=4, tokenizer_layers=1, ffn_dim=32,
                  use_vq=False, legalize_bonds=True,
                  legalize_lo=LO, legalize_hi=HI,
                  relax_collisions=True, relax_steps=20)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 16, 6)),
                    jnp.float32)
    mask = jnp.ones((2, 16), bool)
    rngs = {"params": jax.random.PRNGKey(0), "aug": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, x, mask, train=False)
    (recons, _tgt, _pack, _m), _, _, _ = model.apply(
        variables, x, mask, train=False)
    xyz = np.asarray(recons[..., :3])
    assert _clash_counts(xyz[0]) == (0, 0)
    ln = np.asarray(bond_lengths(jnp.asarray(xyz)))
    assert ln.min() >= LO - 1e-3 and ln.max() <= HI + 1e-3

    def loss(v):
        (r, _t, _p, _mm), _, _, _ = model.apply(v, x, mask, train=False)
        return jnp.sum(r[..., :3] ** 2)

    g = jax.grad(lambda v: loss(v))(variables)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-q"]))
