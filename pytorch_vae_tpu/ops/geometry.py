"""Curve geometry primitives: dihedrals, rotations, Frenet statistics.

Vectorized jnp versions of the reference's geometry helpers
(models/vq_vae.py:328-359, 1040-1095). All functions are jit-friendly
(static shapes, no data-dependent Python control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .masking import safe_norm, unit

EPS = 1e-8


def dihedral_cos_sin(x: jnp.ndarray) -> jnp.ndarray:
    """Backbone dihedral angles as (cos, sin) pairs.

    x: [B, L, 3] with L >= 4 -> [B, L-3, 2].
    (reference: _dihedral_cos_sin, models/vq_vae.py:347-359)
    """
    v1 = x[:, 1:-2, :] - x[:, :-3, :]
    v2 = x[:, 2:-1, :] - x[:, 1:-2, :]
    v3 = x[:, 3:, :] - x[:, 2:-1, :]
    b1, b2, b3 = unit(v1), unit(v2), unit(v3)
    n1 = unit(jnp.cross(b1, b2))
    n2 = unit(jnp.cross(b2, b3))
    m1 = jnp.cross(n1, unit(b2))
    cos_t = jnp.clip(jnp.sum(n1 * n2, axis=-1, keepdims=True), -1.0, 1.0)
    sin_t = jnp.clip(jnp.sum(m1 * n2, axis=-1, keepdims=True), -1.0, 1.0)
    return jnp.concatenate([cos_t, sin_t], axis=-1)


def random_rotation(key: jax.Array, batch: int) -> jnp.ndarray:
    """Uniform random rotation matrices [B, 3, 3] via quaternion sampling.

    (reference: _random_rotation, models/vq_vae.py:331-345; same Shoemake
    construction, JAX threefry RNG instead of torch global RNG)
    """
    u = jax.random.uniform(key, (3, batch))
    u1, u2, u3 = u[0], u[1], u[2]
    two_pi = 2.0 * jnp.pi
    x = jnp.sqrt(1.0 - u1) * jnp.sin(two_pi * u2)
    y = jnp.sqrt(1.0 - u1) * jnp.cos(two_pi * u2)
    z = jnp.sqrt(u1) * jnp.sin(two_pi * u3)
    w = jnp.sqrt(u1) * jnp.cos(two_pi * u3)
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                      2 * (x * z + y * w)], axis=-1)
    row1 = jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                      2 * (y * z - x * w)], axis=-1)
    row2 = jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                      1 - 2 * (x * x + y * y)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)  # [B, 3, 3]


def bond_lengths(x: jnp.ndarray) -> jnp.ndarray:
    """Consecutive point distances: [B, L, 3] -> [B, L-1] (grad-safe)."""
    return safe_norm(x[:, 1:, :] - x[:, :-1, :])


def bond_angle_cos(x: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Cosine of the angle at each interior point: [B, L, 3] -> [B, L-2].

    (reference: the `_cos` helper inside loss_function,
    models/vq_vae.py:1249-1254)
    """
    v1 = x[:, 1:-1, :] - x[:, :-2, :]
    v2 = x[:, 2:, :] - x[:, 1:-1, :]
    v1n = v1 / (safe_norm(v1, keepdims=True) + eps)
    v2n = v2 / (safe_norm(v2, keepdims=True) + eps)
    return jnp.sum(v1n * v2n, axis=-1)


def second_difference_sq(x: jnp.ndarray) -> jnp.ndarray:
    """Squared norm of the discrete second difference: [B, L, 3] -> [B, L-2].

    Used by both the xyz TV regularizer (models/vq_vae.py:1312-1322) and the
    Frenet curvature regularizer (models/vq_vae.py:1044-1052).
    """
    d1 = x[:, 1:, :] - x[:, :-1, :]
    d2 = d1[:, 1:, :] - d1[:, :-1, :]
    return jnp.sum(d2 ** 2, axis=-1)


def legalize_bond_lengths(
    xyz: jnp.ndarray,
    mask: jnp.ndarray | None,
    lo: float,
    hi: float,
) -> jnp.ndarray:
    """Clamp every bond length into [lo, hi] and re-integrate the chain.

    Decoder-side legalization layer (round-5 extension; no reference
    counterpart — the reference's decoder emits raw coordinates,
    models/vq_vae.py:745-765, and its AE-OT filter then rejects ~20% of
    quantized decodes on short bonds). Each displacement keeps its
    DIRECTION (bond angles/dihedrals are invariant under this map) and
    has its length clamped into the legal band; positions are rebuilt by
    a cumulative sum from the first point. Where all bonds are already
    in band the map is the identity, so at convergence it costs nothing.

    Gradients use a straight-through estimator through the clamp
    (forward: clipped; backward: identity), so the xyz losses keep
    pulling raw lengths toward the truth instead of going blind in the
    clamped region.

    Coincident points (zero-length bonds — possible with bf16 decoders,
    see ops/masking.safe_norm) get a fixed +z direction so the output is
    legal-by-construction even there.

    Padded bonds (mask off at either end) keep their raw displacement:
    real outputs depend only on real displacements, preserving the
    suite's pad-invariance contract.

    xyz: [B, L, 3] in real (Angstrom) units; mask: [B, L] bool or None.
    """
    if xyz.shape[1] < 2:
        return xyz
    d = xyz[:, 1:, :] - xyz[:, :-1, :]
    ln = safe_norm(d, keepdims=True)                       # [B, L-1, 1]
    direction = jnp.where(ln > 1e-6, d / jnp.maximum(ln, 1e-6),
                          jnp.array([0.0, 0.0, 1.0], xyz.dtype))
    clipped = jnp.clip(ln, lo, hi)
    ln_ste = ln + jax.lax.stop_gradient(clipped - ln)
    d_legal = direction * ln_ste
    if mask is not None:
        bond_real = (mask[:, 1:] & mask[:, :-1])[..., None]
        d_legal = jnp.where(bond_real, d_legal, d)
    rebuilt = xyz[:, :1, :] + jnp.cumsum(d_legal, axis=1)
    return jnp.concatenate([xyz[:, :1, :], rebuilt], axis=1)
