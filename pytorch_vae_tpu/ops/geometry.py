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
