"""Masked reduction helpers shared by the curve loss family.

All functions take a boolean mask with True = valid position and are safe for
fully-padded rows (denominators are clamped to >= 1). Semantics match the
reference's masked means (models/vq_vae.py:903-941).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

EPS = 1e-8


def mse_per_sample(a: jnp.ndarray, b: jnp.ndarray,
                   mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Per-sample mean over positions of the summed-over-xyz squared error.

    a, b: [B, L, 3]; mask: [B, L] bool or None. Returns [B].
    (reference: VQVAE._mse_per_sample, models/vq_vae.py:903-910)
    """
    diff2 = jnp.sum((a - b) ** 2, axis=-1)  # [B, L]
    if mask is None:
        return jnp.mean(diff2, axis=1)
    m = mask.astype(diff2.dtype)
    den = jnp.clip(jnp.sum(m, axis=1), 1.0, None)
    return jnp.sum(diff2 * m, axis=1) / den


def masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean of x over positions where mask is True. x and mask same shape."""
    if mask is None:
        return jnp.mean(x)
    m = mask.astype(x.dtype)
    den = jnp.clip(jnp.sum(m), 1.0, None)
    return jnp.sum(x * m) / den


def masked_mse(a: jnp.ndarray, b: jnp.ndarray,
               mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Elementwise MSE with a [B, L] mask broadcast over the last dim.

    (reference: VQVAE._masked_mse, models/vq_vae.py:912-918)
    """
    diff = (a - b) ** 2
    if mask is None:
        return jnp.mean(diff)
    m = mask[..., None].astype(diff.dtype)
    den = jnp.clip(jnp.sum(m), 1.0, None)
    return jnp.sum(diff * m) / den


def center(x: jnp.ndarray, mask: Optional[jnp.ndarray]):
    """Mask-aware centering over the length axis; returns (x - mu, mu).

    x: [B, L, 3]. (reference: VQVAE._center, models/vq_vae.py:933-941)
    """
    if mask is None:
        mu = jnp.mean(x, axis=1, keepdims=True)
        return x - mu, mu
    m = mask.astype(x.dtype)[..., None]
    den = jnp.clip(jnp.sum(m, axis=1, keepdims=True), 1.0, None)
    mu = jnp.sum(x * m, axis=1, keepdims=True) / den
    return x - mu, mu


def pair_mask(mask: Optional[jnp.ndarray], k: int) -> Optional[jnp.ndarray]:
    """AND of k consecutive mask positions: m[:, i] & ... & m[:, i+k-1].

    Used for bond (k=2), angle (k=3), dihedral (k=4), frenet (k=5) windows.
    Returns [B, L-k+1] or None.
    """
    if mask is None:
        return None
    out = mask[:, : mask.shape[1] - k + 1]
    for d in range(1, k):
        out = out & mask[:, d : mask.shape[1] - k + 1 + d]
    return out


def safe_norm(v: jnp.ndarray, axis: int = -1,
              keepdims: bool = False) -> jnp.ndarray:
    """L2 norm with a finite gradient at 0.

    jnp.linalg.norm's gradient at exactly-coincident points is NaN (0/0);
    torch returns a 0 subgradient there, so the reference never hit this.
    With bf16 activations upstream, adjacent decoded points CAN be
    bit-equal, so every differentiable norm in the loss uses this form
    (the 1e-24 shift changes values by < 1e-12).
    """
    return jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=keepdims) + 1e-24)


def unit(v: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Normalize along the last axis (reference: _unit, models/vq_vae.py:328)."""
    return v / (safe_norm(v, keepdims=True) + eps)
