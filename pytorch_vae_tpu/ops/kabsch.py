"""Branchless, batched Kabsch alignment for TPU.

The reference computes an optimal rigid alignment inside the loss with a
no-grad SVD plus try/except fallbacks (models/vq_vae.py:943-969). Under jit
we make every guard branchless:

  - det-sign fix via a diagonal correction built with jnp.where,
  - non-finite results replaced by identity R / zero t, with an `ok` flag,
  - the whole computation wrapped in stop_gradient (the reference detaches
    R and t, so gradients flow only through the aligned-coordinate MSE).

SVD of [B, 3, 3] batches is tiny; XLA maps it to a batched 3x3 routine.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .masking import center


def kabsch_rt(
    a_xyz: jnp.ndarray,
    b_xyz: jnp.ndarray,
    mask: Optional[jnp.ndarray],
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Optimal rigid transform (R, t) minimizing ||a @ R + t - b|| per sample.

    a_xyz, b_xyz: [B, L, 3]; mask: [B, L] bool or None.
    Returns (R [B,3,3], t [B,1,3], ok [B] bool), all gradient-stopped.
    Convention matches the reference: apply as `a @ R + t`
    (models/vq_vae.py:967-969).
    """
    a32 = jax.lax.stop_gradient(a_xyz).astype(jnp.float32)
    b32 = jax.lax.stop_gradient(b_xyz).astype(jnp.float32)
    B = a32.shape[0]

    a_c, a_mu = center(a32, mask)
    b_c, b_mu = center(b32, mask)
    # NOTE: full-f32 precision is mandatory here — the default matmul
    # precision lowers einsum operands to bf16 on TPU, which corrupts the
    # covariance enough to break rigid-transform recovery.
    hp = jax.lax.Precision.HIGHEST
    if mask is not None:
        m = mask.astype(a_c.dtype)[..., None]
        H = jnp.einsum("bli,blj->bij", a_c * m, b_c, precision=hp)
    else:
        H = jnp.einsum("bli,blj->bij", a_c, b_c, precision=hp)

    # Guard the SVD input itself: a non-finite H would poison the whole batch.
    h_ok = jnp.all(jnp.isfinite(H), axis=(1, 2))
    H_safe = jnp.where(h_ok[:, None, None], H, jnp.eye(3, dtype=H.dtype))

    U, _, Vh = jnp.linalg.svd(H_safe, full_matrices=False)
    det = jnp.linalg.det(jnp.einsum("bij,bjk->bik", U, Vh, precision=hp))
    sign = jnp.where(det >= 0, 1.0, -1.0).astype(H.dtype)
    # U @ diag(1, 1, sign) @ Vh, with the diagonal folded into U's last column
    U_adj = U.at[:, :, 2].multiply(sign[:, None])
    R = jnp.einsum("bij,bjk->bik", U_adj, Vh, precision=hp)
    t = b_mu - jnp.einsum("bli,bij->blj", a_mu, R,
                          precision=jax.lax.Precision.HIGHEST)

    ok = (
        h_ok
        & jnp.all(jnp.isfinite(R), axis=(1, 2))
        & jnp.all(jnp.isfinite(t), axis=(1, 2))
    )
    eyeR = jnp.tile(jnp.eye(3, dtype=R.dtype)[None], (B, 1, 1))
    R = jnp.where(ok[:, None, None], R, eyeR)
    t = jnp.where(ok[:, None, None], t, jnp.zeros_like(t))
    return (
        jax.lax.stop_gradient(R),
        jax.lax.stop_gradient(t),
        jax.lax.stop_gradient(ok),
    )


def apply_rt(x: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Apply a rigid transform: x [B,L,3] @ R [B,3,3] + t [B,1,3]."""
    y = jnp.einsum("bli,bij->blj", x, R.astype(x.dtype),
                   precision=jax.lax.Precision.HIGHEST)
    return y + t.astype(x.dtype)
