"""Kabsch alignment tests: exact recovery, chirality, masking, grad-stop."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_vae_tpu.ops.geometry import random_rotation
from pytorch_vae_tpu.ops.kabsch import apply_rt, kabsch_rt
from pytorch_vae_tpu.ops.masking import mse_per_sample


def _random_curve(key, B, L):
    return jax.random.normal(key, (B, L, 3)) * 3.0


def _rigid(R, a, t=0.0):
    """Apply R x + t in float64 numpy (exact up to f32 storage)."""
    out = np.einsum(
        "bij,blj->bli", np.asarray(R, np.float64), np.asarray(a, np.float64)
    ) + np.asarray(t, np.float64)
    return jnp.asarray(out.astype(np.float32))


def test_kabsch_recovers_rigid_transform():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    a = _random_curve(k1, 4, 32)
    R_true = random_rotation(k2, 4)
    t_true = jax.random.normal(k3, (4, 1, 3)) * 5.0
    b = _rigid(R_true, a, np.asarray(t_true))
    R, t, ok = kabsch_rt(a, b, None)
    assert bool(jnp.all(ok))
    aligned = apply_rt(a, R, t)
    np.testing.assert_allclose(np.asarray(aligned), np.asarray(b), atol=1e-3)
    # rotations must be proper (det +1), never reflections
    np.testing.assert_allclose(np.asarray(jnp.linalg.det(R)), 1.0, atol=1e-5)


def test_kabsch_masked_ignores_padding():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    a = _random_curve(k1, 2, 20)
    R_true = random_rotation(k2, 2)
    b = _rigid(R_true, a)
    # poison the padded region of both curves
    mask = jnp.arange(20)[None, :] < jnp.array([15, 10])[:, None]
    a_bad = jnp.where(mask[..., None], a, 999.0)
    b_bad = jnp.where(mask[..., None], b, -777.0)
    R, t, ok = kabsch_rt(a_bad, b_bad, mask)
    aligned = apply_rt(a_bad, R, t)
    err = mse_per_sample(aligned, b_bad, mask)
    np.testing.assert_allclose(np.asarray(err), 0.0, atol=1e-3)


def test_kabsch_reflection_not_allowed():
    a = _random_curve(jax.random.PRNGKey(2), 1, 16)
    b = a.at[..., 0].multiply(-1.0)  # mirror image
    R, t, ok = kabsch_rt(a, b, None)
    assert bool(jnp.all(ok))
    assert float(jnp.linalg.det(R)[0]) > 0.99  # proper rotation forced


def test_kabsch_handles_nonfinite_input():
    a = _random_curve(jax.random.PRNGKey(3), 2, 8)
    b = a.at[0, 0, 0].set(jnp.nan)
    R, t, ok = kabsch_rt(a, b, None)
    assert not bool(ok[0])
    assert bool(ok[1])
    np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t[0]), 0.0, atol=1e-6)


def test_kabsch_is_gradient_stopped():
    a = _random_curve(jax.random.PRNGKey(4), 1, 12)
    b = _random_curve(jax.random.PRNGKey(5), 1, 12)

    def f(x):
        R, t, _ = kabsch_rt(x, b, None)
        return jnp.sum(R) + jnp.sum(t)

    g = jax.grad(f)(a)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=0)
