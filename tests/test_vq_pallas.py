"""Pallas nearest-code kernel: interpreter mode vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_vae_tpu.ops.vq_pallas import (
    nearest_codes_pallas,
    nearest_codes_xla,
)


@pytest.mark.parametrize("n,k,d", [(64, 32, 16), (100, 48, 24), (8, 200, 8)])
def test_pallas_interpret_matches_xla(n, k, d):
    kf, ke = jax.random.split(jax.random.PRNGKey(0))
    flat = jax.random.normal(kf, (n, d), jnp.float32)
    emb = jax.random.normal(ke, (k, d), jnp.float32)
    xi, xd1, xd2 = nearest_codes_xla(flat, emb)
    pi, pd1, pd2 = nearest_codes_pallas(flat, emb, block_n=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(pd1), np.asarray(xd1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(pd2), np.asarray(xd2), atol=1e-3)


def test_pallas_interpret_handles_duplicates():
    # identical codes: d1 == d2, idx = first occurrence
    emb = jnp.tile(jnp.arange(4, dtype=jnp.float32)[None, :], (6, 1))
    flat = jnp.arange(8, dtype=jnp.float32).reshape(2, 4)
    pi, pd1, pd2 = nearest_codes_pallas(flat, emb, block_n=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(pi), [0, 0])
    np.testing.assert_allclose(np.asarray(pd1), np.asarray(pd2))
