"""CheapDropout tests: rate statistics, unbiasedness, determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_vae_tpu.models.layers import CheapDropout


def _apply(rate, x, key, deterministic=False):
    m = CheapDropout(rate=rate)
    return m.apply({}, x, deterministic, rngs={"dropout": key})


def test_deterministic_is_identity():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 64))
    y = _apply(0.5, x, jax.random.PRNGKey(1), deterministic=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
    y0 = _apply(0.0, x, jax.random.PRNGKey(1), deterministic=False)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(x))


def test_drop_rate_matches_quantized_rate():
    x = jnp.ones((512, 512))
    for rate in (0.1, 0.25, 0.5):
        y = np.asarray(_apply(rate, x, jax.random.PRNGKey(2)))
        actual = round(rate * 256) / 256
        dropped = float((y == 0).mean())
        assert abs(dropped - actual) < 0.01, (rate, dropped)


def test_unbiased_expectation():
    x = jnp.full((1024, 1024), 3.0)
    y = np.asarray(_apply(0.1, x, jax.random.PRNGKey(3)))
    # E[y] == x despite the 1/256 rate quantization
    assert abs(y.mean() - 3.0) < 0.02


def test_same_key_same_mask():
    x = jax.random.normal(jax.random.PRNGKey(4), (32, 32))
    a = _apply(0.3, x, jax.random.PRNGKey(5))
    b = _apply(0.3, x, jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = _apply(0.3, x, jax.random.PRNGKey(6))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_gradient_flows_through_kept_elements():
    x = jnp.ones((64, 64))

    def f(x):
        return jnp.sum(_apply(0.5, x, jax.random.PRNGKey(7)))

    g = np.asarray(jax.grad(f)(x))
    kept = g > 0
    scale = 1.0 / (1.0 - round(0.5 * 256) / 256)
    np.testing.assert_allclose(g[kept], scale, rtol=1e-6)
    np.testing.assert_array_equal(g[~kept], 0.0)
