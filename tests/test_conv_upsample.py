"""Decoder-pyramid upsampling forms (models/conv.py, VERDICT r3 #4).

All three modes must produce identical output shapes through the full
decoder so the A/B harness (benchmarks/decoder_upsample_ab.py) compares
like for like; the default stays "deconv" for upstream parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_vae_tpu.models import conv as convlib


@pytest.fixture(autouse=True)
def _restore_mode():
    prev = convlib.get_upsample()
    yield
    convlib.set_upsample_override(prev)


def test_default_is_deconv():
    assert convlib.get_upsample() == "deconv"


def test_override_validates():
    with pytest.raises(ValueError, match="upsample mode"):
        convlib.set_upsample_override("bilinear")


@pytest.mark.parametrize("mode", ["deconv", "pixel_shuffle", "resize"])
def test_decoder_shapes_match_across_modes(mode):
    convlib.set_upsample_override(mode)
    dec = convlib.ConvDecoder(hidden_dims=(8, 16), out_channels=3,
                              base_hw=2)
    z = jnp.ones((2, 12))
    v = dec.init(jax.random.PRNGKey(0), z, train=False)
    out, _ = dec.apply(v, z, train=True, mutable=["batch_stats"])
    # base 2x2, one pyramid block + the final block = 2 doublings -> 8x8
    assert out.shape == (2, 8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert float(jnp.abs(out).max()) <= 1.0  # tanh head


def test_pixel_shuffle_is_exact_depth_to_space():
    """The reshape/transpose in the pixel_shuffle block must place the
    4 sub-pixel channels at the right spatial offsets: feeding a conv
    weight that writes channel index as the value lets us check the
    2x2 interleave explicitly."""
    convlib.set_upsample_override("pixel_shuffle")
    blk = convlib.DeconvBlock(features=1)
    x = jnp.ones((1, 2, 2, 1))
    v = blk.init(jax.random.PRNGKey(0), x, train=False)
    # identity-ish conv: 1x1-like kernel embedded in 3x3, bias sets each
    # of the 4 output channels to a distinct constant
    k = np.zeros((3, 3, 1, 4), np.float32)
    b = np.array([0.0, 1.0, 2.0, 3.0], np.float32)
    params = dict(v["params"])
    params["ps_conv"] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
    out = blk.apply({"params": params,
                     "batch_stats": v["batch_stats"]}, x, train=False)
    # BN in inference mode with init stats (mean 0 var 1) + leaky_relu is
    # monotonic, so relative ordering of the 4 constants survives:
    # out[0, 2i+di, 2j+dj, 0] corresponds to channel 2*di+dj
    o = np.asarray(out)[0, :, :, 0]
    for di in range(2):
        for dj in range(2):
            block_vals = o[di::2, dj::2]
            assert np.allclose(block_vals, block_vals[0, 0]), (di, dj)
    # channel order: (di, dj) sub-pixel <- channel 2*di+dj, so with
    # biases [0,1,2,3] the four sub-pixels are strictly increasing in
    # row-major order
    vals = [o[0, 0], o[0, 1], o[1, 0], o[1, 1]]
    assert vals[0] < vals[1] < vals[2] < vals[3], vals
