"""Shared convolutional encoder/decoder stacks for the image zoo.

TPU-native layout: NHWC tensors (the native TPU convolution layout),
Conv -> BatchNorm -> LeakyReLU blocks at strides of 2, mirroring the
upstream zoo's stacks (hidden_dims [32, 64, 128, 256, 512] over 64x64
inputs -> 2x2x512 features). BatchNorm running stats live in the
"batch_stats" collection; under pjit the batch axis is global, so the
statistics are synchronized across chips by construction.

Compute dtype is configurable (bfloat16 for throughput on the MXU);
normalization statistics and loss reductions stay float32.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

DEFAULT_HIDDEN_DIMS = (32, 64, 128, 256, 512)

# Upsampling form for the decoder pyramid (A/B lever, VERDICT r3 #4: the
# deconv stack is the HBM-bound cost that caps MIWAE and every zoo row).
#   deconv         nn.ConvTranspose stride 2 (default; mirrors the
#                  upstream zoo's nn.ConvTranspose2d)
#   pixel_shuffle  3x3 conv to 4F channels at the LOW resolution +
#                  depth-to-space — the same useful FLOPs expressed as a
#                  standard conv XLA tiles directly onto the MXU, with no
#                  input-dilation zero work
#   resize         nearest 2x upsample + 3x3 conv (4x the conv FLOPs of
#                  pixel_shuffle, classic checkerboard-free form)
# Module-level override (same pattern as layers.set_dense2d) so the A/B
# harness can flip modes without threading a knob through 12 zoo models;
# PVT_DECODER_UPSAMPLE env var seeds it at import.
import os as _os

_UPSAMPLE: str = _os.environ.get("PVT_DECODER_UPSAMPLE", "deconv")

_UPSAMPLE_MODES = ("deconv", "pixel_shuffle", "resize")


def set_upsample_override(value: str) -> None:
    global _UPSAMPLE
    if value not in _UPSAMPLE_MODES:
        raise ValueError(f"upsample mode {value!r} not in {_UPSAMPLE_MODES}")
    _UPSAMPLE = value


def get_upsample() -> str:
    return _UPSAMPLE


class ConvBlock(nn.Module):
    features: int
    stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), dtype=self.dtype,
            kernel_init=nn.with_logical_partitioning(
                nn.initializers.kaiming_normal(), (None, None, None, "mlp")),
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32,
        )(x)
        return nn.leaky_relu(x, 0.01)


class DeconvBlock(nn.Module):
    """One 2x upsampling block of the decoder pyramid.

    The upsampling FORM is selected by the module-level override (see
    _UPSAMPLE above): all three modes produce [B, 2H, 2W, features] and
    feed the same BatchNorm -> LeakyReLU tail; they differ only in how
    the 2x spatial growth maps onto the hardware.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mode = get_upsample()
        kinit = nn.with_logical_partitioning(
            nn.initializers.kaiming_normal(), (None, None, None, "mlp"))
        if mode == "pixel_shuffle":
            B, H, W, _ = x.shape
            x = nn.Conv(self.features * 4, (3, 3),
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        kernel_init=kinit, name="ps_conv")(x)
            # depth-to-space [B,H,W,4F] -> [B,2H,2W,F]: pure reshape/
            # transpose, fused by XLA into the conv's output layout
            x = x.reshape(B, H, W, 2, 2, self.features)
            x = x.transpose(0, 1, 3, 2, 4, 5)
            x = x.reshape(B, 2 * H, 2 * W, self.features)
        elif mode == "resize":
            B, H, W, C = x.shape
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, kernel_init=kinit,
                        name="rs_conv")(x)
        else:
            x = nn.ConvTranspose(
                self.features, (3, 3), strides=(2, 2),
                padding="SAME", transpose_kernel=False,
                dtype=self.dtype, kernel_init=kinit,
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32,
        )(x)
        return nn.leaky_relu(x, 0.01)


class ConvEncoder(nn.Module):
    """Strided conv trunk -> flat feature vector [B, F]."""

    hidden_dims: Sequence[int] = DEFAULT_HIDDEN_DIMS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for h in self.hidden_dims:
            x = ConvBlock(h, dtype=self.dtype)(x, train=train)
        return x.reshape(x.shape[0], -1)


class ConvDecoder(nn.Module):
    """Latent vector -> NHWC image in [-1, 1] (tanh head).

    Mirrors the zoo decoder: Linear -> reshape 2x2 -> deconv pyramid ->
    final deconv + 3x3 conv -> tanh.
    """

    hidden_dims: Sequence[int] = DEFAULT_HIDDEN_DIMS
    out_channels: int = 3
    base_hw: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = False):
        dims = list(self.hidden_dims)[::-1]  # [512, 256, 128, 64, 32]
        B = z.shape[0]
        x = nn.Dense(dims[0] * self.base_hw * self.base_hw,
                     dtype=self.dtype, name="decoder_input")(z)
        x = x.reshape(B, self.base_hw, self.base_hw, dims[0])
        for h in dims[1:]:
            x = DeconvBlock(h, dtype=self.dtype)(x, train=train)
        x = DeconvBlock(dims[-1], dtype=self.dtype)(x, train=train)
        x = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="final_conv")(x)
        # tanh in the compute dtype: under bf16 the [B, H, W, C] output is
        # the decoder's dominant HBM write (15x per image for MIWAE);
        # loss reductions upcast to f32 at the consumer, so only the
        # stored activation narrows, not the loss math
        return nn.tanh(x)


def encoder_output_dim(hidden_dims: Sequence[int], image_size: int) -> Tuple[int, int]:
    """(flat feature dim, spatial size) after the strided trunk."""
    hw = image_size // (2 ** len(hidden_dims))
    hw = max(hw, 1)
    return hidden_dims[-1] * hw * hw, hw
