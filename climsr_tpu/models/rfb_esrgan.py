# -*- coding: utf-8 -*-
"""RFB-ESRGAN — generator with receptive-field blocks + VGG-style discriminator.

Parity: reference ``climsr/models/rfb_esrgan.py``:

- ``ReceptiveFieldBlock``: 4-branch dilated inception block + 1x1 merge,
  ``out*0.2 + shortcut``, optional LeakyReLU; kaiming-normal x0.1 init
  (``rfb_esrgan.py:262-267``),
- ``ReceptiveFieldDenseBlock`` (5 RFBs, dense concat) and its residual wrapper,
- its own bias-free ``ResidualDenseBlock``/RRDB variant (kaiming x0.1 init),
- generator: conv1 -> 16x RRDB Trunk-A -> 8x RRFDB Trunk-RFB -> skip add ->
  RFB -> [nearest x2, RFB, conv 256, lrelu, pixel-shuffle 2, RFB] per
  ``log4(scale)`` -> conv3 -> conv4 + tanh. Single input, no elev/mask fusion.
- ``RFBESRGANDiscriminator``: strided VGG features + BN + adaptive-avgpool to
  14x14 + FC(512*14*14 -> 1024 -> 1) + sigmoid. (Note: sigmoid output —
  pairing it with the GAN task's BCE-with-logits is a reference quirk.)
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from climsr_tpu.models.common import (
    Dtype,
    TorchBatchNorm,
    TorchConv,
    TorchDense,
    adaptive_avg_pool,
    kaiming_scaled_init,
    leaky_relu,
)
from climsr_tpu.ops.pixel_shuffle import pixel_shuffle
from climsr_tpu.ops.resize import nearest_upsample


class ReceptiveFieldBlock(nn.Module):
    in_channels: int
    out_channels: int
    scale_ratio: float = 0.2
    non_linearity: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        channels = self.in_channels // 4
        conv = partial(TorchConv, use_bias=False, kernel_init=kaiming_scaled_init(0.1), dtype=self.dtype)

        shortcut = conv(self.out_channels, kernel_size=1, padding=0, name="shortcut")(x)

        b1 = nn.relu(conv(channels, kernel_size=1, padding=0, name="b1_0")(x))
        b1 = conv(channels, kernel_size=3, name="b1_1")(b1)

        b2 = nn.relu(conv(channels, kernel_size=1, padding=0, name="b2_0")(x))
        b2 = nn.relu(conv(channels, kernel_size=(1, 3), padding=(0, 1), name="b2_1")(b2))
        b2 = conv(channels, kernel_size=3, dilation=3, name="b2_2")(b2)

        b3 = nn.relu(conv(channels, kernel_size=1, padding=0, name="b3_0")(x))
        b3 = nn.relu(conv(channels, kernel_size=(3, 1), padding=(1, 0), name="b3_1")(b3))
        b3 = conv(channels, kernel_size=3, dilation=3, name="b3_2")(b3)

        b4 = nn.relu(conv(channels // 2, kernel_size=1, padding=0, name="b4_0")(x))
        b4 = nn.relu(conv((channels // 4) * 3, kernel_size=(1, 3), padding=(0, 1), name="b4_1")(b4))
        b4 = nn.relu(conv(channels, kernel_size=(1, 3), padding=(0, 1), name="b4_2")(b4))
        b4 = conv(channels, kernel_size=3, dilation=5, name="b4_3")(b4)

        out = jnp.concatenate([b1, b2, b3, b4], axis=-1)
        out = conv(self.out_channels, kernel_size=1, padding=0, name="conv1x1")(out)
        out = out * self.scale_ratio + shortcut
        if self.non_linearity:
            out = leaky_relu(out)
        return out


class ReceptiveFieldDenseBlock(nn.Module):
    in_channels: int = 64
    growth_channels: int = 32
    scale_ratio: float = 0.2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        rfb = partial(ReceptiveFieldBlock, scale_ratio=self.scale_ratio, dtype=self.dtype)
        ic, gc = self.in_channels, self.growth_channels
        r1 = rfb(ic, gc, name="RFB1")(x)
        r2 = rfb(ic + gc, gc, name="RFB2")(jnp.concatenate([x, r1], axis=-1))
        r3 = rfb(ic + 2 * gc, gc, name="RFB3")(jnp.concatenate([x, r1, r2], axis=-1))
        r4 = rfb(ic + 3 * gc, gc, name="RFB4")(jnp.concatenate([x, r1, r2, r3], axis=-1))
        r5 = ReceptiveFieldBlock(
            ic + 4 * gc, ic, self.scale_ratio, non_linearity=False, dtype=self.dtype, name="RFB5"
        )(jnp.concatenate([x, r1, r2, r3, r4], axis=-1))
        return r5 * self.scale_ratio + x


class ResidualOfReceptiveFieldDenseBlock(nn.Module):
    in_channels: int = 64
    growth_channels: int = 32
    scale_ratio: float = 0.2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = ReceptiveFieldDenseBlock(self.in_channels, self.growth_channels, self.scale_ratio, self.dtype, name="RFDB1")(x)
        out = ReceptiveFieldDenseBlock(self.in_channels, self.growth_channels, self.scale_ratio, self.dtype, name="RFDB2")(out)
        out = ReceptiveFieldDenseBlock(self.in_channels, self.growth_channels, self.scale_ratio, self.dtype, name="RFDB3")(out)
        return out * self.scale_ratio + x


class RFBResidualDenseBlock(nn.Module):
    """RFB-ESRGAN's bias-free RDB variant with kaiming x0.1 init (rfb_esrgan.py:358-412)."""

    in_channels: int = 64
    growth_channels: int = 32
    scale_ratio: float = 0.2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        conv = partial(
            TorchConv, kernel_size=3, use_bias=False, kernel_init=kaiming_scaled_init(0.1), dtype=self.dtype
        )
        gc = self.growth_channels
        c1 = leaky_relu(conv(gc, name="conv1")(x))
        c2 = leaky_relu(conv(gc, name="conv2")(jnp.concatenate([x, c1], axis=-1)))
        c3 = leaky_relu(conv(gc, name="conv3")(jnp.concatenate([x, c1, c2], axis=-1)))
        c4 = leaky_relu(conv(gc, name="conv4")(jnp.concatenate([x, c1, c2, c3], axis=-1)))
        c5 = conv(self.in_channels, name="conv5")(jnp.concatenate([x, c1, c2, c3, c4], axis=-1))
        return c5 * self.scale_ratio + x


class RFBResidualInResidualDenseBlock(nn.Module):
    in_channels: int = 64
    growth_channels: int = 32
    scale_ratio: float = 0.2
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = RFBResidualDenseBlock(self.in_channels, self.growth_channels, self.scale_ratio, self.dtype, name="RDB1")(x)
        out = RFBResidualDenseBlock(self.in_channels, self.growth_channels, self.scale_ratio, self.dtype, name="RDB2")(out)
        out = RFBResidualDenseBlock(self.in_channels, self.growth_channels, self.scale_ratio, self.dtype, name="RDB3")(out)
        return out * self.scale_ratio + x


class RFBESRGANGenerator(nn.Module):
    in_channels: int = 3
    out_channels: int = 1
    scaling_factor: int = 4
    num_rrdb_blocks: int = 16
    num_rrfdb_blocks: int = 8
    remat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        import math

        # each upsampling block is x4 (reference rfb_esrgan.py:90,111-121);
        # guard non-power-of-4 factors — int(log(2,4))==0 would silently
        # return an LR-sized output
        if 4 ** int(round(math.log(self.scaling_factor, 4))) != self.scaling_factor:
            raise NotImplementedError(
                f"RFB-ESRGAN upsamples in x4 blocks; scaling_factor={self.scaling_factor} unsupported"
            )
        num_upsample_block = int(round(math.log(self.scaling_factor, 4)))
        conv_nb = partial(TorchConv, use_bias=False, dtype=self.dtype)
        rrdb_cls = nn.remat(RFBResidualInResidualDenseBlock) if self.remat else RFBResidualInResidualDenseBlock
        rrfdb_cls = nn.remat(ResidualOfReceptiveFieldDenseBlock) if self.remat else ResidualOfReceptiveFieldDenseBlock

        out1 = conv_nb(64, kernel_size=3, name="conv1")(x)
        out = out1
        for i in range(self.num_rrdb_blocks):
            out = rrdb_cls(64, 32, 0.2, self.dtype, name=f"trunk_a_{i}")(out)
        for i in range(self.num_rrfdb_blocks):
            out = rrfdb_cls(64, 32, 0.2, self.dtype, name=f"trunk_rfb_{i}")(out)
        out = out1 + out
        out = ReceptiveFieldBlock(64, 64, non_linearity=False, dtype=self.dtype, name="RFB")(out)

        for i in range(num_upsample_block):
            out = nearest_upsample(out, 2)
            out = ReceptiveFieldBlock(64, 64, dtype=self.dtype, name=f"up_{i}_rfb1")(out)
            out = leaky_relu(conv_nb(256, kernel_size=3, name=f"up_{i}_conv")(out))
            out = pixel_shuffle(out, 2)
            out = ReceptiveFieldBlock(64, 64, dtype=self.dtype, name=f"up_{i}_rfb2")(out)

        out = leaky_relu(conv_nb(64, kernel_size=3, name="conv3")(out))
        out = jnp.tanh(conv_nb(self.out_channels, kernel_size=3, name="conv4")(out))
        return out


class RFBESRGANDiscriminator(nn.Module):
    in_channels: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        conv = partial(TorchConv, kernel_size=3, use_bias=False, dtype=self.dtype)
        bn = partial(TorchBatchNorm, use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)

        out = leaky_relu(conv(64, name="conv0")(x))
        out = leaky_relu(bn(name="bn1")(conv(64, strides=2, name="conv1")(out)))
        out = leaky_relu(bn(name="bn2")(conv(128, name="conv2")(out)))
        out = leaky_relu(bn(name="bn3")(conv(128, strides=2, name="conv3")(out)))
        out = leaky_relu(bn(name="bn4")(conv(256, name="conv4")(out)))
        out = leaky_relu(bn(name="bn5")(conv(256, strides=2, name="conv5")(out)))
        out = leaky_relu(bn(name="bn6")(conv(512, name="conv6")(out)))
        out = leaky_relu(bn(name="bn7")(conv(512, strides=2, name="conv7")(out)))

        out = adaptive_avg_pool(out, (14, 14))
        # torch flattens NCHW (C major); transpose so FC weights see the same order
        out = out.transpose(0, 3, 1, 2).reshape(out.shape[0], -1)
        out = leaky_relu(TorchDense(1024, dtype=self.dtype, name="fc1")(out))
        out = nn.sigmoid(TorchDense(1, dtype=self.dtype, name="fc2")(out))
        return out
