# -*- coding: utf-8 -*-
"""DRLN — Densely Residual Laplacian Network (single-input generator).

Parity: reference ``climsr/models/drln.py``: 20 dense-residual ``Block``s with
cascading concat wiring, per-triple residual anchors (a1..a6), pixel-shuffle
upsampling, conv tail. Reference quirks reproduced deliberately:

- ``self.c4`` exists but is never applied (``drln.py:296-300``: ``b5`` reads
  ``a1``, and ``c5`` concatenates ``[c4_cat, b5]`` without an ``o4``). We
  simply don't create the unused conv — the *computation graph* is identical;
  a parameter that never receives gradients is dead weight.
- groups 5 and 6 have four blocks (c16/c20 see 5x channels).

DRLN's CA layer uses a 3x3 conv on the 1x1 pooled map (zero-padded) — kept.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from climsr_tpu.models.common import Dtype, TorchConv, global_avg_pool
from climsr_tpu.ops.pixel_shuffle import pixel_shuffle


class BasicBlock(nn.Module):
    features: int
    ksize: int = 3
    pad: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.pad if self.pad is not None else self.ksize // 2
        return nn.relu(TorchConv(self.features, kernel_size=self.ksize, padding=pad, dtype=self.dtype)(x))


class ResidualBlock(nn.Module):
    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = nn.relu(TorchConv(self.features, kernel_size=3, dtype=self.dtype, name="conv1")(x))
        out = TorchConv(self.features, kernel_size=3, dtype=self.dtype, name="conv2")(out)
        return nn.relu(out + x)


class DRLNCALayer(nn.Module):
    channel: int
    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = global_avg_pool(x)
        y = BasicBlock((self.channel // self.reduction) * 3, ksize=1, pad=0, dtype=self.dtype, name="c1")(y)
        # 3x3 sigmoid conv on the 1x1 pooled map, zero padding (drln.py:188)
        y = nn.sigmoid(TorchConv(self.channel, kernel_size=3, padding=1, dtype=self.dtype, name="c4")(y))
        return x * y


class Block(nn.Module):
    """Dense residual block: 3 growing ResidualBlocks + 1x1 compress + CA (drln.py:197-221)."""

    channels: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c0 = x
        r1 = ResidualBlock(self.channels, self.dtype, name="r1")(c0)
        c1 = jnp.concatenate([c0, r1], axis=-1)
        r2 = ResidualBlock(self.channels * 2, self.dtype, name="r2")(c1)
        c2 = jnp.concatenate([c1, r2], axis=-1)
        r3 = ResidualBlock(self.channels * 4, self.dtype, name="r3")(c2)
        c3 = jnp.concatenate([c2, r3], axis=-1)
        g = BasicBlock(self.channels, ksize=1, pad=0, dtype=self.dtype, name="g")(c3)
        return DRLNCALayer(self.channels, dtype=self.dtype, name="ca")(g)


class UpsampleBlock(nn.Module):
    n_channels: int
    scale: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.scale in (2, 4, 8):
            n_steps = self.scale.bit_length() - 1
            for i in range(n_steps):
                x = nn.relu(TorchConv(4 * self.n_channels, kernel_size=3, dtype=self.dtype, name=f"conv_{i}")(x))
                x = pixel_shuffle(x, 2)
        elif self.scale == 3:
            x = nn.relu(TorchConv(9 * self.n_channels, kernel_size=3, dtype=self.dtype, name="conv_0")(x))
            x = pixel_shuffle(x, 3)
        else:
            raise NotImplementedError(f"Unsupported scale {self.scale}")
        return x


class DRLN(nn.Module):
    in_channels: int = 1
    out_channels: int = 1
    scaling_factor: int = 4
    channels: int = 64
    remat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ch = self.channels
        block_cls = nn.remat(Block) if self.remat else Block
        block = lambda i: block_cls(ch, self.dtype, name=f"b{i}")  # noqa: E731
        comp = lambda i: BasicBlock(ch, ksize=3, dtype=self.dtype, name=f"c{i}")  # noqa: E731

        x = TorchConv(ch, kernel_size=3, dtype=self.dtype, name="head")(x)
        c0 = x

        # group 1: b1-b3, anchor a1
        b1 = block(1)(c0)
        c1 = jnp.concatenate([c0, b1], axis=-1)
        o1 = comp(1)(c1)
        b2 = block(2)(o1)
        c2 = jnp.concatenate([c1, b2], axis=-1)
        o2 = comp(2)(c2)
        b3 = block(3)(o2)
        c3 = jnp.concatenate([c2, b3], axis=-1)
        o3 = comp(3)(c3)
        a1 = o3 + c0

        # group 2: b4-b6 — reference quirk: no o4; b5 reads a1 (drln.py:295-305)
        b4 = block(4)(a1)
        c4 = jnp.concatenate([o3, b4], axis=-1)
        b5 = block(5)(a1)
        c5 = jnp.concatenate([c4, b5], axis=-1)
        o5 = comp(5)(c5)
        b6 = block(6)(o5)
        c6 = jnp.concatenate([c5, b6], axis=-1)
        o6 = comp(6)(c6)
        a2 = o6 + a1

        # group 3: b7-b9
        b7 = block(7)(a2)
        c7 = jnp.concatenate([o6, b7], axis=-1)
        o7 = comp(7)(c7)
        b8 = block(8)(o7)
        c8 = jnp.concatenate([c7, b8], axis=-1)
        o8 = comp(8)(c8)
        b9 = block(9)(o8)
        c9 = jnp.concatenate([c8, b9], axis=-1)
        o9 = comp(9)(c9)
        a3 = o9 + a2

        # group 4: b10-b12
        b10 = block(10)(a3)
        c10 = jnp.concatenate([o9, b10], axis=-1)
        o10 = comp(10)(c10)
        b11 = block(11)(o10)
        c11 = jnp.concatenate([c10, b11], axis=-1)
        o11 = comp(11)(c11)
        b12 = block(12)(o11)
        c12 = jnp.concatenate([c11, b12], axis=-1)
        o12 = comp(12)(c12)
        a4 = o12 + a3

        # group 5: b13-b16 (four blocks; c16 sees 5x channels)
        b13 = block(13)(a4)
        c13 = jnp.concatenate([o12, b13], axis=-1)
        o13 = comp(13)(c13)
        b14 = block(14)(o13)
        c14 = jnp.concatenate([c13, b14], axis=-1)
        o14 = comp(14)(c14)
        b15 = block(15)(o14)
        c15 = jnp.concatenate([c14, b15], axis=-1)
        o15 = comp(15)(c15)
        b16 = block(16)(o15)
        c16 = jnp.concatenate([c15, b16], axis=-1)
        o16 = comp(16)(c16)
        a5 = o16 + a4

        # group 6: b17-b20
        b17 = block(17)(a5)
        c17 = jnp.concatenate([o16, b17], axis=-1)
        o17 = comp(17)(c17)
        b18 = block(18)(o17)
        c18 = jnp.concatenate([c17, b18], axis=-1)
        o18 = comp(18)(c18)
        b19 = block(19)(o18)
        c19 = jnp.concatenate([c18, b19], axis=-1)
        o19 = comp(19)(c19)
        b20 = block(20)(o19)
        c20 = jnp.concatenate([c19, b20], axis=-1)
        o20 = comp(20)(c20)
        a6 = o20 + a5

        b_out = a6 + x
        out = UpsampleBlock(ch, self.scaling_factor, self.dtype, name="upsample")(b_out)
        out = TorchConv(self.out_channels, kernel_size=3, dtype=self.dtype, name="tail")(out)
        return out
