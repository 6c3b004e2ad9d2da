# -*- coding: utf-8 -*-
"""RCAN — Residual Channel Attention Network with elev/mask fusion SRCNN head.

Parity: reference ``climsr/models/rcan.py``:

- ``CALayer``: squeeze-excite channel attention (global pool -> 1x1 reduce ->
  ReLU -> 1x1 expand -> sigmoid -> scale),
- ``RCAB``: conv-act-conv + CA, residual,
- ``ResidualGroup``: n_resblocks RCABs + conv, residual,
- net: head conv -> n_resgroups groups + conv, global residual -> pixel-shuffle
  upsampler tail -> out conv -> fusion ``SRCNN(concat(x, elev, mask))``
  (``rcan.py:191``).

The reference's lenient ``load_state_dict`` (tail-mismatch tolerant,
``rcan.py:195-219``) maps to the checkpoint layer's partial-restore logic.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from climsr_tpu.models.common import Dtype, TorchConv, global_avg_pool
from climsr_tpu.models.srcnn import SRCNN
from climsr_tpu.ops.pixel_shuffle import pixel_shuffle


class CALayer(nn.Module):
    """Squeeze-excite channel attention (global pool over H, W).

    ``spatial_axis``: when the surrounding forward is H-sharded over a mesh
    axis (parallel/halo.py ``spatial_sharded_model_forward``), the global
    average must span the WHOLE frame, not the local shard — otherwise every
    shard gates its channels on different statistics (measured 3e-2 max
    output deviation at the europe geometry). With the axis set, the pool is
    a halo-masked local sum + ``lax.psum`` over ICI: each original row is
    counted exactly once (every shard's local view is
    [halo | own rows | halo], so zeroing ``spatial_halo`` rows at both ends
    is shard-index-independent), making the attention exact up to reduction
    order. ``spatial_pad`` covers non-divisible frame heights: the forward
    reflect-pads the frame bottom to a multiple of the axis size, and those
    phantom rows sit at the end of the LAST shard's own region — they are
    masked out conditionally on ``lax.axis_index`` so the pooled mean spans
    exactly the original rows. Params are unchanged — the same checkpoint
    serves both modes.
    """

    channel: int
    reduction: int = 16
    dtype: Optional[Dtype] = None
    spatial_axis: Optional[str] = None
    spatial_halo: int = 0
    spatial_pad: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.spatial_axis is None:
            y = global_avg_pool(x)
        else:
            h = x.shape[1]
            rows = jnp.arange(h)
            row_w = ((rows >= self.spatial_halo) & (rows < h - self.spatial_halo)).astype(x.dtype)
            if self.spatial_pad:
                idx = jax.lax.axis_index(self.spatial_axis)
                n_shards = jax.lax.psum(1, self.spatial_axis)
                phantom = (rows >= h - self.spatial_halo - self.spatial_pad) & (
                    rows < h - self.spatial_halo
                )
                row_w = jnp.where((idx == n_shards - 1) & phantom, 0.0, row_w)
            s = jnp.sum(x * row_w[None, :, None, None], axis=(1, 2), keepdims=True)
            c = jnp.sum(row_w) * x.shape[2]
            y = jax.lax.psum(s, self.spatial_axis) / jax.lax.psum(c, self.spatial_axis)
        y = nn.relu(TorchConv(self.channel // self.reduction, kernel_size=1, padding=0, dtype=self.dtype, name="du1")(y))
        y = nn.sigmoid(TorchConv(self.channel, kernel_size=1, padding=0, dtype=self.dtype, name="du2")(y))
        return x * y


class RCAB(nn.Module):
    n_feat: int
    kernel_size: int = 3
    reduction: int = 16
    dtype: Optional[Dtype] = None
    spatial_axis: Optional[str] = None
    spatial_halo: int = 0
    spatial_pad: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        conv = partial(TorchConv, kernel_size=self.kernel_size, dtype=self.dtype)
        res = nn.relu(conv(self.n_feat, name="conv1")(x))
        res = conv(self.n_feat, name="conv2")(res)
        res = CALayer(
            self.n_feat, self.reduction, self.dtype,
            spatial_axis=self.spatial_axis, spatial_halo=self.spatial_halo,
            spatial_pad=self.spatial_pad, name="ca",
        )(res)
        return res + x


class ResidualGroup(nn.Module):
    n_feat: int
    kernel_size: int = 3
    reduction: int = 16
    n_resblocks: int = 20
    dtype: Optional[Dtype] = None
    spatial_axis: Optional[str] = None
    spatial_halo: int = 0
    spatial_pad: int = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        res = x
        for i in range(self.n_resblocks):
            res = RCAB(
                self.n_feat, self.kernel_size, self.reduction, self.dtype,
                spatial_axis=self.spatial_axis, spatial_halo=self.spatial_halo,
                spatial_pad=self.spatial_pad,
                name=f"rcab_{i}",
            )(res)
        res = TorchConv(self.n_feat, kernel_size=self.kernel_size, dtype=self.dtype, name="conv_tail")(res)
        return res + x


class Upsampler(nn.Module):
    """Pixel-shuffle upsampler for power-of-two (or 3x) scales (``rcan.py:17-47``)."""

    scale: int
    n_feat: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if (self.scale & (self.scale - 1)) == 0:
            n_steps = self.scale.bit_length() - 1
            for i in range(n_steps):
                x = TorchConv(4 * self.n_feat, kernel_size=3, dtype=self.dtype, name=f"conv_{i}")(x)
                x = pixel_shuffle(x, 2)
        elif self.scale == 3:
            x = TorchConv(9 * self.n_feat, kernel_size=3, dtype=self.dtype, name="conv_0")(x)
            x = pixel_shuffle(x, 3)
        else:
            raise NotImplementedError(f"Unsupported scale {self.scale}")
        return x


class RCAN(nn.Module):
    n_resgroups: int = 10
    n_resblocks: int = 20
    n_feats: int = 64
    reduction: int = 16
    scaling_factor: int = 4
    in_channels: int = 3
    out_channels: int = 1
    remat: bool = False
    dtype: Optional[Dtype] = None
    # set by spatial_sharded_model_forward (model.clone) when the forward is
    # H-sharded: channel-attention pooling then spans the whole frame via
    # psum instead of the local shard (see CALayer docstring); spatial_pad
    # excludes the bottom reflect-pad rows of non-divisible frame heights
    spatial_axis: Optional[str] = None
    spatial_halo: int = 0
    spatial_pad: int = 0

    @nn.compact
    def __call__(self, x: jax.Array, elev: jax.Array, mask: jax.Array) -> jax.Array:
        kernel_size = 3
        group_cls = nn.remat(ResidualGroup) if self.remat else ResidualGroup

        x = TorchConv(self.n_feats, kernel_size=kernel_size, dtype=self.dtype, name="head")(x)

        res = x
        for i in range(self.n_resgroups):
            res = group_cls(
                self.n_feats, kernel_size, self.reduction, self.n_resblocks, self.dtype,
                spatial_axis=self.spatial_axis, spatial_halo=self.spatial_halo,
                spatial_pad=self.spatial_pad,
                name=f"group_{i}",
            )(res)
        res = TorchConv(self.n_feats, kernel_size=kernel_size, dtype=self.dtype, name="body_tail")(res)
        res = res + x

        x = Upsampler(self.scaling_factor, self.n_feats, self.dtype, name="upsampler")(res)
        x = TorchConv(self.out_channels, kernel_size=kernel_size, dtype=self.dtype, name="tail_conv")(x)

        x = SRCNN(in_channels=3, out_channels=self.out_channels, dtype=self.dtype, name="srcnn")(
            jnp.concatenate([x, elev.astype(x.dtype), mask.astype(x.dtype)], axis=-1)
        )
        return x
