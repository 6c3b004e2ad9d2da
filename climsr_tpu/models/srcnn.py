# -*- coding: utf-8 -*-
"""SRCNN — 3-layer 9-1-5 CNN on pre-upscaled input.

Parity: reference ``climsr/models/srcnn.py`` (conv9->64, conv1->32, conv5->out,
ReLU between; no internal upsampling — the input pipeline feeds the
nearest-upscaled LR at HR size). Also used as the elevation/mask fusion head
inside ESRGAN and RCAN (``esrgan.py:87,100``, ``rcan.py:181,191``).

``pallas_bwd``: fusion-head mode (set by ESRGAN under ``use_pallas``) —
conv1's backward routes through the Pallas dX-to-channel-0 kernel
(ops/pallas/head_bwd.py; the round-5 profile's worst op, 9.1 -> ~5.6 ms at
the flagship training shape). Channels 1+ of conv1's input cotangent come
back ZERO, which is exact for the fusion head whose elevation/mask channels
are jit data inputs; leave it False anywhere those gradients could matter.
Parameters and the forward are identical either way.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from climsr_tpu.models.common import Dtype, TorchConv


class _Conv9Params(nn.Module):
    """conv1's parameters at TorchConv-compatible paths (``Conv_0/{kernel,bias}``)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        from climsr_tpu.models.common import make_torch_bias_init, torch_conv_kernel_init

        kernel = self.param(
            "kernel", torch_conv_kernel_init, (9, 9, in_features, self.features), jnp.float32
        )
        bias = self.param(
            "bias", make_torch_bias_init(81 * in_features), (self.features,), jnp.float32
        )
        return kernel, bias


class SRCNN(nn.Module):
    in_channels: int = 1  # kept for config parity; flax infers from input
    out_channels: int = 1
    dtype: Optional[Dtype] = None
    pallas_bwd: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.pallas_bwd:
            from climsr_tpu.ops.pallas.head_bwd import fusion_conv1

            class _Conv1(nn.Module):
                features: int
                dtype: Optional[Dtype] = None

                @nn.compact
                def __call__(self, v: jax.Array) -> jax.Array:
                    kernel, bias = _Conv9Params(self.features, name="Conv_0")(v.shape[-1])
                    dt = self.dtype or jnp.result_type(v.dtype, jnp.float32)
                    return fusion_conv1(v.astype(dt), kernel.astype(dt), bias.astype(dt))

            out = nn.relu(_Conv1(64, dtype=self.dtype, name="conv1")(x))
        else:
            out = nn.relu(TorchConv(64, kernel_size=9, padding=4, dtype=self.dtype, name="conv1")(x))
        out = nn.relu(TorchConv(32, kernel_size=1, padding=0, dtype=self.dtype, name="conv2")(out))
        out = TorchConv(self.out_channels, kernel_size=5, padding=2, dtype=self.dtype, name="conv3")(out)
        return out
