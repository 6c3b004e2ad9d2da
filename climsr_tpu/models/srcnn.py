# -*- coding: utf-8 -*-
"""SRCNN — 3-layer 9-1-5 CNN on pre-upscaled input.

Parity: reference ``climsr/models/srcnn.py`` (conv9->64, conv1->32, conv5->out,
ReLU between; no internal upsampling — the input pipeline feeds the
nearest-upscaled LR at HR size). Also used as the elevation/mask fusion head
inside ESRGAN and RCAN (``esrgan.py:87,100``, ``rcan.py:181,191``).
"""
from __future__ import annotations

from typing import Optional

import jax
from flax import linen as nn

from climsr_tpu.models.common import Dtype, TorchConv


class SRCNN(nn.Module):
    in_channels: int = 1  # kept for config parity; flax infers from input
    out_channels: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = nn.relu(TorchConv(64, kernel_size=9, padding=4, dtype=self.dtype, name="conv1")(x))
        out = nn.relu(TorchConv(32, kernel_size=1, padding=0, dtype=self.dtype, name="conv2")(out))
        out = TorchConv(self.out_channels, kernel_size=5, padding=2, dtype=self.dtype, name="conv3")(out)
        return out
