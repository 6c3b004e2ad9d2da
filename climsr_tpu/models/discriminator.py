# -*- coding: utf-8 -*-
"""ESRGAN discriminator — reflection-pad conv stack, logits output.

Parity: reference ``climsr/models/discriminator.py``: 4 blocks of
[reflect-pad conv3 + LeakyReLU(0.01 default) + BatchNorm, reflect-pad strided
conv3 + LeakyReLU], then two unpadded convs + flatten + Linear(8192,100) +
Linear(100,1). Outputs *logits* (relativistic BCE-with-logits loss).

Reference quirks reproduced:

- the defined-but-never-called ``AdaptiveAvgPool2d((512,512))`` is omitted
  (it is dead code in the reference ``forward``, ``discriminator.py:42-46``),
- the reference's flatten → Linear(8192, ...) is only shape-consistent for
  128x128 inputs at out_channels=64 (torch errors on anything else); here
  flax infers fc1 from the actual flatten size — other geometries work (the
  test suite trains a 16-channel variant) but warn at trace time that they
  cannot round-trip to the reference's fixed fc1.
- first LeakyReLU per block uses torch's default slope 0.01 (``nn.LeakyReLU()``),
  the strided one as well; only the head convs use slope 0.2.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
from flax import linen as nn

from climsr_tpu.models.common import Dtype, TorchBatchNorm, TorchConv, TorchDense, reflect_pad_2d


class Discriminator(nn.Module):
    in_channels: int = 1
    out_channels: int = 64
    num_conv_block: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True) -> jax.Array:
        conv = partial(TorchConv, kernel_size=3, padding=0, dtype=self.dtype)
        bn = partial(TorchBatchNorm, use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=self.dtype)

        features = self.out_channels
        for i in range(self.num_conv_block):
            x = reflect_pad_2d(x, 1)
            x = nn.leaky_relu(conv(features, name=f"block{i}_conv1")(x), negative_slope=0.01)
            x = bn(name=f"block{i}_bn")(x)
            x = reflect_pad_2d(x, 1)
            x = nn.leaky_relu(conv(features, strides=2, name=f"block{i}_conv2")(x), negative_slope=0.01)
            features *= 2
        features //= 2

        x = nn.leaky_relu(conv(features, name="head_conv1")(x), negative_slope=0.2)
        x = conv(features, name="head_conv2")(x)

        # torch flattens NCHW; transpose to match the weight ordering
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        if x.shape[-1] != 8192:
            # the reference hardcodes Linear(8192, 100) (only shape-consistent
            # with 128px HR tiles at out_channels=64, where it would ERROR on
            # any other size); flax infers fc1 from the actual flatten size,
            # which is deliberate flexibility — but such a checkpoint cannot
            # interop with the reference, so say so once at trace time
            import logging

            logging.getLogger(__name__).warning(
                "Discriminator fc1 fan-in %d != 8192: valid here, but this geometry "
                "cannot round-trip to the reference's fixed Linear(8192, 100)", x.shape[-1]
            )
        x = TorchDense(100, dtype=self.dtype, name="fc1")(x)
        x = TorchDense(1, dtype=self.dtype, name="fc2")(x)
        return x
