# -*- coding: utf-8 -*-
"""Shared building blocks for the model zoo (NHWC, bf16-friendly).

Conventions:

- All modules take/produce NHWC; compute dtype is a module arg (``dtype``),
  params stay float32 (``param_dtype``) — the standard TPU mixed-precision
  policy (bf16 activations through the MXU, f32 master weights).
- ``TorchConv`` reproduces ``torch.nn.Conv2d`` defaults: explicit symmetric
  padding k//2 and kaiming-uniform(a=sqrt(5)) init == U(±1/sqrt(fan_in)) for
  both kernel and bias, so training dynamics match the reference models
  (which rely on torch default init, e.g. ``climsr/models/esrgan.py:22-27``).
- ``kaiming_scaled_init`` reproduces the RFB-ESRGAN ``kaiming_normal_`` then
  ``*= 0.1`` residual-friendly init (``climsr/models/rfb_esrgan.py:262-267``).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """U(-b, b) with b = 1/sqrt(fan_in); flax HWIO kernel shape (kh, kw, in, out)."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_scaled_init(scale: float = 0.1):
    """torch ``kaiming_normal_`` (fan_in, relu gain) scaled by ``scale``."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] * shape[1] * shape[2]
        std = math.sqrt(2.0 / fan_in)
        return jax.random.normal(key, shape, dtype) * (std * scale)

    return init


class TorchConv(nn.Module):
    """Conv2d with torch-default init and explicit k//2 ('same'-style) padding."""

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: int = 1
    padding: Optional[Union[int, Tuple[int, int]]] = None  # default: k//2 per dim
    dilation: int = 1
    use_bias: bool = True
    feature_group_count: int = 1
    kernel_init: Optional[Callable] = None
    dtype: Optional[Dtype] = None
    # Negative result (measured, round 5): re-emitting 1x1 convs as
    # dot_general — motivated by the head conv2 backward's ~6 TF/s conv
    # emitter — changed the flagship TRAIN step not at all (94.4 ms/step
    # both ways once the Pallas fusion-head dX kernel landed) and REGRESSED
    # inference 10% (15.7 -> 17.4 ms/iter at bs=128: the dot breaks the
    # conv-conv fusion XLA builds through the head), while its different
    # f32 reduction order also pushed the GAN twin-training endpoint past
    # its drift bound on CPU. Keep nn.Conv for every kernel size.

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ks = self.kernel_size if isinstance(self.kernel_size, tuple) else (self.kernel_size, self.kernel_size)
        if self.padding is None:
            pad: Sequence[Tuple[int, int]] = [(k // 2 * self.dilation, k // 2 * self.dilation) for k in ks]
        elif isinstance(self.padding, int):
            pad = [(self.padding, self.padding)] * 2
        else:
            pad = [(p, p) for p in self.padding]
        in_features = x.shape[-1]
        fan_in = ks[0] * ks[1] * (in_features // self.feature_group_count)
        kernel_init = self.kernel_init or torch_conv_kernel_init
        return nn.Conv(
            features=self.features,
            kernel_size=ks,
            strides=(self.strides, self.strides),
            padding=pad,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            kernel_init=kernel_init,
            bias_init=make_torch_bias_init(fan_in),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class TorchDense(nn.Module):
    """Linear with torch-default init."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        fan_in = x.shape[-1]
        bound = 1.0 / math.sqrt(fan_in)

        def kinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=kinit,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class TorchBatchNorm(nn.Module):
    """BatchNorm2d with exact ``torch.nn.BatchNorm2d`` train-mode semantics.

    Differences vs ``flax.linen.BatchNorm`` that matter for checkpoint
    interop and the f64 gradient-golden parity tests
    (tests/test_training_parity.py):

    - the running **variance** is updated with the *unbiased* batch variance
      (``n/(n-1)`` correction, n = N*H*W per channel), while normalization in
      train mode uses the biased one — exactly torch's split,
    - ``momentum`` follows the flax convention (retain rate of the old
      stats); 0.9 here == torch ``momentum=0.1``.

    Param/collection names match ``nn.BatchNorm`` ("scale"/"bias",
    batch_stats "mean"/"var") so the torch state-dict importer and existing
    checkpoints are unaffected.
    """

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        features = x.shape[-1]
        stat_dtype = jnp.promote_types(jnp.float32, x.dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), stat_dtype)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), stat_dtype)
        )
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)

        if self.use_running_average:
            mean = ra_mean.value.astype(stat_dtype)
            var = ra_var.value.astype(stat_dtype)
        else:
            xs = x.astype(stat_dtype)
            mean = jnp.mean(xs, axis=(0, 1, 2))
            var = jnp.mean(jnp.square(xs - mean), axis=(0, 1, 2))  # biased
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * unbiased

        out_dtype = self.dtype or x.dtype
        inv = jax.lax.rsqrt(var + self.epsilon) * scale.astype(stat_dtype)
        y = (x.astype(stat_dtype) - mean) * inv + bias.astype(stat_dtype)
        return y.astype(out_dtype)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return nn.leaky_relu(x, negative_slope=negative_slope)


def global_avg_pool(x: jax.Array) -> jax.Array:
    """NHWC global average pool to (N, 1, 1, C) — AdaptiveAvgPool2d(1) analogue.

    Negative result (measured, round 5): re-emitting this as a ones-vector
    matmul changes nothing — XLA's algebraic simplifier rewrites
    ``dot(ones/P, X)`` back into the same multiply+reduce, and standalone
    both forms run at 20 us for RCAN's [16,113,113,64] pool. The 567 us
    "reduce" ops in RCAN's in-model profile are fusions carrying the
    neighboring conv epilogue, not the pool itself (scripts/bench_rcan.py
    docstring has the full attribution).
    """
    return jnp.mean(x, axis=(1, 2), keepdims=True)


def adaptive_avg_pool(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """General torch ``AdaptiveAvgPool2d`` for NHWC.

    output[i] = mean(input[floor(i*H/oh) : ceil((i+1)*H/oh)]) per dim. For
    upsampling targets (oh > H, used by RFBESRGANDiscriminator 8x8 -> 14x14,
    reference ``rfb_esrgan.py:54``) windows of size 1 duplicate rows — torch
    does the same.
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    if oh == 1 and ow == 1:
        return global_avg_pool(x)

    def pool_axis(arr, axis, in_size, out_size):
        starts = [int(math.floor(i * in_size / out_size)) for i in range(out_size)]
        ends = [int(math.ceil((i + 1) * in_size / out_size)) for i in range(out_size)]
        slices = [
            jnp.mean(jax.lax.slice_in_dim(arr, s, e, axis=axis), axis=axis, keepdims=True)
            for s, e in zip(starts, ends)
        ]
        return jnp.concatenate(slices, axis=axis)

    x = pool_axis(x, 1, h, oh)
    x = pool_axis(x, 2, w, ow)
    return x


def reflect_pad_2d(x: jax.Array, pad: int = 1) -> jax.Array:
    """ReflectionPad2d for NHWC."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
