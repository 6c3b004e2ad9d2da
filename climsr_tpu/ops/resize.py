# -*- coding: utf-8 -*-
"""Resize ops with cv2-compatible semantics, NHWC, jit-safe.

The reference generates LR tiles with ``cv2.INTER_NEAREST`` and baselines with
``cv2.INTER_CUBIC`` (``climsr/data/sr/climate_dataset.py:84-92``). For integer
factors cv2's nearest maps destination pixel ``d`` to source ``floor(d * s)``:

- integer downsample by ``s`` == top-left decimation ``x[..., ::s, ::s, :]``
  (verified against cv2 empirically),
- integer upsample by ``s`` == pixel repeat.

Both are implemented here as cheap, fusable XLA ops — no gather needed.
``resize_bicubic`` delegates to ``jax.image.resize`` (Keys cubic, a=-0.5 —
same kernel family as cv2's INTER_CUBIC; edge handling differs slightly, which
only affects the *cubic baseline metric*, never training data).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_downsample(x: jax.Array, factor: int) -> jax.Array:
    """Integer-factor nearest decimation over the H, W dims of NHWC (or HWC/HW)."""
    if factor == 1:
        return x
    if x.ndim == 2:
        return x[::factor, ::factor]
    if x.ndim == 3:
        return x[::factor, ::factor, :]
    return x[:, ::factor, ::factor, :]


def nearest_upsample(x: jax.Array, factor: int) -> jax.Array:
    """Integer-factor nearest (pixel-repeat) upsample over H, W of NHWC (or HWC/HW)."""
    if factor == 1:
        return x
    h_axis = x.ndim - 3 if x.ndim >= 3 else 0
    x = jnp.repeat(x, factor, axis=h_axis)
    x = jnp.repeat(x, factor, axis=h_axis + 1)
    return x


def resize_nearest(x: jax.Array, height: int, width: int) -> jax.Array:
    """General nearest resize to (height, width) with cv2 index mapping floor(d*s)."""
    h_axis = x.ndim - 3 if x.ndim >= 3 else 0
    src_h = x.shape[h_axis]
    src_w = x.shape[h_axis + 1]
    if src_h % height == 0 and src_w % width == 0 and src_h // height == src_w // width:
        return nearest_downsample(x, src_h // height)
    if height % src_h == 0 and width % src_w == 0 and height // src_h == width // src_w:
        return nearest_upsample(x, height // src_h)
    rows = jnp.floor(jnp.arange(height) * (src_h / height)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(width) * (src_w / width)).astype(jnp.int32)
    x = jnp.take(x, rows, axis=h_axis)
    x = jnp.take(x, cols, axis=h_axis + 1)
    return x


def resize_bicubic(x: jax.Array, height: int, width: int) -> jax.Array:
    """Bicubic resize over H, W (NHWC / HWC / HW) via jax.image (Keys a=-0.5 kernel)."""
    if x.ndim == 2:
        shape = (height, width)
    elif x.ndim == 3:
        shape = (height, width, x.shape[-1])
    else:
        shape = (x.shape[0], height, width, x.shape[-1])
    return jax.image.resize(x, shape, method="cubic")
