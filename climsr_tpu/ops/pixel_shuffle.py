# -*- coding: utf-8 -*-
"""Depth-to-space (pixel shuffle) for NHWC with torch-compatible channel order.

Matches ``torch.nn.PixelShuffle`` semantics translated to NHWC:
``out[n, h*r + i, w*r + j, c] = in[n, h, w, c*r*r + i*r + j]``.

XLA lowers the reshape+transpose to a single efficient copy; no Pallas needed
for this op in isolation (it fuses with the producing conv).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_shuffle(x: jax.Array, factor: int) -> jax.Array:
    """NHWC depth-to-space: (N, H, W, C*r^2) -> (N, H*r, W*r, C)."""
    n, h, w, c = x.shape
    r = factor
    oc = c // (r * r)
    x = x.reshape(n, h, w, oc, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r_i, w, r_j, oc
    return x.reshape(n, h * r, w * r, oc)


def pixel_unshuffle(x: jax.Array, factor: int) -> jax.Array:
    """NHWC space-to-depth: (N, H*r, W*r, C) -> (N, H, W, C*r^2)."""
    n, hh, ww, c = x.shape
    r = factor
    h, w = hh // r, ww // r
    x = x.reshape(n, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h, w, c, r_i, r_j
    return x.reshape(n, h, w, c * r * r)


def space_to_depth_input(x: jax.Array, factor: int) -> jax.Array:
    """Alias used by input-space-to-depth conv optimizations."""
    return pixel_unshuffle(x, factor)
