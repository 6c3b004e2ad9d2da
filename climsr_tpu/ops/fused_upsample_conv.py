# -*- coding: utf-8 -*-
"""Fused nearest-2x-upsample + 3x3 conv via phase decomposition (exact).

ESRGAN's upsampling head computes ``conv3x3(nearest_upsample(x, 2))``
(``esrgan.py:94-97``). On the upsampled grid each source pixel is duplicated
2x2, so the 3x3 conv at output phase (a, b) ∈ {0,1}² only sees a 2x2 window
of *source* pixels with weights summed from the original kernel:

    phase a=0 rows: taps (w[0], w[1]+w[2]) at source rows (i-1, i)
    phase a=1 rows: taps (w[0]+w[1], w[2]) at source rows (i, i+1)
    (same decomposition in the column dim)

Four 2x2 convs on the LR grid replace one 3x3 conv on the 2x-upsampled grid:
16 taps instead of 36 (2.25x fewer MACs) and no 4x-size intermediate in HBM.
The phase outputs interleave back with a pixel-shuffle-style reshape.

This is a *transformation of the same parameters* — gradients flow to the
original (3, 3, C, F) kernel, checkpoints stay interchangeable with the
naive path, and equality is exact up to float reassociation (tested).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _phase_kernels(w: jax.Array) -> Tuple[Tuple[jax.Array, ...], ...]:
    """(3,3,C,F) -> 2x2 grid of (2,2,C,F) phase kernels (row phase a, col phase b)."""
    # row direction: a=0 -> (w0, w1+w2); a=1 -> (w0+w1, w2)
    row0 = jnp.stack([w[0], w[1] + w[2]], axis=0)  # (2, 3, C, F) over original col index
    row1 = jnp.stack([w[0] + w[1], w[2]], axis=0)
    out = []
    for rw in (row0, row1):
        col0 = jnp.stack([rw[:, 0], rw[:, 1] + rw[:, 2]], axis=1)  # (2, 2, C, F)
        col1 = jnp.stack([rw[:, 0] + rw[:, 1], rw[:, 2]], axis=1)
        out.append((col0, col1))
    return tuple(out)


def _phase_outputs(x: jax.Array, kernel: jax.Array, precision) -> jax.Array:
    """Shared phase-conv loop -> (N, H, W, 2, 2, F) per-phase outputs."""
    n, h, w_sz, c = x.shape
    f = kernel.shape[-1]
    phases = _phase_kernels(kernel)
    dn = jax.lax.conv_dimension_numbers(x.shape, (2, 2, c, f), ("NHWC", "HWIO", "NHWC"))

    outs = []
    for a in (0, 1):
        for b in (0, 1):
            pk = phases[a][b]
            # phase a=0 needs source rows (i-1, i): pad top; a=1 needs (i, i+1): pad bottom
            pad = ((1 - a, a), (1 - b, b))
            y = jax.lax.conv_general_dilated(
                x, pk, (1, 1), pad, dimension_numbers=dn, precision=precision
            )
            outs.append(y)
    return jnp.stack(outs, axis=-2).reshape(n, h, w_sz, 2, 2, f)


def nearest_up2_conv3(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    precision=None,
) -> jax.Array:
    """Exactly ``conv3x3_same(nearest_upsample(x, 2))`` at ~2.25x fewer MACs.

    x: (N, H, W, C); kernel: (3, 3, C, F) HWIO; returns (N, 2H, 2W, F).
    """
    n, h, w_sz, _ = x.shape
    f = kernel.shape[-1]
    stacked = _phase_outputs(x, kernel, precision)
    # interleave: out[2i+a, 2j+b] = phase[a][b][i, j]
    out = stacked.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w_sz, f)
    if bias is not None:
        out = out + bias
    return out


def nearest_up2_conv3_t(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    precision=None,
) -> jax.Array:
    """As ``nearest_up2_conv3`` but emits the transposed lane layout
    ``(F, N*2H*2W)`` directly: the phase interleave and the channels-to-
    sublanes transpose collapse into one relayout instead of two (the input
    side of the ``fused_hr_tail`` Pallas kernel)."""
    n, h, w_sz, _ = x.shape
    f = kernel.shape[-1]
    stacked = _phase_outputs(x, kernel, precision)
    # target lane order (n, 2i+a, 2j+b) with channels leading
    out = stacked.transpose(5, 0, 1, 3, 2, 4).reshape(f, n * 2 * h * 2 * w_sz)
    if bias is not None:
        out = out + bias[:, None]
    return out
