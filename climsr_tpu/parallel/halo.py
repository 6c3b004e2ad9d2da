# -*- coding: utf-8 -*-
"""Spatially-sharded convolution via halo exchange (shard_map + ppermute).

The reference's only "large input" axis is spatial (452x452 europe frames,
1440x2880 whole-globe SR — SURVEY.md §5.7); its stack has no model
parallelism at all. The TPU-native analogue of sequence/context parallelism
for conv nets is *spatial sharding*: split the H dimension of a frame across
the mesh, exchange ``halo`` boundary rows with neighbors over ICI
(``lax.ppermute``), and run convs locally.

Two levels are provided:

- :func:`halo_exchange_pad` / :func:`sharded_conv2d` — exact per-layer halo
  exchange for a single conv (building block; exactness tested against the
  unsharded op),
- :func:`spatial_sharded_apply` — whole-generator sharding with a single
  up-front halo of ``halo`` LR rows: each device SRs its slice + halo locally
  and crops. Exact when ``halo`` covers the receptive field; in practice a
  32-64 row halo makes seams numerically negligible for the RRDB models
  (residual weights 0.2 decay long-range contributions geometrically).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def halo_exchange_pad(x: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Pad the local H-shard (N, Hl, W, C) with neighbor rows; zeros at edges."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    # bottom rows of the previous shard arrive as our top halo
    from_prev = jax.lax.ppermute(x[:, -halo:], axis_name, [(i, (i + 1) % n) for i in range(n)])
    # top rows of the next shard arrive as our bottom halo
    from_next = jax.lax.ppermute(x[:, :halo], axis_name, [(i, (i - 1) % n) for i in range(n)])
    from_prev = jnp.where(idx == 0, jnp.zeros_like(from_prev), from_prev)
    from_next = jnp.where(idx == n - 1, jnp.zeros_like(from_next), from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=1)


def _conv2d_same_w_valid_h(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """NHWC conv, VALID on H (halo already attached), SAME (zero) on W."""
    kh, kw = kernel.shape[0], kernel.shape[1]
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(0, 0), (kw // 2, kw // 2)], dimension_numbers=dn
    )


def sharded_conv2d(x: jax.Array, kernel: jax.Array, mesh: Mesh, axis_name: str = "data") -> jax.Array:
    """Exact 'same'-padded conv over an H-sharded NHWC array.

    x: global (N, H, W, C) array sharded P(None, axis) on H (or replicated —
    shard_map slices it). kernel: (kh, kw, Cin, Cout) replicated.
    """
    kh = kernel.shape[0]
    halo = kh // 2

    def local(x_local, k):
        padded = halo_exchange_pad(x_local, halo, axis_name)
        return _conv2d_same_w_valid_h(padded, k)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis_name, None, None), P(None, None, None, None)),
        out_specs=P(None, axis_name, None, None),
    )(x, kernel)


def _halo_pad_reflect(x_local: jax.Array, halo: int, axis_name: str) -> jax.Array:
    """Local H-shard + ``halo`` neighbor rows (reflect at the frame edges)."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    from_prev = jax.lax.ppermute(x_local[:, -halo:], axis_name, [(i, (i + 1) % n) for i in range(n)])
    from_next = jax.lax.ppermute(x_local[:, :halo], axis_name, [(i, (i - 1) % n) for i in range(n)])
    # edge devices: reflect their own rows instead of wrapped data
    reflect_top = x_local[:, 1 : halo + 1][:, ::-1]
    reflect_bot = x_local[:, -halo - 1 : -1][:, ::-1]
    from_prev = jnp.where(idx == 0, reflect_top, from_prev)
    from_next = jnp.where(idx == n - 1, reflect_bot, from_next)
    return jnp.concatenate([from_prev, x_local, from_next], axis=1)


def spatial_sharded_apply(
    fn: Callable[[jax.Array], jax.Array],
    mesh: Mesh,
    axis_name: str = "data",
    halo: int = 32,
    scale: int = 4,
) -> Callable[[jax.Array], jax.Array]:
    """Wrap a whole-frame SR fn to run H-sharded over the mesh.

    Each device receives its H-slice plus ``halo`` rows from each neighbor
    (edge devices get reflect padding instead), applies ``fn`` locally at
    (Hl + 2*halo) rows, and crops the central ``Hl * scale`` rows back.
    One exchange total — the per-layer traffic of exact halo convs is traded
    for ``2*halo`` rows of redundant compute per device.
    """
    return spatial_sharded_apply_multi(fn, mesh, axis_name=axis_name, halo=halo, scale=scale)


def spatial_sharded_apply_multi(
    fn: Callable[..., jax.Array],
    mesh: Mesh,
    axis_name: str = "data",
    halo: int = 32,
    scale: int = 4,
    input_scales: tuple = (1,),
) -> Callable[..., jax.Array]:
    """Multi-input variant of :func:`spatial_sharded_apply`.

    ``fn(*inputs)`` takes NHWC tensors whose H dimensions are related by
    ``input_scales`` (e.g. an ESRGAN fusion forward takes LR at scale 1 plus
    elevation/mask at the HR scale): input ``i`` is H-sharded over the mesh
    and padded with ``halo * input_scales[i]`` rows so all local views stay
    geometrically aligned. The output (at ``scale``x the first input) is
    cropped back to its shard.

    This is the user-reachable whole-globe path behind
    ``inference.spatial_shard=true`` (see inference/run.py): a 1440x2880
    output frame is produced jointly by all chips with one ppermute exchange
    over ICI, the conv-net analogue of sequence/context parallelism.
    """

    def local(*xs_local):
        padded = [
            _halo_pad_reflect(x, halo * s, axis_name) for x, s in zip(xs_local, input_scales)
        ]
        out = fn(*padded)
        return out[:, halo * scale : out.shape[1] - halo * scale]

    n_in = len(input_scales)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(P(None, axis_name, None, None) for _ in range(n_in)),
        out_specs=P(None, axis_name, None, None),
    )
