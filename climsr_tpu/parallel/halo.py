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
- :func:`spatial_sharded_model_forward` — the *training*-grade variant: a
  differentiable H-sharded generator forward (params are a traced input, so
  ``jax.grad`` flows through the ``ppermute`` halo exchange — its transpose
  is the reverse ppermute over ICI, and the replicated-params input
  transposes to the cross-device gradient psum). This is the conv-net
  analogue of sequence/context parallelism applied to *training* on frames
  too large for one chip's step budget (the reference's europe-extent
  452x452 fine-tune, SURVEY.md §5.7 — which it can only train unsharded on
  a single GPU).
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
    if halo <= 0:  # x[:, -0:] would select the WHOLE shard, not zero rows
        return x
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
    if kh % 2 == 0:
        raise ValueError(f"sharded_conv2d requires an odd kernel height for 'same' geometry, got {kh}")
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
    if halo <= 0:  # x[:, -0:] / x[:, 1:1] slicing breaks down at halo=0
        return x_local
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


def spatial_sharded_model_forward(
    model,
    generator_type: str,
    mesh: Mesh,
    axis: str = "spatial",
    halo: int = 8,
    scale: int = 4,
    batch_axis: str | None = None,
):
    """Differentiable H-sharded generator forward for spatial-shard training.

    Returns ``fwd(params, lr, elevation=None, mask=None) -> sr`` over global
    NHWC arrays. Each device holds an H-slice of the frame (plus the batch
    slice when ``batch_axis`` is set), pads it with ``halo`` rows from its
    mesh neighbors (reflect at the frame edges — matching the unsharded
    model's implicit zero/SAME geometry only approximately there, exactly in
    the interior), applies the generator locally, and crops back. Heights
    that don't divide the axis size are reflect-padded up front and the
    output is cropped to the true ``H * out_scale`` — so the europe-extent
    113-row LR frames work on any mesh.

    Exact (fwd AND grad) when ``halo`` covers the generator's receptive
    field; for the deep RRDB trunks a partial halo is an approximation whose
    error decays geometrically with depth (residual scale 0.2). Because
    ``params`` is a traced, replicated input of the ``shard_map``, autodiff
    yields the true gradient of the sharded forward: the halo ``ppermute``
    transposes to the reverse ppermute and the replicated input transposes
    to a cross-device psum — XLA schedules both over ICI.

    Constraint: the local shard must keep more rows than the halo
    (``H // axis_size > halo`` at every input scale); asserted at trace time.
    """
    from climsr_tpu.models import FUSION_GENERATORS, PRE_UPSCALED_GENERATORS

    n = mesh.shape[axis]
    fusion = generator_type in FUSION_GENERATORS
    out_scale = 1 if generator_type in PRE_UPSCALED_GENERATORS else scale
    in_scales = (1, scale, scale) if fusion else (1,)
    pspec = P(batch_axis, axis, None, None)

    # Models with GLOBAL pooling (RCAN's channel attention) would silently
    # pool their local shard instead of the frame. Such modules expose
    # `spatial_axis`/`spatial_halo`/`spatial_pad` attrs; cloning them in
    # makes the pool a halo-masked psum over the mesh axis — exact, same
    # params. The clone happens inside fwd(), where the non-divisible-height
    # reflect padding is known, so the phantom bottom rows are masked too.
    supports_global_pool = hasattr(model, "spatial_axis")

    def fwd(params, lr, elevation=None, mask=None):
        h = lr.shape[1]
        pad = (-h) % n
        if pad:
            lr = jnp.pad(lr, ((0, 0), (0, pad), (0, 0), (0, 0)), mode="reflect")
            if fusion:
                hpad = ((0, 0), (0, pad * scale), (0, 0), (0, 0))
                elevation = jnp.pad(elevation, hpad, mode="reflect")
                mask = jnp.pad(mask, hpad, mode="reflect")
        assert lr.shape[1] // n > halo, (
            f"spatial shard too thin: {lr.shape[1]} rows / {n} shards leaves "
            f"{lr.shape[1] // n} <= halo={halo}; lower spatial_halo or the axis size"
        )
        inputs = (lr, elevation, mask) if fusion else (lr,)
        mdl = (
            model.clone(spatial_axis=axis, spatial_halo=halo, spatial_pad=pad)
            if supports_global_pool
            else model
        )

        def local(p, *xs):
            padded = [_halo_pad_reflect(x, halo * s, axis) for x, s in zip(xs, in_scales)]
            out = mdl.apply({"params": p}, *padded)
            return out[:, halo * out_scale : out.shape[1] - halo * out_scale]

        param_specs = jax.tree_util.tree_map(lambda _: P(), params)
        out = shard_map(
            local,
            mesh=mesh,
            in_specs=(param_specs,) + tuple(pspec for _ in inputs),
            out_specs=pspec,
        )(params, *inputs)
        return out[:, : h * out_scale]

    return fwd
