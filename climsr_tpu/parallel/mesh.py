# -*- coding: utf-8 -*-
"""Device mesh + sharding helpers: the framework's distributed backbone.

TPU-native replacement for the reference's whole distributed-strategy matrix
(PL DDP/NCCL, fairscale sharded DDP, DeepSpeed ZeRO, torch-xla ``tpu_cores`` —
SURVEY.md §2b): one ``jax.sharding.Mesh`` with a ``data`` axis; the train step
is a single ``jax.jit`` whose in/out shardings put the batch on the data axis
and parameters replicated (DP) or optimizer state sharded over ``data``
(ZeRO-1 analogue). XLA inserts the psum/all-gather collectives over ICI.

Multi-host: ``jax.distributed.initialize`` + the same mesh over
``jax.devices()`` — the data axis then spans DCN automatically.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(num_devices: Optional[int] = None, axes: Tuple[str, ...] = ("data",)) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if len(axes) == 1:
        shape: Sequence[int] = (n,)
    elif len(axes) == 2:
        # favor the data axis; model/spatial axis gets the remainder
        import math

        spatial = math.gcd(n, 2) if n % 2 == 0 else 1
        shape = (n // spatial, spatial)
    else:
        raise ValueError(f"Unsupported mesh axes: {axes}")
    return Mesh(np.asarray(devices).reshape(shape), axes)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-dim (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_leading_dim_if_divisible(pytree, mesh: Mesh, axis: str = "data", min_size: int = 2**14):
    """Sharding pytree for ZeRO-1-style optimizer-state partitioning.

    Returns a pytree of NamedShardings: leaves whose leading dim divides the
    axis size (and are big enough to be worth scattering) are sharded on it;
    the rest stay replicated. Applied to optimizer state this is exactly the
    fairscale/DeepSpeed stage-1 capability the reference exposes via
    ``conf/plugins/sharded.yaml`` / ``deepspeed.yaml``.
    """
    axis_size = mesh.shape[axis]
    repl = replicated(mesh)
    sharded = NamedSharding(mesh, P(axis))

    def rule(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.size >= min_size and leaf.shape[0] % axis_size == 0:
            return NamedSharding(mesh, P(*([axis] + [None] * (leaf.ndim - 1))))
        return repl

    del sharded
    return jax.tree_util.tree_map(rule, pytree)


def put_replicated(pytree, mesh: Mesh):
    return jax.device_put(pytree, replicated(mesh))
