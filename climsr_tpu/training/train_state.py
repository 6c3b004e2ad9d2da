# -*- coding: utf-8 -*-
"""Train-state pytrees for the two tasks (pixel pre-training and GAN)."""
from __future__ import annotations

from typing import Any, Optional

import jax
from flax import struct


@struct.dataclass
class TrainState:
    """Generator-only state (pixel-loss pre-training task)."""

    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        import jax.numpy as jnp

        return cls(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params))


@struct.dataclass
class GANTrainState:
    """Generator + discriminator state (relativistic GAN task).

    ``d_batch_stats`` carries the discriminator's BatchNorm running stats —
    the flax equivalent of torch BN buffers updated during both the G and D
    sub-steps (reference ``pl_gan.py:63-97``).
    """

    step: jax.Array
    g_params: Any
    g_opt_state: Any
    d_params: Any
    d_opt_state: Any
    d_batch_stats: Any = None

    @classmethod
    def create(cls, g_params, g_tx, d_params, d_tx, d_batch_stats=None):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            g_opt_state=g_tx.init(g_params),
            d_params=d_params,
            d_opt_state=d_tx.init(d_params),
            d_batch_stats=d_batch_stats,
        )


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree_util.tree_leaves(params))


def cast_floating(tree, dtype) -> Any:
    import jax.numpy as jnp

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def maybe(x: Optional[Any], default: Any) -> Any:
    return default if x is None else x
