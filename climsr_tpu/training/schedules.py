# -*- coding: utf-8 -*-
"""Learning-rate schedules matching the reference's scheduler config group.

Parity: ``conf/schedulers/*.yaml`` + the HuggingFace ``transformers`` schedule
family the reference instantiates (``climsr/core/instantiator.py:51-64``) and
torch ``OneCycleLR`` (``conf/schedulers/one_cycle_schedule.yaml``):

- constant / constant_with_warmup / linear_with_warmup /
  cosine_with_warmup (num_cycles) / cosine_with_hard_restarts_with_warmup /
  polynomial_decay_with_warmup (power, lr_end),
- one_cycle: cos-anneal up from ``max_lr/div_factor`` over ``pct_start`` of
  the run, then cos-anneal down to ``max_lr/div_factor/final_div_factor``.
  torch OneCycleLR defaults to ``cycle_momentum=True`` and co-anneals the
  optimizer's momentum (Adam's beta1) INVERSELY to the lr — max_momentum at
  the ends, base_momentum at the peak. The reference's scheduler yaml leaves
  that default on, so its generators train with a cycled beta1;
  ``one_cycle_momentum_schedule`` reproduces it (wired into the optimizer via
  ``build_optimizer(b1_schedule=...)``).

All return ``optax.Schedule`` (step -> lr). ``resolve_schedule`` also applies
the reference's warmup semantics: float ``num_warmup_steps`` < 1 is a fraction
of ``num_training_steps`` (``climsr/core/task.py:85-92``).
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import optax

from climsr_tpu.config.schemas import SchedulerConfig


def constant_schedule(lr: float) -> optax.Schedule:
    return lambda step: lr


def constant_schedule_with_warmup(lr: float, num_warmup_steps: int) -> optax.Schedule:
    def schedule(step):
        warm = jnp.maximum(1, num_warmup_steps)
        return lr * jnp.minimum(1.0, (step + 1) / warm)

    return schedule


def linear_schedule_with_warmup(lr: float, num_warmup_steps: int, num_training_steps: int) -> optax.Schedule:
    def schedule(step):
        warm = jnp.maximum(1, num_warmup_steps)
        warmup = (step + 1) / warm
        decay = jnp.maximum(0.0, (num_training_steps - step) / jnp.maximum(1, num_training_steps - num_warmup_steps))
        return lr * jnp.where(step < num_warmup_steps, warmup, decay)

    return schedule


def cosine_schedule_with_warmup(
    lr: float, num_warmup_steps: int, num_training_steps: int, num_cycles: float = 0.5
) -> optax.Schedule:
    def schedule(step):
        warm = jnp.maximum(1, num_warmup_steps)
        warmup = (step + 1) / warm
        progress = jnp.clip(
            (step - num_warmup_steps) / jnp.maximum(1, num_training_steps - num_warmup_steps), 0.0, 1.0
        )
        cos = jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * 2.0 * num_cycles * progress)))
        return lr * jnp.where(step < num_warmup_steps, warmup, cos)

    return schedule


def cosine_with_hard_restarts_schedule_with_warmup(
    lr: float, num_warmup_steps: int, num_training_steps: int, num_cycles: float = 1.0
) -> optax.Schedule:
    def schedule(step):
        warm = jnp.maximum(1, num_warmup_steps)
        warmup = (step + 1) / warm
        progress = jnp.clip(
            (step - num_warmup_steps) / jnp.maximum(1, num_training_steps - num_warmup_steps), 0.0, 1.0
        )
        cycle_progress = (progress * num_cycles) % 1.0
        cos = jnp.where(progress >= 1.0, 0.0, jnp.maximum(0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * cycle_progress))))
        return lr * jnp.where(step < num_warmup_steps, warmup, cos)

    return schedule


def polynomial_decay_schedule_with_warmup(
    lr: float, num_warmup_steps: int, num_training_steps: int, power: float = 1.0, lr_end: float = 1e-7
) -> optax.Schedule:
    def schedule(step):
        warm = jnp.maximum(1, num_warmup_steps)
        warmup = lr * (step + 1) / warm
        remaining = jnp.clip(
            (num_training_steps - step) / jnp.maximum(1, num_training_steps - num_warmup_steps), 0.0, 1.0
        )
        decayed = (lr - lr_end) * remaining**power + lr_end
        return jnp.where(step < num_warmup_steps, warmup, jnp.where(step > num_training_steps, lr_end, decayed))

    return schedule


def one_cycle_schedule(
    max_lr: float,
    num_training_steps: int,
    pct_start: float = 0.05,
    div_factor: float = 2.0,
    final_div_factor: float = 100.0,
) -> optax.Schedule:
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    up_steps = max(1, int(math.ceil(pct_start * num_training_steps)) - 1)
    down_steps = max(1, num_training_steps - up_steps - 1)

    def schedule(step):
        up = initial_lr + (max_lr - initial_lr) * 0.5 * (1.0 - jnp.cos(jnp.pi * jnp.minimum(step, up_steps) / up_steps))
        pos = jnp.clip((step - up_steps) / down_steps, 0.0, 1.0)
        down = min_lr + (max_lr - min_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * pos))
        return jnp.where(step <= up_steps, up, down)

    return schedule


def one_cycle_momentum_schedule(
    num_training_steps: int,
    pct_start: float = 0.05,
    base_momentum: float = 0.85,
    max_momentum: float = 0.95,
) -> optax.Schedule:
    """torch OneCycleLR's momentum co-cycle (cycle_momentum=True default).

    Momentum anneals INVERSELY to the lr over the same phase boundaries:
    max_momentum -> base_momentum while lr rises, back to max_momentum while
    lr decays. For Adam optimizers torch writes this into ``betas[0]`` each
    scheduler step (lr_scheduler.py OneCycleLR), so beta1 varies per step.
    """
    up_steps = max(1, int(math.ceil(pct_start * num_training_steps)) - 1)
    down_steps = max(1, num_training_steps - up_steps - 1)

    def schedule(step):
        up = max_momentum + (base_momentum - max_momentum) * 0.5 * (
            1.0 - jnp.cos(jnp.pi * jnp.minimum(step, up_steps) / up_steps)
        )
        pos = jnp.clip((step - up_steps) / down_steps, 0.0, 1.0)
        down = max_momentum + (base_momentum - max_momentum) * 0.5 * (1.0 + jnp.cos(jnp.pi * pos))
        return jnp.where(step <= up_steps, up, down)

    return schedule


SCHEDULES = {
    "constant_schedule": constant_schedule,
    "constant_schedule_with_warmup": constant_schedule_with_warmup,
    "linear_schedule_with_warmup": linear_schedule_with_warmup,
    "cosine_schedule_with_warmup": cosine_schedule_with_warmup,
    "cosine_with_hard_restarts_schedule_with_warmup": cosine_with_hard_restarts_schedule_with_warmup,
    "polynomial_decay_schedule_with_warmup": polynomial_decay_schedule_with_warmup,
    "one_cycle_schedule": one_cycle_schedule,
}


def compute_warmup(num_training_steps: int, num_warmup_steps: Optional[float]) -> int:
    """Float < 1.0 means a fraction of training steps (reference task.py:85-92)."""
    if num_warmup_steps is None:
        return 0
    if isinstance(num_warmup_steps, float) and num_warmup_steps < 1.0:
        return int(num_warmup_steps * num_training_steps)
    return int(num_warmup_steps)


def resolve_schedule(cfg: Optional[SchedulerConfig], base_lr: float, num_training_steps: int) -> optax.Schedule:
    """Build the schedule named by ``cfg`` with inferred total/warmup steps."""
    if cfg is None:
        return constant_schedule(base_lr)
    name = cfg.name
    if name not in SCHEDULES:
        raise KeyError(f"Unknown scheduler '{name}'. Available: {sorted(SCHEDULES)}")
    total = cfg.num_training_steps if cfg.num_training_steps and cfg.num_training_steps > 0 else num_training_steps
    warmup = compute_warmup(total, cfg.num_warmup_steps)
    if name == "constant_schedule":
        return constant_schedule(base_lr)
    if name == "constant_schedule_with_warmup":
        return constant_schedule_with_warmup(base_lr, warmup)
    if name == "one_cycle_schedule":
        return one_cycle_schedule(
            max_lr=cfg.max_lr or base_lr,
            num_training_steps=total,
            pct_start=cfg.pct_start,
            div_factor=cfg.div_factor,
            final_div_factor=cfg.final_div_factor,
        )
    if name == "cosine_schedule_with_warmup":
        return cosine_schedule_with_warmup(base_lr, warmup, total, cfg.num_cycles)
    if name == "cosine_with_hard_restarts_schedule_with_warmup":
        return cosine_with_hard_restarts_schedule_with_warmup(base_lr, warmup, total, cfg.num_cycles)
    if name == "polynomial_decay_schedule_with_warmup":
        return polynomial_decay_schedule_with_warmup(base_lr, warmup, total, cfg.power, cfg.lr_end)
    if name == "linear_schedule_with_warmup":
        return linear_schedule_with_warmup(base_lr, warmup, total)
    raise AssertionError(name)


def resolve_momentum_schedule(
    cfg: Optional[SchedulerConfig], num_training_steps: int
) -> Optional[optax.Schedule]:
    """Momentum (Adam beta1) co-schedule, or None when the lr schedule has none.

    Only one_cycle cycles momentum (torch OneCycleLR cycle_momentum=True
    default, which the reference's yaml does not override); every other
    schedule in the group leaves optimizer momentum static.
    """
    if cfg is None or cfg.name != "one_cycle_schedule" or not cfg.cycle_momentum:
        return None
    total = cfg.num_training_steps if cfg.num_training_steps and cfg.num_training_steps > 0 else num_training_steps
    return one_cycle_momentum_schedule(
        num_training_steps=total,
        pct_start=cfg.pct_start,
        base_momentum=cfg.base_momentum,
        max_momentum=cfg.max_momentum,
    )
