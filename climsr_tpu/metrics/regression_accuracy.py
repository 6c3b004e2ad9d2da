# -*- coding: utf-8 -*-
"""Stateful RegressionAccuracy accumulator (torchmetrics-Metric-style API).

Parity: reference ``climsr/metrics/regression_accuracy.py`` — sum states
``correct``/``total`` accumulated across updates; under a sharded batch the
sums reduce globally inside jit (the ``dist_reduce_fx="sum"`` equivalent).
The metric suite uses the functional form; this class exists for users of the
reference's object API.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class RegressionAccuracy:
    def __init__(self, eps: float = 1.0):
        self.eps = eps
        self.reset()

    def reset(self) -> None:
        # f32 accumulators, not int32: a whole-globe sweep exceeds 2^31
        # pixels after ~500 frames and int32 silently wraps negative (per-
        # update counts are millions, far above f32's ulp at 1e10, so the
        # ratio stays accurate)
        self.correct = jnp.zeros((), jnp.float32)
        self.total = jnp.zeros_like(self.correct)

    def update(self, preds: jax.Array, target: jax.Array) -> None:
        assert preds.shape == target.shape
        self.correct = self.correct + jnp.sum(jnp.abs(preds - target) <= self.eps).astype(jnp.float32)
        self.total = self.total + jnp.float32(target.size)

    def compute(self) -> jax.Array:
        return self.correct.astype(jnp.float32) / self.total

    def __call__(self, preds: jax.Array, target: jax.Array) -> jax.Array:
        self.update(preds, target)
        return jnp.mean((jnp.abs(preds - target) <= self.eps).astype(jnp.float32))
