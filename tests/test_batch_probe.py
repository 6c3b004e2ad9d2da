# -*- coding: utf-8 -*-
"""auto_scale_batch_size probe (training/batch_probe.py).

The search logic is tested against a fake fits-predicate (deterministic,
backend-independent); the real AOT memory_analysis path is exercised for
"backend reports nothing" graceful fallback on the CPU test backend. Parity:
the reference exposes PL's auto_scale_batch_size knob (core/config.py:144).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climsr_tpu.training.batch_probe import probe_max_batch_size


def _fake_fits(capacity_bs):
    """Predicate: batches up to capacity fit; 2 plan-bytes per sample."""

    def check(bs):
        return bs <= capacity_bs, bs * 2

    return check


def test_power_doubles_to_capacity():
    got = probe_max_batch_size(None, None, {}, start=8, mode="power", _fits=_fake_fits(100))
    assert got == 64  # 8 -> 16 -> 32 -> 64 fit, 128 does not


def test_binsearch_refines_between_fit_and_fail():
    got = probe_max_batch_size(None, None, {}, start=8, mode="binsearch", _fits=_fake_fits(100))
    assert 64 <= got <= 100
    assert got > 64  # binsearch must beat plain power


def test_scales_down_when_configured_batch_too_big():
    got = probe_max_batch_size(None, None, {}, start=256, mode="power", _fits=_fake_fits(100))
    assert got == 64  # halved 256 -> 128 -> 64


def test_even_batch_one_too_big_raises():
    with pytest.raises(ValueError, match="batch_size=1"):
        probe_max_batch_size(None, None, {}, start=4, mode="power", _fits=lambda bs: (False, 0))


def test_backend_without_memory_stats_keeps_start():
    got = probe_max_batch_size(None, None, {}, start=32, mode="power", _fits=lambda bs: None)
    assert got == 32


def test_max_trials_caps_doubling():
    got = probe_max_batch_size(
        None, None, {}, start=1, mode="power", max_trials=3, _fits=_fake_fits(10**9)
    )
    assert got == 8  # 1 -> 2 -> 4 -> 8, then trial budget exhausted


def test_real_aot_path_on_cpu_falls_back(rng):
    """End-to-end through the real fits(): the CPU test backend reports no
    usable memory limit, so the probe must return the configured size rather
    than crash — the documented degradation mode."""
    from climsr_tpu.config.schemas import OptimizerConfig
    from climsr_tpu.models import create_generator
    from climsr_tpu.training.optimizers import build_optimizer
    from climsr_tpu.training.tasks.pretrain import make_pretrain_step
    from climsr_tpu.training.train_state import TrainState

    model = create_generator("srcnn", out_channels=1, dtype=jnp.float32)
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    tx = build_optimizer(OptimizerConfig(name="adam", lr=1e-3), lambda s: 1e-3)
    state = TrainState.create(params, tx)
    step = make_pretrain_step(model, "srcnn", tx, compute_dtype=jnp.float32, donate=False)
    template = {"lr": x, "hr": jnp.zeros((1, 16, 16, 1), jnp.float32)}

    got = probe_max_batch_size(step, state, template, start=4, mode="power")
    assert got >= 4  # CPU: either fallback (4) or a real probe result
