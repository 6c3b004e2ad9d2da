#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Profile the flagship training step on the TPU: per-op device-time table.

Captures an xplane trace of a few fused pretrain steps (ESRGAN nb=11, bs=192,
bf16 — the reference's pre-training config) and prints the aggregated per-op
device-time table (utils/profiling.py). Drives the round-3 decision on where
the training-step MFU gap lives (trunk backward vs HR-scale head).

Usage (from the repo root — climsr_tpu is not pip-installed, so the repo
must be on the path alongside the TPU plugin site dir):

    PYTHONPATH=/root/.axon_site:. python scripts/profile_train_step.py [out_dir]
"""
from __future__ import annotations

import sys
import tempfile

import jax
import jax.numpy as jnp

from climsr_tpu.config.schemas import OptimizerConfig
from climsr_tpu.models import create_generator
from climsr_tpu.training.optimizers import build_optimizer
from climsr_tpu.training.tasks.pretrain import make_pretrain_step
from climsr_tpu.training.train_state import TrainState
from climsr_tpu.utils.profiling import advanced_profile_report


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_dir = args[0] if args else tempfile.mkdtemp(prefix="train_profile_")
    use_pallas = "--xla-trunk" not in sys.argv  # round 4: the fused Pallas
    # backward landed (ops/pallas/rdb.py) and the bench trains the Pallas
    # trunk; profile that by default, --xla-trunk for the comparison trace
    bs, lr_hw = 192, 32
    model = create_generator(
        "esrgan", nf=64, nb=11, gc=16, out_channels=1, dtype=jnp.bfloat16, use_pallas=use_pallas
    )
    r = jax.random.PRNGKey(0)
    batch = {
        "lr": jax.random.normal(r, (bs, lr_hw, lr_hw, 3), jnp.bfloat16),
        "hr": jax.random.normal(r, (bs, lr_hw * 4, lr_hw * 4, 1), jnp.bfloat16),
        "elevation": jax.random.normal(r, (bs, lr_hw * 4, lr_hw * 4, 1), jnp.bfloat16),
        "mask": jnp.ones((bs, lr_hw * 4, lr_hw * 4, 1), jnp.bfloat16),
    }
    params = model.init(r, batch["lr"][:1], batch["elevation"][:1], batch["mask"][:1])["params"]
    tx = build_optimizer(OptimizerConfig(name="adam", lr=1e-4, weight_decay=1e-4), lambda s: 1e-4)
    step = make_pretrain_step(model, "esrgan", tx, compute_dtype=jnp.bfloat16, donate=True)

    state = TrainState.create(params, tx)
    state, metrics = step(state, batch)  # compile
    float(metrics["train/loss"])

    with jax.profiler.trace(out_dir):
        for _ in range(3):
            state, metrics = step(state, batch)
        float(metrics["train/loss"])

    report = advanced_profile_report(out_dir, top=45)
    print(report or f"no parsable trace under {out_dir}")
    print(f"\ntrace: {out_dir}")


if __name__ == "__main__":
    main()
