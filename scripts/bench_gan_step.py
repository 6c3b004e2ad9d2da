#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Time the FLAGSHIP GAN fine-tune step on the TPU chip.

The full production config that no test compiles end-to-end (round-2
finding): ESRGAN nb=11 generator + ESRGAN discriminator + conv5_4 VGG19
perceptual graph, fused relativistic G+D step, bs=192, bf16, donated state.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_gan_step.py [bs] [perceptual_interval]

With ``perceptual_interval=k`` > 1 the VGG graph is evaluated on 1 of every k
steps (training dynamics unchanged under the reference's no-grad perceptual
quirk); the reported ms/step is then the average over a k-step cycle.
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from climsr_tpu.config.schemas import OptimizerConfig
from climsr_tpu.losses.perceptual import build_perceptual_loss
from climsr_tpu.models import create_discriminator, create_generator
from climsr_tpu.training.optimizers import build_optimizer
from climsr_tpu.training.tasks.gan import make_gan_step
from climsr_tpu.training.train_state import GANTrainState


def main() -> None:
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 192
    interval = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    lr_hw = 32
    g_model = create_generator(
        "esrgan", nf=64, nb=11, gc=16, out_channels=1, dtype=jnp.bfloat16, use_pallas=False
    )
    d_model = create_discriminator("esrgan", in_channels=1, dtype=jnp.bfloat16)
    r = jax.random.PRNGKey(0)
    batch = {
        "lr": jax.random.normal(r, (bs, lr_hw, lr_hw, 3), jnp.bfloat16),
        "hr": jax.random.normal(r, (bs, lr_hw * 4, lr_hw * 4, 1), jnp.bfloat16),
        "elevation": jax.random.normal(r, (bs, lr_hw * 4, lr_hw * 4, 1), jnp.bfloat16),
        "mask": jnp.ones((bs, lr_hw * 4, lr_hw * 4, 1), jnp.bfloat16),
    }
    g_params = g_model.init(r, batch["lr"][:1], batch["elevation"][:1], batch["mask"][:1])["params"]
    d_vars = d_model.init(jax.random.PRNGKey(1), jnp.zeros((1, 128, 128, 1), jnp.bfloat16), train=False)
    g_tx = build_optimizer(OptimizerConfig(name="adam", lr=1e-4, weight_decay=1e-4), lambda s: 1e-4)
    d_tx = build_optimizer(OptimizerConfig(name="adam", lr=1e-4, weight_decay=1e-4), lambda s: 1e-4)
    perceptual = build_perceptual_loss(compute_dtype=jnp.bfloat16, cutoff="conv5_4")
    step = make_gan_step(
        g_model, d_model, "esrgan", g_tx, d_tx,
        pixel_weight=0.01, perceptual_weight=1.0, adversarial_weight=0.005,
        perceptual_fn=perceptual, compute_dtype=jnp.bfloat16, donate=True,
        perceptual_interval=interval,
    )
    state = GANTrainState.create(
        g_params, g_tx, d_vars["params"], d_tx, d_vars.get("batch_stats")
    )

    def run(state, n):
        t0 = time.perf_counter()
        metrics = None
        for _ in range(n):
            state, metrics = step(state, batch)
        float(metrics["train/loss_G"])  # real completion barrier
        return state, time.perf_counter() - t0

    t0 = time.perf_counter()
    state, _ = run(state, 1)
    print(f"# compile+first step: {time.perf_counter() - t0:.0f}s")
    # iters in whole perceptual cycles so interval>1 averages fairly
    iters = 5 * interval
    samples = []
    for _ in range(3):
        state, t1 = run(state, interval)
        state, tn = run(state, iters + interval)
        samples.append((tn - t1) / iters)
    dt = sorted(samples)[1]
    tag = f", perceptual 1/{interval} steps" if interval > 1 else ""
    print(
        f"flagship GAN step (nb=11 + conv5_4 VGG + ESRGAN D, bs={bs}, bf16{tag}): "
        f"{dt * 1e3:.1f} ms/step = {bs / dt:.0f} samples/s/chip"
    )


if __name__ == "__main__":
    main()
