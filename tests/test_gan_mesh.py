# -*- coding: utf-8 -*-
"""Flagship GAN configuration on the 8-device mesh: one fused G+D step with a
real VGG perceptual graph, batch sharded over the data axis.

Closes the round-1 gap where the fused GAN step with a perceptual graph had
never executed on a mesh (the e2e test sets perceptual_loss_factor=0 and
num_devices=1). Uses a conv2_2 VGG cutoff to keep the compile cheap; the
full-depth graph runs in ``__graft_entry__.dryrun_multichip``.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climsr_tpu.config.schemas import OptimizerConfig
from climsr_tpu.losses.perceptual import build_perceptual_loss
from climsr_tpu.models import create_discriminator, create_generator
from climsr_tpu.parallel.mesh import batch_sharding, create_mesh, replicated
from climsr_tpu.training.optimizers import build_optimizer
from climsr_tpu.training.tasks.gan import make_gan_step
from climsr_tpu.training.train_state import GANTrainState

pytestmark = pytest.mark.e2e


def test_fused_gan_step_with_vgg_on_mesh(rng):
    n_dev = 8
    mesh = create_mesh(n_dev, ("data",))
    bsharding = batch_sharding(mesh)

    model = create_generator("esrgan", nf=16, nb=1, gc=8, out_channels=1)
    d_model = create_discriminator("default", in_channels=1)
    batch_np = {
        "lr": rng.normal(size=(n_dev, 32, 32, 3)).astype(np.float32),
        "hr": rng.normal(size=(n_dev, 128, 128, 1)).astype(np.float32),
        "elevation": rng.normal(size=(n_dev, 128, 128, 1)).astype(np.float32),
        "mask": np.ones((n_dev, 128, 128, 1), np.float32),
    }
    g_vars = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch_np["lr"][:1]),
        jnp.asarray(batch_np["elevation"][:1]),
        jnp.asarray(batch_np["mask"][:1]),
    )
    d_vars = d_model.init(jax.random.PRNGKey(1), jnp.asarray(batch_np["hr"][:1]), train=False)
    g_tx = build_optimizer(OptimizerConfig(name="adamw", lr=1e-4), lambda s: 1e-4)
    d_tx = build_optimizer(OptimizerConfig(name="adamw", lr=1e-4), lambda s: 1e-4)
    state = GANTrainState.create(g_vars["params"], g_tx, d_vars["params"], d_tx, d_vars.get("batch_stats"))
    state = jax.device_put(state, replicated(mesh))
    batch = {k: jax.device_put(v, bsharding) for k, v in batch_np.items()}

    perceptual_fn = build_perceptual_loss(compute_dtype=jnp.float32, cutoff="conv2_2")
    step = make_gan_step(
        model, d_model, "esrgan", g_tx, d_tx,
        perceptual_fn=perceptual_fn, compute_dtype=jnp.float32, donate=False,
    )
    new_state, metrics = step(state, batch)
    jax.block_until_ready(new_state.g_params)
    host = {k: float(v) for k, v in jax.device_get(metrics).items()}
    assert np.isfinite(host["train/loss_G"]) and np.isfinite(host["train/loss_D"]), host
    assert host["train/perceptual_loss"] > 0.0
    # both parameter trees actually moved
    gdiff = jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))), state.g_params, new_state.g_params)
    ddiff = jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))), state.d_params, new_state.d_params)
    assert max(jax.tree_util.tree_leaves(gdiff)) > 0
    assert max(jax.tree_util.tree_leaves(ddiff)) > 0
