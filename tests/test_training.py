# -*- coding: utf-8 -*-
"""Training-layer tests: schedules, optimizers, train steps, checkpoints."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climsr_tpu.config.schemas import OptimizerConfig, SchedulerConfig
from climsr_tpu.training.optimizers import build_optimizer, rprop
from climsr_tpu.training.schedules import (
    compute_warmup,
    cosine_schedule_with_warmup,
    one_cycle_schedule,
    resolve_schedule,
)
from climsr_tpu.training.train_state import GANTrainState, TrainState


def test_compute_warmup_fraction():
    assert compute_warmup(1000, 0.1) == 100
    assert compute_warmup(1000, 50) == 50
    assert compute_warmup(1000, None) == 0


def test_one_cycle_endpoints():
    # torch OneCycleLR parity: start max_lr/div, peak max_lr, end peak/div/final_div
    s = one_cycle_schedule(max_lr=1e-3, num_training_steps=100, pct_start=0.1, div_factor=2, final_div_factor=100)
    lrs = np.array([float(s(i)) for i in range(100)])
    np.testing.assert_allclose(lrs[0], 5e-4, rtol=1e-5)
    np.testing.assert_allclose(lrs.max(), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(lrs[-1], 5e-4 / 100, rtol=1e-2)
    assert np.argmax(lrs) == 9  # peak at end of warmup phase


def test_cosine_schedule_warmup_and_decay():
    s = cosine_schedule_with_warmup(1e-3, num_warmup_steps=10, num_training_steps=100)
    assert float(s(0)) < float(s(9))
    np.testing.assert_allclose(float(s(9)), 1e-3, rtol=1e-5)
    np.testing.assert_allclose(float(s(99)), 0.0, atol=1e-6)


def test_resolve_schedule_by_config():
    cfg = SchedulerConfig(name="one_cycle_schedule", max_lr=1e-4, pct_start=0.05, div_factor=2, final_div_factor=100)
    s = resolve_schedule(cfg, 1e-4, 200)
    assert float(s(0)) == pytest.approx(5e-5, rel=1e-5)
    with pytest.raises(KeyError):
        resolve_schedule(SchedulerConfig(name="nope"), 1e-4, 10)


@pytest.mark.parametrize("name", ["adam", "adamw", "sgd", "rmsprop", "adagrad", "adadelta", "adamax"])
def test_optimizers_decrease_quadratic(name):
    cfg = OptimizerConfig(name=name, lr=0.1, weight_decay=0.0, momentum=0.9)
    tx = build_optimizer(cfg, lambda step: 0.1)
    params = {"w": jnp.asarray(5.0)}
    state = tx.init(params)
    for _ in range(50):
        grads = {"w": 2 * params["w"]}
        updates, state = tx.update(grads, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    assert abs(float(params["w"])) < 5.0


def test_rprop_sign_descent():
    tx = rprop(learning_rate=0.1)
    params = {"w": jnp.asarray(3.0)}
    state = tx.init(params)
    for _ in range(30):
        grads = {"w": 2 * params["w"]}
        updates, state = tx.update(grads, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    assert abs(float(params["w"])) < 1.0


def test_grad_accumulation_multisteps():
    cfg = OptimizerConfig(name="sgd", lr=1.0, weight_decay=0.0)
    tx = build_optimizer(cfg, lambda step: 1.0, accumulate_grad_batches=2)
    params = {"w": jnp.asarray(1.0)}
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.asarray(1.0)}, state, params)
    assert float(updates["w"]) == 0.0  # first micro-batch: no update yet
    updates, state = tx.update({"w": jnp.asarray(1.0)}, state, params)
    assert float(updates["w"]) != 0.0


def _tiny_batch(rng, n=2, lr_size=8, hr_size=32, in_ch=3):
    return {
        "lr": jnp.asarray(rng.normal(size=(n, lr_size, lr_size, in_ch)).astype(np.float32)),
        "hr": jnp.asarray(rng.normal(size=(n, hr_size, hr_size, 1)).astype(np.float32)),
        "elevation": jnp.asarray(rng.normal(size=(n, hr_size, hr_size, 1)).astype(np.float32)),
        "mask": jnp.ones((n, hr_size, hr_size, 1), jnp.float32),
    }


def test_pretrain_step_reduces_loss(rng):
    from climsr_tpu.models import create_generator
    from climsr_tpu.training.tasks.pretrain import make_pretrain_step

    model = create_generator("esrgan", nf=8, nb=1, gc=4, out_channels=1)
    batch = _tiny_batch(rng)
    var = model.init(jax.random.PRNGKey(0), batch["lr"], batch["elevation"], batch["mask"])
    cfg = OptimizerConfig(name="adam", lr=1e-3, weight_decay=0.0)
    import optax

    tx = build_optimizer(cfg, lambda s: 1e-3)
    state = TrainState.create(var["params"], tx)
    step = make_pretrain_step(model, "esrgan", tx, compute_dtype=jnp.float32, donate=False)
    losses = []
    for _ in range(15):
        state, metrics = step(state, batch)
        losses.append(float(metrics["train/loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 15


def test_gan_step_smoke_quick_tier(rng):
    """Quick-tier fused-GAN step canary (advisor round 4): the cheapest model
    pair that still compiles the full fused G+D relativistic step, so a
    make_gan_step regression surfaces in the ~10-min tier instead of only at
    the ~30-min e2e gate."""
    from climsr_tpu.models import create_discriminator, create_generator
    from climsr_tpu.training.tasks.gan import make_gan_step

    g = create_generator("esrgan", nf=4, nb=1, gc=2, out_channels=1)
    d = create_discriminator("rfb_esrgan", in_channels=1)
    batch = _tiny_batch(rng, n=2, hr_size=32, lr_size=8)
    g_var = g.init(jax.random.PRNGKey(0), batch["lr"], batch["elevation"], batch["mask"])
    d_var = d.init(jax.random.PRNGKey(1), batch["hr"], train=False)
    cfg = OptimizerConfig(name="adam", lr=1e-4, weight_decay=0.0)
    g_tx = build_optimizer(cfg, lambda s: 1e-4)
    d_tx = build_optimizer(cfg, lambda s: 1e-4)
    state = GANTrainState.create(g_var["params"], g_tx, d_var["params"], d_tx, d_var.get("batch_stats"))
    step = make_gan_step(g, d, "esrgan", g_tx, d_tx, compute_dtype=jnp.float32, donate=False)
    old_g = jax.tree_util.tree_leaves(state.g_params)[0].copy()
    old_d = jax.tree_util.tree_leaves(state.d_params)[0].copy()
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["train/loss_G"]))
    assert np.isfinite(float(metrics["train/loss_D"]))
    assert not np.allclose(old_g, jax.tree_util.tree_leaves(state.g_params)[0])
    assert not np.allclose(old_d, jax.tree_util.tree_leaves(state.d_params)[0])


@pytest.mark.e2e
def test_gan_step_updates_both_and_tracks_bn(rng):
    from climsr_tpu.models import create_discriminator, create_generator
    from climsr_tpu.training.tasks.gan import make_gan_step

    g = create_generator("esrgan", nf=8, nb=1, gc=4, out_channels=1)
    d = create_discriminator("rfb_esrgan", in_channels=1)
    batch = _tiny_batch(rng, hr_size=64, lr_size=16)
    g_var = g.init(jax.random.PRNGKey(0), batch["lr"], batch["elevation"], batch["mask"])
    d_var = d.init(jax.random.PRNGKey(1), batch["hr"], train=False)
    cfg = OptimizerConfig(name="adam", lr=1e-4, weight_decay=0.0)
    g_tx = build_optimizer(cfg, lambda s: 1e-4)
    d_tx = build_optimizer(cfg, lambda s: 1e-4)
    state = GANTrainState.create(g_var["params"], g_tx, d_var["params"], d_tx, d_var.get("batch_stats"))
    step = make_gan_step(g, d, "esrgan", g_tx, d_tx, compute_dtype=jnp.float32, donate=False)
    old_g = jax.tree_util.tree_leaves(state.g_params)[0].copy()
    old_bn = jax.tree_util.tree_leaves(state.d_batch_stats)[0].copy()
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["train/loss_G"]))
    assert np.isfinite(float(metrics["train/loss_D"]))
    assert not np.allclose(old_g, jax.tree_util.tree_leaves(state.g_params)[0])
    assert not np.allclose(old_bn, jax.tree_util.tree_leaves(state.d_batch_stats)[0])


@pytest.mark.e2e  # compile-heavy on the CPU mesh; full tier only
def test_gan_val_losses_use_mask_zeroed_hr(rng):
    """Reference quirk (pl_gan.py:115-119 + task.py:287-289): validation's
    loss_g sees the mask-ZEROED hr (in-place mutation aliasing batch[hr]) but
    the UNMASKED sr (cloned before masking)."""
    from climsr_tpu.losses.gan import relativistic_g_loss
    from climsr_tpu.models import create_discriminator, create_generator
    from climsr_tpu.training.tasks.gan import make_gan_val_losses

    g = create_generator("esrgan", nf=8, nb=1, gc=4, out_channels=1)
    d = create_discriminator("rfb_esrgan", in_channels=1)
    batch = _tiny_batch(rng, hr_size=64, lr_size=16)
    batch["mask"] = (np.asarray(batch["mask"]) * (rng.random(batch["mask"].shape) > 0.3)).astype(
        np.float32
    )
    g_var = g.init(jax.random.PRNGKey(0), batch["lr"], batch["elevation"], batch["mask"])
    d_var = d.init(jax.random.PRNGKey(1), batch["hr"], train=False)

    val = make_gan_val_losses(g, d, "esrgan", compute_dtype=jnp.float32)
    got = val(g_var["params"], d_var["params"], d_var.get("batch_stats"), batch)

    sr = np.asarray(
        g.apply(g_var, jnp.asarray(batch["lr"]), jnp.asarray(batch["elevation"]), jnp.asarray(batch["mask"]))
    )
    hr_masked = np.where(np.asarray(batch["mask"]) > 0, np.asarray(batch["hr"]), 0.0)
    want_pixel = float(np.mean(np.abs(sr - hr_masked)))
    d_vars = {"params": d_var["params"]}
    if d_var.get("batch_stats") is not None:
        d_vars["batch_stats"] = d_var["batch_stats"]
    score_real = d.apply(d_vars, jnp.asarray(hr_masked, jnp.float32), train=False)
    score_fake = d.apply(d_vars, jnp.asarray(sr, jnp.float32), train=False)
    want_adv = float(relativistic_g_loss(score_real, score_fake))
    got_pixel = float(got["val/loss_G"] - 0.005 * got["val/adversarial_loss"]) / 0.01
    np.testing.assert_allclose(float(got["val/adversarial_loss"]), want_adv, rtol=1e-4)
    np.testing.assert_allclose(got_pixel, want_pixel, rtol=1e-4)
    # and the quirk matters: unmasked hr gives a different pixel loss
    assert abs(want_pixel - float(np.mean(np.abs(sr - np.asarray(batch["hr"]))))) > 1e-6


@pytest.mark.e2e  # compile-heavy on the CPU mesh; full tier only
def test_gan_perceptual_interval_dynamics_and_logging(rng):
    """task.perceptual_interval>1 must not change training dynamics under the
    default no-grad perceptual quirk — only the logged value (0.0 on skipped
    steps). Twin runs from identical state, interval=1 vs 3."""
    from climsr_tpu.models import create_discriminator, create_generator
    from climsr_tpu.training.tasks.gan import make_gan_step

    g = create_generator("esrgan", nf=8, nb=1, gc=4, out_channels=1)
    d = create_discriminator("rfb_esrgan", in_channels=1)
    batch = _tiny_batch(rng, hr_size=64, lr_size=16)
    g_var = g.init(jax.random.PRNGKey(0), batch["lr"], batch["elevation"], batch["mask"])
    d_var = d.init(jax.random.PRNGKey(1), batch["hr"], train=False)
    cfg = OptimizerConfig(name="adam", lr=1e-4, weight_decay=0.0)
    g_tx = build_optimizer(cfg, lambda s: 1e-4)
    d_tx = build_optimizer(cfg, lambda s: 1e-4)

    # no-grad quirk analogue: stop_gradient inside the perceptual fn
    def perceptual_fn(sr, hr):
        return jnp.mean((jax.lax.stop_gradient(sr) - hr) ** 2)

    def run(interval):
        state = GANTrainState.create(
            g_var["params"], g_tx, d_var["params"], d_tx, d_var.get("batch_stats")
        )
        step = make_gan_step(
            g, d, "esrgan", g_tx, d_tx,
            perceptual_fn=perceptual_fn, perceptual_interval=interval,
            compute_dtype=jnp.float32, donate=False,
        )
        logged = []
        for _ in range(3):
            state, metrics = step(state, batch)
            logged.append(float(metrics["train/perceptual_loss"]))
        return state, logged

    s1, log1 = run(1)
    s3, log3 = run(3)
    # dynamics bit-identical: the perceptual term carries no gradient
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_params), jax.tree_util.tree_leaves(s3.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # interval=1 logs every step; interval=3 logs step 0 (0 % 3 == 0) then 0.0
    assert all(v > 0.0 for v in log1)
    assert log3[0] == pytest.approx(log1[0]) and log3[1] == 0.0 and log3[2] == 0.0


def test_eval_step_metric_keys(rng):
    from climsr_tpu.models import create_generator
    from climsr_tpu.training.tasks.pretrain import make_eval_step

    model = create_generator("esrgan", nf=8, nb=1, gc=4, out_channels=1)
    batch = _tiny_batch(rng)
    batch["original_data"] = batch["hr"] * 30.0
    batch["min"] = jnp.zeros((2,))
    batch["max"] = jnp.ones((2,)) * 30.0
    var = model.init(jax.random.PRNGKey(0), batch["lr"], batch["elevation"], batch["mask"])
    step = make_eval_step(model, "esrgan", compute_dtype=jnp.float32)
    out = step(var["params"], batch)
    assert "val/rmse" in out and "val/loss" in out and "val/acc@01.25" in out
    assert len(out) == 18  # 16 metrics + loss + normalized_loss


def test_checkpoint_roundtrip_and_graft(tmp_path, rng):
    import optax

    from climsr_tpu.training.checkpoint import CheckpointManager, restore_generator_params

    params = {"conv": {"kernel": jnp.asarray(rng.normal(size=(3, 3, 2, 4)).astype(np.float32))},
              "tail": {"kernel": jnp.asarray(rng.normal(size=(1, 1, 4, 1)).astype(np.float32))}}
    tx = optax.adam(1e-3)
    state = TrainState.create(params, tx)
    mgr = CheckpointManager(tmp_path / "ck", save_top_k=2)
    mgr.save(1, jax.device_get(state), hp_metric=0.5)
    mgr.save(2, jax.device_get(state.replace(step=jnp.asarray(2))), hp_metric=0.4)
    mgr.wait()
    assert mgr.best_step == 2
    restored = mgr.restore(jax.device_get(state))
    np.testing.assert_allclose(restored.params["conv"]["kernel"], params["conv"]["kernel"])
    mgr.close()

    # graft into a model with a different tail shape: tail keeps fresh init
    fresh = {"conv": {"kernel": jnp.zeros((3, 3, 2, 4))}, "tail": {"kernel": jnp.ones((1, 1, 4, 2))}}
    grafted = restore_generator_params(tmp_path / "ck", fresh)
    np.testing.assert_allclose(grafted["conv"]["kernel"], params["conv"]["kernel"])
    np.testing.assert_allclose(grafted["tail"]["kernel"], 1.0)


def test_extract_generator_params_variants():
    """Checkpoint layouts: TrainState dict, GAN dict, bare tree, attr object —
    key-PRESENCE semantics (empty params must not fall through)."""
    from climsr_tpu.training.checkpoint import extract_generator_params

    tree = {"conv": {"kernel": 1}}
    assert extract_generator_params({"params": tree, "opt_state": 0}) is tree
    assert extract_generator_params({"g_params": tree, "d_params": {}}) is tree
    assert extract_generator_params(tree) is tree
    # present-but-empty params wins over the whole state
    assert extract_generator_params({"params": {}, "step": 3}) == {}

    class S:
        params = None
        g_params = tree

    assert extract_generator_params(S()) is tree


def test_rprop_applies_weight_decay_chain():
    """rprop must flow through the shared clip/decay chain like every other
    optimizer (it used to return early and drop them)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from climsr_tpu.config.schemas import OptimizerConfig
    from climsr_tpu.training.optimizers import build_optimizer

    params = {"w": jnp.ones((4,)) * 2.0}
    grads = {"w": -jnp.ones((4,)) * 0.1}  # decay (wd*w=+1.0) flips the sign rprop sees

    def step(wd):
        tx = build_optimizer(OptimizerConfig(name="rprop", lr=1e-2, weight_decay=wd), lambda s: 1e-2)
        state = tx.init(params)
        updates, _ = tx.update(grads, state, params)
        return np.asarray(updates["w"])

    u0, u1 = step(0.0), step(0.5)
    assert not np.allclose(u0, u1), "weight decay must reach the rprop transform"
