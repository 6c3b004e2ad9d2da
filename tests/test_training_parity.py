# -*- coding: utf-8 -*-
"""Training-dynamics parity against the ACTUAL reference torch stack.

Forward numerics are covered by test_reference_parity.py; these tests prove
the *training* side of the north star — that one optimizer step (and a whole
training trajectory) of climsr_tpu matches the reference's
``pl_generator_pre_training.py:18-33`` / ``pl_gan.py:28-97`` semantics:

- per-step gradient goldens: identical init imported into both stacks, one
  Adam(lr, weight_decay) step in torch (the reference's ``conf/optimizers/
  adam.yaml``) and in ``make_pretrain_step`` / ``make_gan_step``, loss and
  updated parameters asserted equal. Run in float64 on both sides so
  agreement is exact (~1e-9), not tolerance-washed.
- twin-training convergence: 200 steps on a synthetic dataset with identical
  init, data order and optimizer in torch-CPU vs climsr_tpu (f32); the val
  RMSE trajectories must track within a tight band.

Known, documented deviation (training/tasks/gan.py docstring): the fused GAN
step trains D on ``stop_gradient(sr)`` from the *pre-update* generator,
whereas PL's two-optimizer loop recomputes ``sr`` after G stepped. The GAN
golden therefore feeds the torch oracle the same pre-update ``sr`` — it pins
per-phase gradient math (relativistic losses, BN batch-stat updates, L1,
weighting), which is the part that must match.
"""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climsr_tpu.config.schemas import OptimizerConfig
from climsr_tpu.interop.torch_import import (
    import_discriminator_params,
    import_generator_params,
)
from climsr_tpu.models import create_discriminator, create_generator
from climsr_tpu.training.optimizers import build_optimizer
from climsr_tpu.training.tasks.gan import make_gan_step
from climsr_tpu.training.tasks.pretrain import make_pretrain_step
from climsr_tpu.training.train_state import GANTrainState, TrainState

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"
if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

ref_models = pytest.importorskip("climsr.models", reason="reference repo not mounted")
for _sub in ("srcnn", "esrgan", "rcan", "discriminator"):
    __import__(f"climsr.models.{_sub}")

B_lr, B_hr, B_elev, B_mask = "lr", "hr", "elevation", "mask"


def _sd_numpy(module) -> dict:
    # .copy() is load-bearing: .numpy() on CPU tensors ALIASES the parameter
    # storage, so a later optimizer.step() would silently mutate a captured
    # "init" state dict in place.
    return {k: v.detach().cpu().numpy().copy() for k, v in module.state_dict().items()}


def _nchw(a: np.ndarray):
    return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy())


def _tree_allclose(got: dict, want: dict, atol: float, rtol: float = 1e-7, path: str = ""):
    assert set(got) == set(want), (path, set(got) ^ set(want))
    for k in got:
        if isinstance(got[k], dict):
            _tree_allclose(got[k], want[k], atol, rtol, f"{path}/{k}")
        else:
            np.testing.assert_allclose(
                np.asarray(got[k], np.float64), np.asarray(want[k], np.float64),
                atol=atol, rtol=rtol, err_msg=f"{path}/{k}",
            )


def _adam(params, lr=1e-3, wd=1e-4):
    """The reference's conf/optimizers/adam.yaml: torch.optim.Adam + coupled L2."""
    return torch.optim.Adam(params, lr=lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=wd)


def _jax_adam_cfg(lr=1e-3, wd=1e-4):
    return OptimizerConfig(name="adam", lr=lr, weight_decay=wd, betas=(0.9, 0.999), eps=1e-8)


# ---------------------------------------------------------------------------
# Per-step gradient goldens (float64, exact)
# ---------------------------------------------------------------------------


def test_srcnn_pretrain_step_gradient_golden(rng):
    """One pretrain step (MSE loss, task.py:141) on identical init: loss and
    every updated parameter must agree at f64 precision."""
    torch.manual_seed(10)
    ref = ref_models.srcnn.SRCNN(in_channels=3, out_channels=1).double().train()
    sd0 = _sd_numpy(ref)  # init BEFORE the torch optimizer mutates in-place
    x = rng.normal(size=(4, 24, 24, 3))
    hr = rng.normal(size=(4, 24, 24, 1))

    # --- torch step ---
    opt = _adam(ref.parameters())
    sr_t = ref(_nchw(x))
    loss_t = torch.nn.functional.mse_loss(sr_t, _nchw(hr))
    opt.zero_grad()
    loss_t.backward()
    opt.step()

    with jax.enable_x64(True):
        params = import_generator_params("srcnn", sd0)
        model = create_generator("srcnn", out_channels=1, dtype=jnp.float64)
        tx = build_optimizer(_jax_adam_cfg(), schedule=lambda s: 1e-3)
        state = TrainState.create(params, tx)
        step = make_pretrain_step(model, "srcnn", tx, compute_dtype=jnp.float64, donate=False)
        batch = {B_lr: jnp.asarray(x), B_hr: jnp.asarray(hr)}
        new_state, metrics = step(state, batch)

        np.testing.assert_allclose(float(metrics["train/loss"]), float(loss_t), atol=1e-10, rtol=1e-10)
        want = import_generator_params("srcnn", _sd_numpy(ref))
        _tree_allclose(jax.device_get(new_state.params), jax.device_get(want), atol=1e-9)


def test_esrgan_pretrain_step_gradient_golden(rng):
    """One pretrain step (L1 loss) through the full RRDB + fusion-head graph."""
    torch.manual_seed(11)
    ref = ref_models.esrgan.ESRGANGenerator(
        in_channels=3, out_channels=1, nf=16, nb=2, gc=8, scaling_factor=4
    ).double().train()
    sd0 = _sd_numpy(ref)
    x = rng.normal(size=(2, 16, 16, 3))
    hr = rng.normal(size=(2, 64, 64, 1))
    elev = rng.normal(size=(2, 64, 64, 1))
    mask = (rng.uniform(size=(2, 64, 64, 1)) > 0.2).astype(np.float64)

    opt = _adam(ref.parameters())
    sr_t = ref(_nchw(x), _nchw(elev), _nchw(mask))
    loss_t = torch.nn.functional.l1_loss(sr_t, _nchw(hr))
    opt.zero_grad()
    loss_t.backward()
    opt.step()

    with jax.enable_x64(True):
        params = import_generator_params("esrgan", sd0)
        model = create_generator("esrgan", out_channels=1, nf=16, nb=2, gc=8, dtype=jnp.float64)
        tx = build_optimizer(_jax_adam_cfg(), schedule=lambda s: 1e-3)
        state = TrainState.create(params, tx)
        step = make_pretrain_step(model, "esrgan", tx, compute_dtype=jnp.float64, donate=False)
        batch = {
            B_lr: jnp.asarray(x), B_hr: jnp.asarray(hr),
            B_elev: jnp.asarray(elev), B_mask: jnp.asarray(mask),
        }
        new_state, metrics = step(state, batch)

        np.testing.assert_allclose(float(metrics["train/loss"]), float(loss_t), atol=1e-10, rtol=1e-10)
        want = import_generator_params("esrgan", _sd_numpy(ref))
        _tree_allclose(jax.device_get(new_state.params), jax.device_get(want), atol=1e-9)


@pytest.mark.e2e  # compile-heavy on the CPU mesh; full tier only
def test_gan_step_gradient_golden(rng):
    """One fused GAN step vs a per-phase torch oracle implementing
    pl_gan.py:28-97 verbatim: relativistic G loss (with the reference's
    swapped rf/fr label quirk), D loss on detached sr, BN batch-stat update
    order (G-phase hr,sr then D-phase hr,sr), Adam updates for both nets."""
    torch.manual_seed(12)
    ref_g = ref_models.esrgan.ESRGANGenerator(
        in_channels=3, out_channels=1, nf=8, nb=1, gc=4, scaling_factor=4
    ).double().train()
    ref_d = ref_models.discriminator.Discriminator(in_channels=1).double().train()
    # perturb BN running stats so the stat-update math is actually exercised
    with torch.no_grad():
        for name, buf in ref_d.named_buffers():
            if name.endswith("running_mean"):
                buf.add_(torch.randn_like(buf) * 0.1)
            elif name.endswith("running_var"):
                buf.mul_(torch.rand_like(buf) * 0.5 + 0.75)

    g_sd0 = _sd_numpy(ref_g)
    d_sd0 = _sd_numpy(ref_d)

    n = 2
    x = rng.normal(size=(n, 32, 32, 3))
    hr = rng.normal(size=(n, 128, 128, 1))
    elev = rng.normal(size=(n, 128, 128, 1))
    mask = (rng.uniform(size=(n, 128, 128, 1)) > 0.2).astype(np.float64)

    pixel_w, adv_w = 0.01, 0.005  # conf/task/gan_training.yaml (perceptual: no-grad)
    bce = torch.nn.BCEWithLogitsLoss()
    real_labels = torch.ones((n, 1), dtype=torch.float64)
    fake_labels = torch.zeros((n, 1), dtype=torch.float64)

    g_opt = _adam(ref_g.parameters())
    d_opt = _adam(ref_d.parameters())

    # --- torch phase G (pl_gan.py:28-48,63-85) ---
    sr_t = ref_g(_nchw(x), _nchw(elev), _nchw(mask))
    score_real = ref_d(_nchw(hr))
    score_fake = ref_d(sr_t)
    disc_rf = score_real - score_fake.mean()
    disc_fr = score_fake - score_real.mean()
    adv = (bce(disc_fr, real_labels) + bce(disc_rf, fake_labels)) / 2
    pixel = torch.nn.functional.l1_loss(sr_t, _nchw(hr))
    loss_g_t = pixel_w * pixel + adv_w * adv
    g_opt.zero_grad()
    d_opt.zero_grad()
    loss_g_t.backward()
    g_opt.step()  # only G steps in phase 0 (D grads are discarded by PL)

    # --- torch phase D (pl_gan.py:52-61,87-97) on the SAME pre-update sr ---
    sr_det = sr_t.detach()
    score_real = ref_d(_nchw(hr))
    score_fake = ref_d(sr_det)
    disc_rf = score_real - score_fake.mean()
    disc_fr = score_fake - score_real.mean()
    loss_d_t = (bce(disc_fr, fake_labels) + bce(disc_rf, real_labels)) / 2
    d_opt.zero_grad()
    loss_d_t.backward()
    d_opt.step()

    with jax.enable_x64(True):
        g_params = import_generator_params("esrgan", g_sd0)
        d_params, d_bs = import_discriminator_params(d_sd0)
        g_model = create_generator("esrgan", out_channels=1, nf=8, nb=1, gc=4, dtype=jnp.float64)
        d_model = create_discriminator("esrgan", in_channels=1, dtype=jnp.float64)
        g_tx = build_optimizer(_jax_adam_cfg(), schedule=lambda s: 1e-3)
        d_tx = build_optimizer(_jax_adam_cfg(), schedule=lambda s: 1e-3)
        state = GANTrainState.create(g_params, g_tx, d_params, d_tx, d_bs)
        step = make_gan_step(
            g_model, d_model, "esrgan", g_tx, d_tx,
            pixel_weight=pixel_w, perceptual_weight=1.0, adversarial_weight=adv_w,
            perceptual_fn=None, compute_dtype=jnp.float64, donate=False,
        )
        batch = {
            B_lr: jnp.asarray(x), B_hr: jnp.asarray(hr),
            B_elev: jnp.asarray(elev), B_mask: jnp.asarray(mask),
        }
        new_state, metrics = step(state, batch)

        np.testing.assert_allclose(float(metrics["train/loss_G"]), float(loss_g_t), atol=1e-10, rtol=1e-10)
        np.testing.assert_allclose(float(metrics["train/loss_D"]), float(loss_d_t), atol=1e-10, rtol=1e-10)
        want_g = import_generator_params("esrgan", _sd_numpy(ref_g))
        _tree_allclose(jax.device_get(new_state.g_params), jax.device_get(want_g), atol=1e-9)
        want_d, want_bs = import_discriminator_params(_sd_numpy(ref_d))
        _tree_allclose(jax.device_get(new_state.d_params), jax.device_get(want_d), atol=1e-9)
        _tree_allclose(jax.device_get(new_state.d_batch_stats), jax.device_get(want_bs), atol=1e-9)


def test_twin_training_wd_and_one_cycle_schedule_srcnn(rng):
    """60-step f64 twin run pinning what the constant-LR twins leave open:
    Adam's COUPLED weight decay (torch adds wd*p to the gradient before the
    moment update, ``conf/optimizers/adam.yaml`` wd) and per-step scheduler
    semantics (the reference steps its schedulers with interval='step',
    ``core/task.py:59``; generators default to OneCycleLR,
    ``conf/schedulers/one_cycle_schedule.yaml``). Asserts (a) the optax
    one_cycle lr AND beta1 traces equal torch OneCycleLR's at every step
    (cycle_momentum=True is torch's default and the reference yaml keeps it,
    so the generator's Adam beta1 cycles 0.95->0.85->0.95 — a parity gap this
    test originally caught), and (b) the loss trajectory + endpoint params
    agree at near-f64 precision — any decoupled-wd, off-by-one-schedule or
    static-beta1 bug shows up orders of magnitude above the bound."""
    torch.manual_seed(16)
    ref = ref_models.srcnn.SRCNN(in_channels=3, out_channels=1).double().train()
    sd0 = _sd_numpy(ref)

    size, bs, steps = 16, 8, 60
    xtr, ytr = _synthetic_sr_data(rng, 64, size)
    order = np.stack([rng.permutation(64)[:bs] for _ in range(steps)])
    max_lr, wd = 1e-3, 1e-4

    # --- torch twin: Adam(coupled wd) + OneCycleLR stepped per batch ---
    opt = _adam(ref.parameters(), lr=max_lr, wd=wd)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=max_lr, total_steps=steps, pct_start=0.05,
        div_factor=2.0, final_div_factor=100.0,
    )
    loss_t, lr_t, b1_t = [], [], []
    for s in range(steps):
        i = order[s]
        lr_t.append(float(opt.param_groups[0]["lr"]))
        b1_t.append(float(opt.param_groups[0]["betas"][0]))
        sr = ref(_nchw(xtr[i].astype(np.float64)))
        loss = torch.nn.functional.mse_loss(sr, _nchw(ytr[i].astype(np.float64)))
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        loss_t.append(float(loss.detach()))

    with jax.enable_x64(True):
        from climsr_tpu.training.schedules import (
            one_cycle_momentum_schedule,
            one_cycle_schedule,
        )

        schedule = one_cycle_schedule(
            max_lr=max_lr, num_training_steps=steps, pct_start=0.05,
            div_factor=2.0, final_div_factor=100.0,
        )
        b1_schedule = one_cycle_momentum_schedule(num_training_steps=steps, pct_start=0.05)
        # (a) schedule trace parity: optax step s drives batch s's update,
        # exactly like torch's pre-step LR/beta read above
        lr_j = [float(schedule(s)) for s in range(steps)]
        np.testing.assert_allclose(lr_j, lr_t, rtol=1e-9, atol=1e-15)
        b1_j = [float(b1_schedule(s)) for s in range(steps)]
        np.testing.assert_allclose(b1_j, b1_t, rtol=1e-9, atol=1e-15)

        # (b) twin trajectory with schedule + momentum cycle + coupled wd
        params = import_generator_params("srcnn", sd0)
        model = create_generator("srcnn", out_channels=1, dtype=jnp.float64)
        tx = build_optimizer(
            _jax_adam_cfg(lr=max_lr, wd=wd), schedule=schedule, b1_schedule=b1_schedule
        )
        state = TrainState.create(params, tx)
        step = make_pretrain_step(model, "srcnn", tx, compute_dtype=jnp.float64, donate=False)
        loss_j = []
        for s in range(steps):
            i = order[s]
            batch = {
                B_lr: jnp.asarray(xtr[i], jnp.float64),
                B_hr: jnp.asarray(ytr[i], jnp.float64),
            }
            state, metrics = step(state, batch)
            loss_j.append(float(metrics["train/loss"]))

        # residual drift is conv reduction-order noise amplified through 60
        # coupled Adam steps (measured 5e-6 rel worst; a static beta1 gives
        # 5e-2, decoupled wd ~1e-3 — three orders above the bound)
        np.testing.assert_allclose(loss_j, loss_t, rtol=5e-5, atol=1e-9)
        want = import_generator_params("srcnn", _sd_numpy(ref))
        # same noise floor at the params (measured 8e-6 worst leaf element)
        _tree_allclose(jax.device_get(state.params), jax.device_get(want), atol=5e-5, rtol=5e-3)


# ---------------------------------------------------------------------------
# Twin-training convergence (float32, 200 steps)
# ---------------------------------------------------------------------------


def _synthetic_sr_data(rng, n, size):
    """Learnable SR-ish task: target = smooth field, input ch0 = blurred target."""
    fields = rng.normal(size=(n, size, size)).astype(np.float32)
    # separable box blurs (wrap) — cheap smooth structure
    def blur(a, k):
        out = np.copy(a)
        for axis in (1, 2):
            acc = np.zeros_like(out)
            for d in range(-k, k + 1):
                acc += np.roll(out, d, axis=axis)
            out = acc / (2 * k + 1)
        return out

    hr = blur(fields, 2)
    degraded = blur(hr, 1) + 0.05 * rng.normal(size=hr.shape).astype(np.float32)
    x = np.stack([degraded, blur(fields, 3), np.ones_like(hr)], axis=-1).astype(np.float32)
    return x, hr[..., None].astype(np.float32)


@pytest.mark.e2e
def test_twin_training_convergence_srcnn(rng):
    """200 identical steps in torch-CPU and climsr_tpu from the same init, same
    data order, same Adam: val RMSE trajectories must track within 2% + 0.002
    absolute at every checkpoint, and both must actually learn."""
    torch.manual_seed(13)
    ref = ref_models.srcnn.SRCNN(in_channels=3, out_channels=1).train()  # f32
    sd0 = _sd_numpy(ref)

    size, bs, steps, ckpt_every = 16, 8, 200, 25
    xtr, ytr = _synthetic_sr_data(rng, 128, size)
    xval, yval = _synthetic_sr_data(rng, 32, size)
    order = np.stack([rng.permutation(128)[:bs] for _ in range(steps)])

    lr = 1e-3

    # --- torch twin ---
    opt = _adam(ref.parameters(), lr=lr, wd=0.0)
    xval_t, yval_t = _nchw(xval), _nchw(yval)
    rmse_t = []
    for s in range(steps):
        idx = order[s]
        sr = ref(_nchw(xtr[idx]))
        loss = torch.nn.functional.mse_loss(sr, _nchw(ytr[idx]))
        opt.zero_grad()
        loss.backward()
        opt.step()
        if (s + 1) % ckpt_every == 0:
            with torch.no_grad():
                rmse_t.append(float(torch.sqrt(torch.mean((ref(xval_t) - yval_t) ** 2))))

    # --- climsr_tpu twin ---
    params = import_generator_params("srcnn", sd0)
    model = create_generator("srcnn", out_channels=1, dtype=jnp.float32)
    tx = build_optimizer(
        OptimizerConfig(name="adam", lr=lr, weight_decay=0.0), schedule=lambda s: lr
    )
    state = TrainState.create(params, tx)
    step = make_pretrain_step(model, "srcnn", tx, compute_dtype=jnp.float32, donate=False)

    @jax.jit
    def val_rmse(params):
        sr = model.apply({"params": params}, jnp.asarray(xval))
        return jnp.sqrt(jnp.mean(jnp.square(sr - jnp.asarray(yval))))

    rmse_j = []
    for s in range(steps):
        idx = order[s]
        batch = {B_lr: jnp.asarray(xtr[idx]), B_hr: jnp.asarray(ytr[idx])}
        state, _ = step(state, batch)
        if (s + 1) % ckpt_every == 0:
            rmse_j.append(float(val_rmse(state.params)))

    rmse_t, rmse_j = np.asarray(rmse_t), np.asarray(rmse_j)
    # both stacks learn: clear improvement over the trajectory
    assert rmse_t[-1] < rmse_t[0] * 0.9
    assert rmse_j[-1] < rmse_j[0] * 0.9
    # trajectories track: same dynamics, not just same endpoint
    np.testing.assert_allclose(rmse_j, rmse_t, rtol=0.02, atol=2e-3)


@pytest.mark.e2e
def test_twin_training_convergence_esrgan(rng):
    """100 identical steps of a tiny ESRGAN (RRDB + fusion head) in torch vs
    climsr_tpu: same init/data/Adam, L1 loss; val RMSE trajectories track."""
    torch.manual_seed(14)
    ref = ref_models.esrgan.ESRGANGenerator(
        in_channels=3, out_channels=1, nf=8, nb=1, gc=4, scaling_factor=4
    ).train()  # f32
    sd0 = _sd_numpy(ref)

    hr_size, bs, steps, ckpt_every = 32, 4, 100, 25
    _, hr_tr = _synthetic_sr_data(rng, 64, hr_size)
    _, hr_va = _synthetic_sr_data(rng, 16, hr_size)

    def assemble(hr):
        n = hr.shape[0]
        lr0 = hr[:, ::4, ::4, 0]
        lr = np.stack([lr0, np.zeros_like(lr0), np.ones_like(lr0)], axis=-1)
        elev = np.zeros((n, hr_size, hr_size, 1), np.float32)
        mask = np.ones((n, hr_size, hr_size, 1), np.float32)
        return lr.astype(np.float32), elev, mask

    lr_tr, elev_tr, mask_tr = assemble(hr_tr)
    lr_va, elev_va, mask_va = assemble(hr_va)
    order = np.stack([rng.permutation(64)[:bs] for _ in range(steps)])
    lr = 1e-3

    opt = _adam(ref.parameters(), lr=lr, wd=0.0)
    rmse_t = []
    for s in range(steps):
        i = order[s]
        sr = ref(_nchw(lr_tr[i]), _nchw(elev_tr[i]), _nchw(mask_tr[i]))
        loss = torch.nn.functional.l1_loss(sr, _nchw(hr_tr[i]))
        opt.zero_grad()
        loss.backward()
        opt.step()
        if (s + 1) % ckpt_every == 0:
            with torch.no_grad():
                out = ref(_nchw(lr_va), _nchw(elev_va), _nchw(mask_va))
                rmse_t.append(float(torch.sqrt(torch.mean((out - _nchw(hr_va)) ** 2))))

    params = import_generator_params("esrgan", sd0)
    model = create_generator("esrgan", out_channels=1, nf=8, nb=1, gc=4, dtype=jnp.float32)
    tx = build_optimizer(OptimizerConfig(name="adam", lr=lr, weight_decay=0.0), schedule=lambda s: lr)
    state = TrainState.create(params, tx)
    step = make_pretrain_step(model, "esrgan", tx, compute_dtype=jnp.float32, donate=False)

    @jax.jit
    def val_rmse(p):
        sr = model.apply({"params": p}, jnp.asarray(lr_va), jnp.asarray(elev_va), jnp.asarray(mask_va))
        return jnp.sqrt(jnp.mean(jnp.square(sr - jnp.asarray(hr_va))))

    rmse_j = []
    for s in range(steps):
        i = order[s]
        batch = {
            B_lr: jnp.asarray(lr_tr[i]), B_hr: jnp.asarray(hr_tr[i]),
            B_elev: jnp.asarray(elev_tr[i]), B_mask: jnp.asarray(mask_tr[i]),
        }
        state, _ = step(state, batch)
        if (s + 1) % ckpt_every == 0:
            rmse_j.append(float(val_rmse(state.params)))

    rmse_t, rmse_j = np.asarray(rmse_t), np.asarray(rmse_j)
    assert rmse_t[-1] < rmse_t[0]
    assert rmse_j[-1] < rmse_j[0]
    np.testing.assert_allclose(rmse_j, rmse_t, rtol=0.03, atol=2e-3)


@pytest.mark.e2e
def test_twin_training_convergence_rcan_fine_tune(rng):
    """100 identical steps of a tiny RCAN under the reference's FLAGSHIP
    fine-tune recipe (conf/experiment/rcan_fine_tuning.yaml): AdamW
    (decoupled wd=1e-4, conf/optimizers/adamw.yaml) + OneCycleLR stepped per
    batch (pct_start=0.05, div=2, final_div=100 — incl. torch's
    cycle_momentum=True default cycling Adam beta1 0.95->0.85->0.95), L1
    pixel loss, fusion head (elevation+mask conditioning). Pins the
    optimizer-coupled trajectory for the model the reference actually ships
    for inference (conf/inference/inference_rcan.yaml)."""
    torch.manual_seed(17)
    ref = ref_models.rcan.RCAN(
        n_resgroups=2, n_resblocks=2, n_feats=8, reduction=4,
        scaling_factor=4, in_channels=3, out_channels=1,
    ).train()  # f32
    sd0 = _sd_numpy(ref)

    hr_size, bs, steps, ckpt_every = 32, 4, 100, 25
    _, hr_tr = _synthetic_sr_data(rng, 64, hr_size)
    _, hr_va = _synthetic_sr_data(rng, 16, hr_size)

    def assemble(hr):
        n = hr.shape[0]
        lr0 = hr[:, ::4, ::4, 0]
        lr = np.stack([lr0, np.zeros_like(lr0), np.ones_like(lr0)], axis=-1)
        elev = np.zeros((n, hr_size, hr_size, 1), np.float32)
        mask = np.ones((n, hr_size, hr_size, 1), np.float32)
        return lr.astype(np.float32), elev, mask

    lr_tr, elev_tr, mask_tr = assemble(hr_tr)
    lr_va, elev_va, mask_va = assemble(hr_va)
    order = np.stack([rng.permutation(64)[:bs] for _ in range(steps)])
    max_lr, wd = 1e-3, 1e-4

    # --- torch twin: AdamW + OneCycleLR (cycle_momentum default ON) ---
    opt = torch.optim.AdamW(ref.parameters(), lr=max_lr, betas=(0.9, 0.999), eps=1e-8, weight_decay=wd)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=max_lr, total_steps=steps, pct_start=0.05,
        div_factor=2.0, final_div_factor=100.0,
    )
    rmse_t = []
    for s in range(steps):
        i = order[s]
        sr = ref(_nchw(lr_tr[i]), _nchw(elev_tr[i]), _nchw(mask_tr[i]))
        loss = torch.nn.functional.l1_loss(sr, _nchw(hr_tr[i]))
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        if (s + 1) % ckpt_every == 0:
            with torch.no_grad():
                out = ref(_nchw(lr_va), _nchw(elev_va), _nchw(mask_va))
                rmse_t.append(float(torch.sqrt(torch.mean((out - _nchw(hr_va)) ** 2))))

    # --- climsr_tpu twin: adamw + one_cycle lr AND beta1 schedules ---
    from climsr_tpu.training.schedules import one_cycle_momentum_schedule, one_cycle_schedule

    schedule = one_cycle_schedule(
        max_lr=max_lr, num_training_steps=steps, pct_start=0.05,
        div_factor=2.0, final_div_factor=100.0,
    )
    b1_schedule = one_cycle_momentum_schedule(num_training_steps=steps, pct_start=0.05)
    model = create_generator(
        "rcan", n_resgroups=2, n_resblocks=2, n_feats=8, reduction=4,
        in_channels=3, out_channels=1, dtype=jnp.float32,
    )
    params = import_generator_params(
        "rcan", sd0, model=model,
        example_inputs=(jnp.asarray(lr_va[:1]), jnp.asarray(elev_va[:1]), jnp.asarray(mask_va[:1])),
    )
    tx = build_optimizer(
        OptimizerConfig(name="adamw", lr=max_lr, weight_decay=wd, betas=(0.9, 0.999), eps=1e-8),
        schedule=schedule, b1_schedule=b1_schedule,
    )
    state = TrainState.create(params, tx)
    step = make_pretrain_step(model, "rcan", tx, compute_dtype=jnp.float32, donate=False)

    @jax.jit
    def val_rmse(p):
        sr = model.apply({"params": p}, jnp.asarray(lr_va), jnp.asarray(elev_va), jnp.asarray(mask_va))
        return jnp.sqrt(jnp.mean(jnp.square(sr - jnp.asarray(hr_va))))

    rmse_j = []
    for s in range(steps):
        i = order[s]
        batch = {
            B_lr: jnp.asarray(lr_tr[i]), B_hr: jnp.asarray(hr_tr[i]),
            B_elev: jnp.asarray(elev_tr[i]), B_mask: jnp.asarray(mask_tr[i]),
        }
        state, _ = step(state, batch)
        if (s + 1) % ckpt_every == 0:
            rmse_j.append(float(val_rmse(state.params)))

    rmse_t, rmse_j = np.asarray(rmse_t), np.asarray(rmse_j)
    assert rmse_t[-1] < rmse_t[0]
    assert rmse_j[-1] < rmse_j[0]
    np.testing.assert_allclose(rmse_j, rmse_t, rtol=0.03, atol=2e-3)


@pytest.mark.e2e
def test_twin_training_convergence_gan(rng):
    """30 identical fused GAN steps (tiny ESRGAN G + the full reference
    Discriminator, f32) in torch vs climsr_tpu: same init, data order and
    Adam for both nets. The torch oracle implements the fused step's
    documented semantics (D trains on the PRE-update generator's sr,
    training/tasks/gan.py docstring); loss_G/loss_D trajectories and the
    post-training validation RMSE must track. Extends the single-step GAN
    gradient golden to whole-trajectory dynamics: BN batch-stat dynamics,
    relativistic G/D coupling and two-optimizer interplay over time. The
    30-step-accumulated BN *running* stats are consumed at the end by an
    eval-mode (train=False) discriminator pass asserted against torch
    .eval(), so the running-stat EMA chain is checked by an output that
    actually normalizes with it."""
    torch.manual_seed(15)
    ref_g = ref_models.esrgan.ESRGANGenerator(
        in_channels=3, out_channels=1, nf=8, nb=1, gc=4, scaling_factor=4
    ).train()  # f32
    ref_d = ref_models.discriminator.Discriminator(in_channels=1).train()
    g_sd0, d_sd0 = _sd_numpy(ref_g), _sd_numpy(ref_d)

    hr_size, bs, steps = 128, 2, 30
    _, hr_pool = _synthetic_sr_data(rng, 16, hr_size)

    def assemble(hr):
        n = hr.shape[0]
        lr0 = hr[:, ::4, ::4, 0]
        lr = np.stack([lr0, np.zeros_like(lr0), np.ones_like(lr0)], axis=-1)
        elev = np.zeros((n, hr_size, hr_size, 1), np.float32)
        mask = np.ones((n, hr_size, hr_size, 1), np.float32)
        return lr.astype(np.float32), elev, mask

    lr_pool, elev_pool, mask_pool = assemble(hr_pool)
    order = np.stack([rng.permutation(16)[:bs] for _ in range(steps)])
    lr = 1e-4
    pixel_w, adv_w = 0.01, 0.005  # conf/task/gan_training.yaml

    # --- torch twin (fused-step semantics: D sees pre-update sr) ---
    g_opt = _adam(ref_g.parameters(), lr=lr, wd=0.0)
    d_opt = _adam(ref_d.parameters(), lr=lr, wd=0.0)
    bce = torch.nn.BCEWithLogitsLoss()
    real_l = torch.ones((bs, 1))
    fake_l = torch.zeros((bs, 1))
    hist_t = []
    for s in range(steps):
        i = order[s]
        x_t, hr_t = _nchw(lr_pool[i]), _nchw(hr_pool[i])
        sr = ref_g(x_t, _nchw(elev_pool[i]), _nchw(mask_pool[i]))
        score_real, score_fake = ref_d(hr_t), ref_d(sr)
        adv = (
            bce(score_fake - score_real.mean(), real_l)
            + bce(score_real - score_fake.mean(), fake_l)
        ) / 2
        pixel = torch.nn.functional.l1_loss(sr, hr_t)
        loss_g = pixel_w * pixel + adv_w * adv
        g_opt.zero_grad()
        d_opt.zero_grad()
        loss_g.backward()
        g_opt.step()
        sr_det = sr.detach()
        score_real, score_fake = ref_d(hr_t), ref_d(sr_det)
        loss_d = (
            bce(score_fake - score_real.mean(), fake_l)
            + bce(score_real - score_fake.mean(), real_l)
        ) / 2
        d_opt.zero_grad()
        loss_d.backward()
        d_opt.step()
        hist_t.append((float(loss_g.detach()), float(loss_d.detach())))

    # --- climsr_tpu twin (one fused jitted step) ---
    g_params = import_generator_params("esrgan", g_sd0)
    d_params, d_bs = import_discriminator_params(d_sd0)
    g_model = create_generator("esrgan", out_channels=1, nf=8, nb=1, gc=4, dtype=jnp.float32)
    d_model = create_discriminator("esrgan", in_channels=1, dtype=jnp.float32)
    cfg = OptimizerConfig(name="adam", lr=lr, weight_decay=0.0, betas=(0.9, 0.999), eps=1e-8)
    g_tx = build_optimizer(cfg, schedule=lambda s: lr)
    d_tx = build_optimizer(cfg, schedule=lambda s: lr)
    state = GANTrainState.create(g_params, g_tx, d_params, d_tx, d_bs)
    step = make_gan_step(
        g_model, d_model, "esrgan", g_tx, d_tx,
        pixel_weight=pixel_w, perceptual_weight=1.0, adversarial_weight=adv_w,
        perceptual_fn=None, compute_dtype=jnp.float32, donate=False,
    )
    hist_j = []
    for s in range(steps):
        i = order[s]
        batch = {
            B_lr: jnp.asarray(lr_pool[i]), B_hr: jnp.asarray(hr_pool[i]),
            B_elev: jnp.asarray(elev_pool[i]), B_mask: jnp.asarray(mask_pool[i]),
        }
        state, metrics = step(state, batch)
        hist_j.append((float(metrics["train/loss_G"]), float(metrics["train/loss_D"])))

    hist_t, hist_j = np.asarray(hist_t), np.asarray(hist_j)
    # trajectories track step by step (both nets' losses, BN feedback included)
    np.testing.assert_allclose(hist_j[:, 0], hist_t[:, 0], rtol=0.05, atol=5e-3)
    np.testing.assert_allclose(hist_j[:, 1], hist_t[:, 1], rtol=0.05, atol=5e-3)

    # endpoint agreement: generator output on held-out data. Pointwise drift
    # accumulates through 30 coupled G/D Adam steps in f32 (different
    # reduction orders in XLA vs torch feed back through BOTH optimizers), so
    # the bound is relative RMS, not per-pixel (measured: ~1e-2 worst pixel,
    # RMS ratio well under the 5% asserted here).
    with torch.no_grad():
        out_t = ref_g(_nchw(lr_pool), _nchw(elev_pool), _nchw(mask_pool)).numpy()
    out_j = np.transpose(
        np.asarray(
            g_model.apply(
                {"params": state.g_params},
                jnp.asarray(lr_pool), jnp.asarray(elev_pool), jnp.asarray(mask_pool),
            )
        ),
        (0, 3, 1, 2),
    )
    rms_ratio = np.sqrt(np.mean((out_j - out_t) ** 2)) / np.sqrt(np.mean(out_t**2))
    assert rms_ratio < 0.05, f"endpoint generator outputs diverged: RMS ratio {rms_ratio:.4f}"

    # eval-mode discriminator pass: normalizes with the 30-step-accumulated
    # running stats (train=False), so the BN EMA chain is consumed by an
    # asserted output, not just updated
    _consume_running_stats(ref_d, d_model, state, hr_pool)


def _consume_running_stats(ref_d, d_model, state, hr_pool):
    ref_d.eval()
    with torch.no_grad():
        d_out_t = ref_d(torch.from_numpy(np.transpose(hr_pool, (0, 3, 1, 2)).copy())).numpy()
    d_out_j = np.asarray(
        d_model.apply(
            {"params": state.d_params, "batch_stats": state.d_batch_stats},
            jnp.asarray(hr_pool),
            train=False,
        )
    )
    d_rms = np.sqrt(np.mean((d_out_j - d_out_t) ** 2)) / max(np.sqrt(np.mean(d_out_t**2)), 1e-6)
    assert d_rms < 0.05, f"eval-mode D scores on accumulated running stats diverged: {d_rms:.4f}"


@pytest.mark.e2e
def test_gan_differentiable_perceptual_gradient_golden(rng):
    """EXACT f64 golden for task.differentiable_perceptual=true: one fused GAN
    step with the perceptual gradient flowing (torch twin computes the VGG-
    feature L1 withOUT no_grad) on shared VGG weights must reproduce torch's
    loss and updated generator params at 1e-9. Falsifiable by construction:
    the stop-gradient variant's updated params are asserted to differ
    materially — the perceptual pull is orders above the tolerance."""
    from test_vgg_parity import _torch_vgg19_features

    from climsr_tpu.losses.perceptual import build_perceptual_loss
    from climsr_tpu.models.vgg import load_torchvision_weights

    torch.manual_seed(18)
    features = _torch_vgg19_features().double()
    truncated = features[:8]  # conv2_2 pre-ReLU
    for p_ in truncated.parameters():
        p_.requires_grad = False
    sd = {f"features.{k}": v.detach().numpy() for k, v in features.state_dict().items()}
    with jax.enable_x64(True):
        # converted INSIDE the x64 scope: jnp.asarray would otherwise round
        # the f64 torch weights to f32 and cap agreement at ~1e-7
        vgg_vars = load_torchvision_weights(sd)

    ref_g = ref_models.esrgan.ESRGANGenerator(
        in_channels=3, out_channels=1, nf=8, nb=1, gc=4, scaling_factor=4
    ).double().train()
    ref_d = ref_models.discriminator.Discriminator(in_channels=1).double().train()
    g_sd0, d_sd0 = _sd_numpy(ref_g), _sd_numpy(ref_d)

    n, hr_size = 2, 128
    x = rng.normal(size=(n, 32, 32, 3))
    hr = rng.normal(size=(n, hr_size, hr_size, 1))
    elev = rng.normal(size=(n, hr_size, hr_size, 1))
    mask = np.ones((n, hr_size, hr_size, 1), np.float64)
    pixel_w, perc_w, adv_w = 0.01, 1.0, 0.005
    bce = torch.nn.BCEWithLogitsLoss()
    real_l = torch.ones((n, 1), dtype=torch.float64)
    fake_l = torch.zeros((n, 1), dtype=torch.float64)

    g_opt = _adam(ref_g.parameters())
    d_opt = _adam(ref_d.parameters())
    sr_t = ref_g(_nchw(x), _nchw(elev), _nchw(mask))
    score_real, score_fake = ref_d(_nchw(hr)), ref_d(sr_t)
    adv = (bce(score_fake - score_real.mean(), real_l)
           + bce(score_real - score_fake.mean(), fake_l)) / 2
    sr3 = torch.cat([sr_t] * 3, dim=1)
    hr3 = torch.cat([_nchw(hr)] * 3, dim=1)
    perc = torch.nn.functional.l1_loss(truncated(hr3), truncated(sr3))  # WITH grad
    loss_g_t = (pixel_w * torch.nn.functional.l1_loss(sr_t, _nchw(hr))
                + perc_w * perc + adv_w * adv)
    g_opt.zero_grad()
    d_opt.zero_grad()
    loss_g_t.backward()
    g_opt.step()

    with jax.enable_x64(True):
        def run(differentiable):
            perceptual_fn = build_perceptual_loss(
                differentiable=differentiable, compute_dtype=jnp.float64,
                cutoff="conv2_2", variables=vgg_vars,
            )
            g_params = import_generator_params("esrgan", g_sd0)
            d_params, d_bs = import_discriminator_params(d_sd0)
            g_model = create_generator("esrgan", out_channels=1, nf=8, nb=1, gc=4, dtype=jnp.float64)
            d_model = create_discriminator("esrgan", in_channels=1, dtype=jnp.float64)
            g_tx = build_optimizer(_jax_adam_cfg(), schedule=lambda s: 1e-3)
            d_tx = build_optimizer(_jax_adam_cfg(), schedule=lambda s: 1e-3)
            state = GANTrainState.create(g_params, g_tx, d_params, d_tx, d_bs)
            step = make_gan_step(
                g_model, d_model, "esrgan", g_tx, d_tx,
                pixel_weight=pixel_w, perceptual_weight=perc_w, adversarial_weight=adv_w,
                perceptual_fn=perceptual_fn, compute_dtype=jnp.float64, donate=False,
            )
            batch = {
                B_lr: jnp.asarray(x), B_hr: jnp.asarray(hr),
                B_elev: jnp.asarray(elev), B_mask: jnp.asarray(mask),
            }
            new_state, metrics = step(state, batch)
            return new_state, metrics

        new_state, metrics = run(differentiable=True)
        np.testing.assert_allclose(float(metrics["train/loss_G"]), float(loss_g_t), atol=1e-10, rtol=1e-10)
        want_g = import_generator_params("esrgan", _sd_numpy(ref_g))
        _tree_allclose(jax.device_get(new_state.g_params), jax.device_get(want_g), atol=1e-9)

        # falsifiability: without the perceptual gradient the G update differs
        # by far more than the tolerance above
        ng_state, _ = run(differentiable=False)
        flat_diff = [
            float(np.max(np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))))
            for a, b in zip(
                jax.tree_util.tree_leaves(jax.device_get(ng_state.g_params)),
                jax.tree_util.tree_leaves(jax.device_get(want_g)),
            )
        ]
        assert max(flat_diff) > 1e-5, (
            f"stop-gradient control matched the with-grad golden ({max(flat_diff):.2e}); "
            "the golden above is vacuous"
        )


@pytest.mark.e2e
def test_twin_training_gan_differentiable_perceptual(rng):
    """10 fused GAN steps with task.differentiable_perceptual=true vs a torch
    twin whose VGG-feature L1 keeps its gradient (the reference's opt-out of
    the no-grad quirk), at reference-like loss weights. Both stacks share the
    SAME VGG weights, so trajectory + endpoint agreement proves the perceptual
    gradient flows into the generator identically over time (the exact-math
    falsifiability lives in the f64 golden above)."""
    from test_vgg_parity import _torch_vgg19_features

    from climsr_tpu.losses.perceptual import build_perceptual_loss
    from climsr_tpu.models.vgg import load_torchvision_weights

    torch.manual_seed(17)
    features = _torch_vgg19_features()
    truncated = features[:8]  # conv2_2 pre-ReLU (cheap cutoff, same both sides)
    for p in truncated.parameters():
        p.requires_grad = False
    sd = {f"features.{k}": v.detach().numpy() for k, v in features.state_dict().items()}
    vgg_vars = load_torchvision_weights(sd)

    ref_g = ref_models.esrgan.ESRGANGenerator(
        in_channels=3, out_channels=1, nf=8, nb=1, gc=4, scaling_factor=4
    ).train()
    ref_d = ref_models.discriminator.Discriminator(in_channels=1).train()
    g_sd0, d_sd0 = _sd_numpy(ref_g), _sd_numpy(ref_d)

    hr_size, bs, steps = 128, 2, 10
    _, hr_pool = _synthetic_sr_data(rng, 8, hr_size)
    lr0 = hr_pool[:, ::4, ::4, 0]
    lr_pool = np.stack([lr0, np.zeros_like(lr0), np.ones_like(lr0)], axis=-1).astype(np.float32)
    elev_pool = np.zeros((8, hr_size, hr_size, 1), np.float32)
    mask_pool = np.ones((8, hr_size, hr_size, 1), np.float32)
    order = np.stack([rng.permutation(8)[:bs] for _ in range(steps)])
    lr = 1e-4
    pixel_w, perc_w, adv_w = 0.01, 0.05, 0.005

    def perc_torch(sr, hr_t):  # WITH grad — torch mirror of differentiable=True
        sr3 = torch.cat([sr] * 3, dim=1)
        hr3 = torch.cat([hr_t] * 3, dim=1)
        return torch.nn.functional.l1_loss(truncated(hr3), truncated(sr3))

    g_opt = _adam(ref_g.parameters(), lr=lr, wd=0.0)
    d_opt = _adam(ref_d.parameters(), lr=lr, wd=0.0)
    bce = torch.nn.BCEWithLogitsLoss()
    real_l, fake_l = torch.ones((bs, 1)), torch.zeros((bs, 1))
    hist_t = []
    for s in range(steps):
        i = order[s]
        x_t, hr_t = _nchw(lr_pool[i]), _nchw(hr_pool[i])
        sr = ref_g(x_t, _nchw(elev_pool[i]), _nchw(mask_pool[i]))
        score_real, score_fake = ref_d(hr_t), ref_d(sr)
        adv = (bce(score_fake - score_real.mean(), real_l)
               + bce(score_real - score_fake.mean(), fake_l)) / 2
        loss_g = (pixel_w * torch.nn.functional.l1_loss(sr, hr_t)
                  + perc_w * perc_torch(sr, hr_t) + adv_w * adv)
        g_opt.zero_grad()
        d_opt.zero_grad()
        loss_g.backward()
        g_opt.step()
        sr_det = sr.detach()
        score_real, score_fake = ref_d(hr_t), ref_d(sr_det)
        loss_d = (bce(score_fake - score_real.mean(), fake_l)
                  + bce(score_real - score_fake.mean(), real_l)) / 2
        d_opt.zero_grad()
        loss_d.backward()
        d_opt.step()
        hist_t.append((float(loss_g.detach()), float(loss_d.detach())))
    hist_t = np.asarray(hist_t)

    def run_jax(differentiable: bool) -> np.ndarray:
        perceptual_fn = build_perceptual_loss(
            differentiable=differentiable, compute_dtype=jnp.float32,
            cutoff="conv2_2", variables=vgg_vars,
        )
        g_params = import_generator_params("esrgan", g_sd0)
        d_params, d_bs = import_discriminator_params(d_sd0)
        g_model = create_generator("esrgan", out_channels=1, nf=8, nb=1, gc=4, dtype=jnp.float32)
        d_model = create_discriminator("esrgan", in_channels=1, dtype=jnp.float32)
        cfg = OptimizerConfig(name="adam", lr=lr, weight_decay=0.0)
        g_tx, d_tx = build_optimizer(cfg, lambda s: lr), build_optimizer(cfg, lambda s: lr)
        state = GANTrainState.create(g_params, g_tx, d_params, d_tx, d_bs)
        step = make_gan_step(
            g_model, d_model, "esrgan", g_tx, d_tx,
            pixel_weight=pixel_w, perceptual_weight=perc_w, adversarial_weight=adv_w,
            perceptual_fn=perceptual_fn, compute_dtype=jnp.float32, donate=False,
        )
        hist = []
        for s in range(steps):
            i = order[s]
            batch = {
                B_lr: jnp.asarray(lr_pool[i]), B_hr: jnp.asarray(hr_pool[i]),
                B_elev: jnp.asarray(elev_pool[i]), B_mask: jnp.asarray(mask_pool[i]),
            }
            state, metrics = step(state, batch)
            hist.append((float(metrics["train/loss_G"]), float(metrics["train/loss_D"])))
        return np.asarray(hist), endpoint_rms(state, g_model)

    def endpoint_rms(state, g_model):
        with torch.no_grad():
            out_t = ref_g(_nchw(lr_pool), _nchw(elev_pool), _nchw(mask_pool)).numpy()
        out_j = np.transpose(
            np.asarray(g_model.apply(
                {"params": state.g_params},
                jnp.asarray(lr_pool), jnp.asarray(elev_pool), jnp.asarray(mask_pool),
            )),
            (0, 3, 1, 2),
        )
        return np.sqrt(np.mean((out_j - out_t) ** 2)) / np.sqrt(np.mean(out_t ** 2))

    hist_j, rms_diff = run_jax(differentiable=True)
    np.testing.assert_allclose(hist_j[:, 0], hist_t[:, 0], rtol=0.05, atol=5e-3)
    np.testing.assert_allclose(hist_j[:, 1], hist_t[:, 1], rtol=0.05, atol=5e-3)
    assert rms_diff < 0.02, f"endpoint generator diverged from torch twin: {rms_diff:.4f}"
