# -*- coding: utf-8 -*-
"""Spatial-shard (context-parallel) TRAINING tests on the virtual CPU mesh.

The differentiable H-sharded forward (parallel/halo.py
``spatial_sharded_model_forward``) must be exact — forward AND gradient —
away from the frame's top/bottom edges whenever the halo covers the
receptive field (within RF of the frame edge the sharded path reflect-pads
once up front while the unsharded model zero-pads every conv layer, so those
rows legitimately differ). SRCNN's receptive field is 6 rows (9x9 + 1x1 +
5x5 convs), small enough to test exactness on a thin frame.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climsr_tpu.parallel.halo import spatial_sharded_model_forward
from climsr_tpu.parallel.mesh import batch_sharding, create_mesh, replicated

RF = 6  # SRCNN receptive-field radius in rows


@pytest.fixture(scope="module")
def mesh():
    # 2-way data parallel x 4-way spatial — the composed training mesh
    return create_mesh(8, ("data", "spatial"), last_axis_size=4)


def _srcnn(rng, h=48, w=16, batch=2, channels=3):
    from climsr_tpu.models import create_generator

    model = create_generator("srcnn", out_channels=1, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(batch, h, w, channels)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params, x


def test_spatial_forward_interior_exact(mesh, rng):
    model, params, x = _srcnn(rng)
    want = model.apply({"params": params}, x)
    fwd = spatial_sharded_model_forward(model, "srcnn", mesh, halo=8, scale=4, batch_axis="data")
    got = fwd(params, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(got[:, RF:-RF], want[:, RF:-RF], atol=1e-5, rtol=1e-5)


def test_spatial_gradient_interior_exact(mesh, rng):
    """grad through the ppermute halo exchange == unsharded grad, when the
    loss reads only rows whose dependencies avoid the frame edges."""
    model, params, x = _srcnn(rng)
    hr = jnp.asarray(rng.normal(size=(2, 48, 16, 1)), jnp.float32)

    def loss_plain(p):
        sr = model.apply({"params": p}, x)
        return jnp.mean(jnp.square(sr[:, RF:-RF] - hr[:, RF:-RF]))

    fwd = spatial_sharded_model_forward(model, "srcnn", mesh, halo=8, scale=4, batch_axis="data")

    def loss_sharded(p):
        return jnp.mean(jnp.square(fwd(p, x)[:, RF:-RF] - hr[:, RF:-RF]))

    l0, g0 = jax.value_and_grad(loss_plain)(params)
    l1, g1 = jax.value_and_grad(loss_sharded)(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-4)


@pytest.mark.e2e  # compile-heavy on the CPU mesh; full tier only
def test_spatial_fusion_nondivisible_height(mesh, rng):
    """ESRGAN fusion path on a 113-row-like frame: H=30 pads to 32 over 4
    shards, output crops back to 120 HR rows."""
    from climsr_tpu.models import create_generator

    model = create_generator("esrgan", nf=8, nb=1, gc=4, out_channels=1, use_pallas=False, dtype=jnp.float32)
    lr = jnp.asarray(rng.normal(size=(2, 30, 16, 3)), jnp.float32)
    elev = jnp.asarray(rng.normal(size=(2, 120, 64, 1)), jnp.float32)
    mask = jnp.ones((2, 120, 64, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), lr, elev, mask)["params"]
    fwd = spatial_sharded_model_forward(model, "esrgan", mesh, halo=4, scale=4, batch_axis="data")
    got = fwd(params, lr, elev, mask)
    assert got.shape == (2, 120, 64, 1)
    assert np.isfinite(np.asarray(got)).all()
    # halo=4 << the RRDB receptive field, so shard seams are approximate:
    # bound the seam error instead of demanding exactness (8 LR rows/shard
    # means every output row is within RF of a seam here — worst case)
    want = np.asarray(model.apply({"params": params}, lr, elev, mask))
    diff = np.abs(np.asarray(got) - want)
    assert diff.max() < 0.5, diff.max()
    assert diff.mean() < 0.02, diff.mean()


def test_spatial_pretrain_step(mesh, rng):
    """Full fused train step (fwd + bwd + adam) with the spatially-sharded
    forward: runs on the 2x4 mesh, finite loss close to the unsharded step."""
    from climsr_tpu.config.schemas import OptimizerConfig
    from climsr_tpu.models import create_generator
    from climsr_tpu.training.optimizers import build_optimizer
    from climsr_tpu.training.tasks.pretrain import make_pretrain_step
    from climsr_tpu.training.train_state import TrainState

    model = create_generator("esrgan", nf=8, nb=1, gc=4, out_channels=1, use_pallas=False, dtype=jnp.float32)
    batch_np = {
        "lr": rng.normal(size=(4, 32, 16, 3)).astype(np.float32),
        "hr": rng.normal(size=(4, 128, 64, 1)).astype(np.float32),
        "elevation": rng.normal(size=(4, 128, 64, 1)).astype(np.float32),
        "mask": np.ones((4, 128, 64, 1), np.float32),
    }
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch_np["lr"][:1]),
        jnp.asarray(batch_np["elevation"][:1]),
        jnp.asarray(batch_np["mask"][:1]),
    )
    tx = build_optimizer(OptimizerConfig(name="adamw", lr=1e-3), lambda s: 1e-3)

    def fresh_state():
        s = TrainState.create(variables["params"], tx)
        return jax.device_put(s, replicated(mesh))

    bsharding = batch_sharding(mesh)
    batch = {k: jax.device_put(jnp.asarray(v), bsharding) for k, v in batch_np.items()}

    spatial = {"mesh": mesh, "axis": "spatial", "halo": 6, "scale": 4, "batch_axis": "data"}
    step_sp = make_pretrain_step(model, "esrgan", tx, compute_dtype=jnp.float32, donate=False, spatial=spatial)
    step_plain = make_pretrain_step(model, "esrgan", tx, compute_dtype=jnp.float32, donate=False)

    s1, m1 = step_sp(fresh_state(), batch)
    s0, m0 = step_plain(fresh_state(), batch)
    l1, l0 = float(m1["train/loss"]), float(m0["train/loss"])
    assert np.isfinite(l1)
    assert int(jax.device_get(s1.step)) == 1
    # halo=6 < RF: approximate at shard seams, but the loss must track closely
    assert abs(l1 - l0) / max(abs(l0), 1e-6) < 0.05, (l1, l0)
    # continued spatial steps make progress on the fixed batch
    s, last = s1, l1
    for _ in range(5):
        s, m = step_sp(s, batch)
        last = float(m["train/loss"])
    assert last < l1, (last, l1)


def test_spatial_composes_with_zero3(mesh, rng):
    """ZeRO-3 persistent parameter sharding over 'data' + spatial H-sharding
    over 'spatial' in one step: the gather-on-use constraint feeds the
    shard_map's replicated params input, gradients land back sharded."""
    from climsr_tpu.config.schemas import OptimizerConfig
    from climsr_tpu.models import create_generator
    from climsr_tpu.parallel.mesh import shard_largest_divisible_dim
    from climsr_tpu.training.optimizers import build_optimizer
    from climsr_tpu.training.tasks.pretrain import make_pretrain_step
    from climsr_tpu.training.train_state import TrainState

    model = create_generator("esrgan", nf=8, nb=1, gc=4, out_channels=1, use_pallas=False, dtype=jnp.float32)
    batch_np = {
        "lr": rng.normal(size=(4, 32, 16, 3)).astype(np.float32),
        "hr": rng.normal(size=(4, 128, 64, 1)).astype(np.float32),
        "elevation": rng.normal(size=(4, 128, 64, 1)).astype(np.float32),
        "mask": np.ones((4, 128, 64, 1), np.float32),
    }
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch_np["lr"][:1]),
        jnp.asarray(batch_np["elevation"][:1]),
        jnp.asarray(batch_np["mask"][:1]),
    )
    tx = build_optimizer(OptimizerConfig(name="adamw", lr=1e-4), lambda s: 1e-4)
    state = TrainState.create(variables["params"], tx)
    shardings = shard_largest_divisible_dim(state.params, mesh, min_size=256)
    state = state.replace(
        step=jax.device_put(state.step, replicated(mesh)),
        params=jax.tree_util.tree_map(jax.device_put, state.params, shardings),
        opt_state=jax.tree_util.tree_map(
            jax.device_put, state.opt_state,
            shard_largest_divisible_dim(state.opt_state, mesh, min_size=256),
        ),
    )
    bsh = batch_sharding(mesh)
    batch = {k: jax.device_put(jnp.asarray(v), bsh) for k, v in batch_np.items()}
    step = make_pretrain_step(
        model, "esrgan", tx, compute_dtype=jnp.float32, donate=False,
        zero={"stage": 3, "shardings": shardings},
        spatial={"mesh": mesh, "axis": "spatial", "halo": 6, "scale": 4, "batch_axis": "data"},
    )
    s, m = step(state, batch)
    assert np.isfinite(float(m["train/loss"]))
    assert int(jax.device_get(s.step)) == 1


@pytest.mark.e2e
def test_spatial_deep_trunk_error_split(mesh, rng):
    """Documented-bound assertion for the DEEP-trunk regime (receptive field
    >> shard height), per docs/operations.md "Spatial-shard accuracy":

    - SEAM (halo truncation) error — sharded vs an EDGE-FAIR baseline (the
      unsharded model on the same reflect-padded frame, cropped) — must be
      numerically negligible even with halo << RF: cross-seam influence
      decays geometrically through the 0.2-scaled residuals (measured ~1e-7
      at the europe geometry, scripts/measure_halo_error.py).
    - FRAME-EDGE deviation (reflect-once vs per-layer zero padding) is a
      boundary-condition difference confined to rows near the frame's
      physical top/bottom; interior rows must match the unsharded model.

    ESRGAN nb=3 keeps the RF (~90 LR rows) far above the 16-row shards while
    staying CPU-cheap; nb=11 at the real 452x452 europe extent is measured
    offline by the script and documented in docs/operations.md.
    """
    from climsr_tpu.models import create_generator

    model = create_generator("esrgan", nf=8, nb=3, gc=4, out_channels=1, use_pallas=False, dtype=jnp.float32)
    h, scale, halo = 64, 4, 6
    lr = jnp.asarray(rng.normal(size=(2, h, 32, 3)), jnp.float32)
    elev = jnp.asarray(rng.normal(size=(2, h * scale, 128, 1)), jnp.float32)
    mask = jnp.ones((2, h * scale, 128, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), lr, elev, mask)["params"]
    hr = jnp.asarray(rng.normal(size=(2, h * scale, 128, 1)), jnp.float32)

    def loss_from(sr):
        return jnp.mean(jnp.abs(sr - hr))

    fwd = spatial_sharded_model_forward(model, "esrgan", mesh, halo=halo, scale=scale, batch_axis="data")
    got = np.asarray(fwd(params, lr, elev, mask))
    got_grad = jax.grad(lambda p: loss_from(fwd(p, lr, elev, mask)))(params)

    def fair_apply(p):
        pad_lr = ((0, 0), (halo, halo), (0, 0), (0, 0))
        pad_hr = ((0, 0), (halo * scale, halo * scale), (0, 0), (0, 0))
        out = model.apply(
            {"params": p},
            jnp.pad(lr, pad_lr, mode="reflect"),
            jnp.pad(elev, pad_hr, mode="reflect"),
            jnp.pad(mask, pad_hr, mode="reflect"),
        )
        return out[:, halo * scale : out.shape[1] - halo * scale]

    fair = np.asarray(fair_apply(params))
    fair_grad = jax.grad(lambda p: loss_from(fair_apply(p)))(params)

    # seam error: negligible despite halo (6) << RF (~90 rows)
    seam = np.abs(got - fair)
    assert seam.max() < 1e-4, f"seam fwd error {seam.max():.2e} exceeds the documented bound"
    g = np.concatenate([np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(got_grad)])
    f = np.concatenate([np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(fair_grad)])
    rel = np.linalg.norm(g - f) / max(np.linalg.norm(f), 1e-12)
    assert rel < 1e-4, f"seam grad rel-L2 {rel:.2e} exceeds the documented bound"

    # frame-edge deviation: confined to the physical edges — interior exact
    want = np.asarray(model.apply({"params": params}, lr, elev, mask))
    edge = np.abs(got - want)
    k = 16 * scale  # rows influenced by the edge treatment at this depth/decay
    assert edge[:, k:-k].max() < 1e-3, (
        f"edge treatment leaked {edge[:, k:-k].max():.2e} into interior rows"
    )
    assert edge.max() > 1e-3, (
        "edge rows match zero-padding exactly — the reflect-pad path is "
        "apparently not engaged and the assertions above are vacuous"
    )


@pytest.mark.e2e  # compile-heavy on the CPU mesh; full tier only
def test_spatial_rcan_exact_channel_attention(mesh, rng):
    """RCAN's channel attention global-average-pools each feature map; naive
    H-sharding pools the LOCAL shard instead (measured 3e-2 max deviation at
    the europe geometry, docs/operations.md). spatial_sharded_model_forward
    clones in spatial_axis/spatial_halo so the pool becomes a halo-masked
    psum over the mesh axis.

    (a) Unit: the psum pool inside shard_map equals the unsharded global
        mean EXACTLY on row-skewed data where local means differ wildly, and
        a local-pool control differs by orders of magnitude — direct
        falsifiability, immune to gate saturation.
    (b) Integration: the cloned full-model sharded forward matches the
        unsharded model in the interior (halo >= conv RF) and its gradients
        flow (psum transposes on the backward path).
    """
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from climsr_tpu.models import create_generator
    from climsr_tpu.models.rcan import CALayer
    from climsr_tpu.parallel.halo import _halo_pad_reflect

    # ---- (a) pooling unit test -------------------------------------------
    halo = 4
    x = rng.normal(size=(2, 64, 16, 8)).astype(np.float32)
    x[:, :32] += 3.0  # strong row dependence: local means differ by ~1.5
    x = jnp.asarray(x)
    ca_plain = CALayer(channel=8, reduction=4)
    variables = ca_plain.init(jax.random.PRNGKey(1), x)
    want = np.asarray(ca_plain.apply(variables, x))

    def run_sharded(module):
        def local(xl):
            padded = _halo_pad_reflect(xl, halo, "spatial")
            out = module.apply(variables, padded)
            return out[:, halo : out.shape[1] - halo]

        return shard_map(
            local, mesh=mesh,
            in_specs=P(None, "spatial", None, None),
            out_specs=P(None, "spatial", None, None),
        )(x)

    exact = np.asarray(run_sharded(CALayer(channel=8, reduction=4,
                                           spatial_axis="spatial", spatial_halo=halo)))
    np.testing.assert_allclose(exact, want, atol=1e-5, rtol=1e-5)

    naive = np.asarray(run_sharded(ca_plain))  # local pooling, pre-fix behavior
    assert np.abs(naive - want).max() > 100 * max(np.abs(exact - want).max(), 1e-7), (
        "local-pool control matched the global mean; the exactness assert is vacuous"
    )

    # non-divisible frame heights: spatial_sharded_model_forward reflect-pads
    # the frame bottom, and those phantom rows land in the LAST shard's own
    # region — spatial_pad must mask them so the pool spans exactly the
    # original rows (here: x's last 3 rows are phantoms; the reference mean
    # is over the true 61)
    pad = 3
    want_pad = np.asarray(ca_plain.apply(variables, x[:, : 64 - pad]))
    exact_pad = np.asarray(run_sharded(CALayer(
        channel=8, reduction=4, spatial_axis="spatial", spatial_halo=halo, spatial_pad=pad,
    )))
    np.testing.assert_allclose(exact_pad[:, : 64 - pad], want_pad, atol=1e-5, rtol=1e-5)

    # ---- (b) full-model integration --------------------------------------
    model = create_generator(
        "rcan", n_resgroups=2, n_resblocks=2, n_feats=8, reduction=4,
        out_channels=1, dtype=jnp.float32,
    )
    h, scale, mhalo = 64, 4, 15  # trunk RF ~ 12 rows < halo
    lr = jnp.asarray(rng.normal(size=(2, h, 32, 3)), jnp.float32)
    elev = jnp.asarray(rng.normal(size=(2, h * scale, 128, 1)), jnp.float32)
    mask = jnp.ones((2, h * scale, 128, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), lr, elev, mask)["params"]
    want_m = np.asarray(model.apply({"params": params}, lr, elev, mask))

    fwd = spatial_sharded_model_forward(model, "rcan", mesh, halo=mhalo, scale=scale, batch_axis="data")
    got = np.asarray(fwd(params, lr, elev, mask))
    k = 20 * scale  # frame-edge-affected rows (reflect-vs-zero boundary choice)
    interior = np.abs(got - want_m)[:, k:-k]
    assert interior.max() < 1e-4, f"sharded rcan interior mismatch: {interior.max():.2e}"

    hr = jnp.asarray(rng.normal(size=(2, h * scale, 128, 1)), jnp.float32)
    g = jax.grad(lambda p: jnp.mean(jnp.abs(fwd(p, lr, elev, mask) - hr)))(params)
    assert all(np.isfinite(np.asarray(v)).all() for v in jax.tree_util.tree_leaves(g))


@pytest.mark.e2e
def test_cli_spatial_fit_europe_extent(tmp_path):
    """The flagship use case end-to-end: europe-extent 452x452 frames (113-row
    LR, non-divisible by the 4-way spatial axis) trained through the real CLI
    with plugins=spatial_shard on the DP(2) x spatial(4) mesh."""
    import glob

    from climsr_tpu.cli.train import main
    from climsr_tpu.data.synthetic import make_synthetic_dataset

    ds = make_synthetic_dataset(tmp_path / "ds", n_tiles_per_stage=(4, 2, 2), europe_extent=True)
    out = tmp_path / "out"
    hp = main([
        "experiment=esrgan_pre_training",
        f"datamodule.cfg.data_path={ds}",
        "datamodule.cfg.europe_extent=true",
        "plugins=spatial_shard",
        "generator={name: esrgan, nf: 8, nb: 1, gc: 4}",
        "training.batch_size=2",
        "training.validation_batch_size=2",
        "trainer.max_epochs=1",
        "trainer.limit_train_batches=2",
        "trainer.limit_val_batches=1",
        "trainer.limit_test_batches=1",
        "trainer.log_every_n_steps=1",
        "print_config=false",
        f"training.output_dir={out}",
    ])
    assert hp is not None and np.isfinite(hp)
    rows = open(glob.glob(f"{out}/outputs/runs/esrgan/*")[0] + "/metrics.csv").read()
    assert "train/loss" in rows and "val/rmse" in rows


def test_spatial_gan_step(mesh, rng):
    """Spatial-shard x GAN (round-4 verdict item 7): the europe-extent GAN
    fine-tunes train on WHOLE 452x452 frames (reference climate_dataset.py:53)
    with the size-agnostic RFB discriminator (rfb_esrgan.py:54
    AdaptiveAvgPool2d) — a real too-large-per-chip workload. The generator
    runs through the differentiable halo exchange; its H-sharded sr flows
    into the D and VGG graphs under GSPMD. Asserts the fused spatial G+D step
    tracks the unsharded step's losses and keeps training."""
    from climsr_tpu.config.schemas import OptimizerConfig
    from climsr_tpu.losses.perceptual import build_perceptual_loss
    from climsr_tpu.models import create_discriminator, create_generator
    from climsr_tpu.training.optimizers import build_optimizer
    from climsr_tpu.training.tasks.gan import make_gan_step
    from climsr_tpu.training.train_state import GANTrainState

    g_model = create_generator("esrgan", nf=8, nb=1, gc=4, out_channels=1, use_pallas=False, dtype=jnp.float32)
    # out_channels=8: the width-reduced ESRGAN D keeps the CPU-mesh compile
    # inside the e2e budget (the production RFB D's 512ch x 14x14 FC alone
    # pushed this test to ~11 min); GSPMD's sharded-sr handling is identical
    d_model = create_discriminator("esrgan", in_channels=1, out_channels=8, dtype=jnp.float32)
    batch_np = {
        "lr": rng.normal(size=(4, 32, 32, 3)).astype(np.float32),
        "hr": rng.normal(size=(4, 128, 128, 1)).astype(np.float32),
        "elevation": rng.normal(size=(4, 128, 128, 1)).astype(np.float32),
        "mask": np.ones((4, 128, 128, 1), np.float32),
    }
    g_vars = g_model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(batch_np["lr"][:1]),
        jnp.asarray(batch_np["elevation"][:1]),
        jnp.asarray(batch_np["mask"][:1]),
    )
    d_vars = d_model.init(jax.random.PRNGKey(1), jnp.asarray(batch_np["hr"][:1]), train=False)
    g_tx = build_optimizer(OptimizerConfig(name="adamw", lr=1e-4), lambda s: 1e-4)
    d_tx = build_optimizer(OptimizerConfig(name="adamw", lr=1e-4), lambda s: 1e-4)

    def fresh_state():
        s = GANTrainState.create(
            g_vars["params"], g_tx, d_vars["params"], d_tx, d_vars.get("batch_stats")
        )
        return jax.device_put(s, replicated(mesh))

    bsharding = batch_sharding(mesh)
    batch = {k: jax.device_put(jnp.asarray(v), bsharding) for k, v in batch_np.items()}
    # conv1_2: the shallowest VGG cutoff that still runs perceptual features
    # through the GSPMD-sharded sr — conv2_2+ blows the CPU-mesh compile past
    # the e2e budget (the real-depth graph runs on the TPU GAN bench)
    perceptual_fn = build_perceptual_loss(compute_dtype=jnp.float32, cutoff="conv1_2")

    spatial = {"mesh": mesh, "axis": "spatial", "halo": 6, "scale": 4, "batch_axis": "data"}
    step_sp = make_gan_step(
        g_model, d_model, "esrgan", g_tx, d_tx, perceptual_fn=perceptual_fn,
        compute_dtype=jnp.float32, donate=False, spatial=spatial,
    )
    step_plain = make_gan_step(
        g_model, d_model, "esrgan", g_tx, d_tx, perceptual_fn=perceptual_fn,
        compute_dtype=jnp.float32, donate=False,
    )

    s1, m1 = step_sp(fresh_state(), batch)
    s0, m0 = step_plain(fresh_state(), batch)
    for key in ("train/loss_G", "train/loss_D", "train/perceptual_loss"):
        v1, v0 = float(m1[key]), float(m0[key])
        assert np.isfinite(v1), (key, v1)
        # halo=6 < RF: approximate at shard seams, but each loss must track
        assert abs(v1 - v0) <= 0.05 * max(abs(v0), 1e-3), (key, v1, v0)
    # continued spatial steps keep both optimizers moving
    s, _ = step_sp(s1, batch)
    assert int(jax.device_get(s.step)) == 2
    gdiff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.g_params, s.g_params
    )
    ddiff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.d_params, s.d_params
    )
    assert max(jax.tree_util.tree_leaves(gdiff)) > 0
    assert max(jax.tree_util.tree_leaves(ddiff)) > 0


def test_cli_spatial_gan_fit(tmp_path):
    """Spatial-shard GAN fine-tune through the real CLI (the combination the
    round-3/4 trainer guard rejected): 2-way spatial mesh, one fused G+D
    step. Width-reduced ESRGAN D keeps the CPU-mesh compile in budget; the
    production RFB D is covered by test_spatial_gan_step's architecture
    notes and the reference parity suite."""
    import glob

    from climsr_tpu.cli.train import main
    from climsr_tpu.data.synthetic import make_synthetic_dataset

    ds_root = make_synthetic_dataset(tmp_path / "ds", n_tiles_per_stage=(8, 2, 2))
    out = tmp_path / "out"
    hp = main([
        "experiment=esrgan_fine_tune_no_gan_pre_training",
        f"datamodule.cfg.data_path={ds_root}",
        "datamodule.cfg.europe_extent=false",
        "training.batch_size=4",
        "training.model_weights=null",
        "generator={name: esrgan, nf: 8, nb: 1, gc: 4}",
        "discriminator={name: esrgan, out_channels: 8}",
        "task.cfg.perceptual_loss_factor=0.0",
        "trainer.spatial_shard_size=2",
        "trainer.max_epochs=1",
        "trainer.limit_train_batches=1",
        "trainer.limit_val_batches=1",
        "trainer.limit_test_batches=1",
        "print_config=false",
        f"training.output_dir={out}",
    ])
    assert hp is not None and np.isfinite(hp)
    rows = open(glob.glob(f"{out}/outputs/runs/esrgan/*")[0] + "/metrics.csv").read()
    assert "train/loss_G" in rows
