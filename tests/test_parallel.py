# -*- coding: utf-8 -*-
"""Mesh/sharding tests on the virtual 8-device CPU mesh: DP train step,
ZeRO-1 opt-state sharding, halo-exchange convs, spatial-sharded SR."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from climsr_tpu.parallel.halo import sharded_conv2d, spatial_sharded_apply
from climsr_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicated,
    shard_leading_dim_if_divisible,
)


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(8, ("data",))


def test_mesh_creation(mesh):
    assert mesh.shape["data"] == 8


def test_sharded_conv_matches_unsharded(mesh, rng):
    x = jnp.asarray(rng.normal(size=(2, 64, 32, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 3, 8)).astype(np.float32) * 0.1)
    got = sharded_conv2d(x, k, mesh)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_sharded_conv_5x5(mesh, rng):
    x = jnp.asarray(rng.normal(size=(1, 40, 16, 2)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(5, 5, 2, 4)).astype(np.float32) * 0.1)
    got = sharded_conv2d(x, k, mesh)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_sharded_conv_even_kernel_rejected(mesh, rng):
    x = jnp.zeros((1, 16, 8, 2), jnp.float32)
    k = jnp.zeros((2, 3, 2, 4), jnp.float32)
    with pytest.raises(ValueError, match="odd kernel"):
        sharded_conv2d(x, k, mesh)


def test_spatial_sharded_apply_halo_zero(mesh, rng):
    """halo=0 must degrade to plain sharding (no neighbor rows), not break on
    the x[:, -0:] slicing pathology — this is reachable via run.py's
    spatial_halo clamp when shards are 1 row tall."""
    from climsr_tpu.ops.resize import nearest_upsample

    frame = jnp.asarray(rng.normal(size=(1, 64, 32, 1)).astype(np.float32))
    fn = lambda x: nearest_upsample(x, 4)  # noqa: E731
    got = spatial_sharded_apply(fn, mesh, halo=0, scale=4)(frame)
    np.testing.assert_allclose(np.asarray(got), np.asarray(fn(frame)), atol=1e-6)


def test_process_local_slice_rejects_non_divisible(monkeypatch):
    from climsr_tpu.parallel import mesh as pm

    monkeypatch.setattr(jax, "process_count", lambda: 3)
    assert pm.process_local_slice(9) == slice(0, 3)
    with pytest.raises(ValueError, match="not divisible|does not divide"):
        pm.process_local_slice(10)


def test_broadcast_string_single_host_and_length_guard():
    from climsr_tpu.parallel.mesh import broadcast_string

    assert broadcast_string("runs/2026-08-18_00-00-00") == "runs/2026-08-18_00-00-00"
    with pytest.raises(ValueError, match="exceeds max_len"):
        broadcast_string("x" * 300)


def test_spatial_sharded_apply_exact_for_local_fn(mesh, rng):
    # fn with small receptive field (identity upsample) -> sharded == direct
    from climsr_tpu.ops.resize import nearest_upsample

    frame = jnp.asarray(rng.normal(size=(1, 64, 32, 1)).astype(np.float32))
    fn = lambda x: nearest_upsample(x, 4)  # noqa: E731
    sharded = spatial_sharded_apply(fn, mesh, halo=4, scale=4)
    got = sharded(frame)
    want = fn(frame)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_spatial_sharded_apply_conv_interior_exact(mesh, rng):
    # one 3x3 'same' conv: halo=2 > RF/2=1 -> interior rows match exactly
    k = jnp.asarray(rng.normal(size=(3, 3, 1, 1)).astype(np.float32) * 0.2)
    dn_shape = (1, 64, 16, 1)
    dn = jax.lax.conv_dimension_numbers(dn_shape, k.shape, ("NHWC", "HWIO", "NHWC"))

    def fn(x):
        return jax.lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn)

    frame = jnp.asarray(rng.normal(size=dn_shape).astype(np.float32))
    got = spatial_sharded_apply(fn, mesh, halo=2, scale=1)(frame)
    want = fn(frame)
    np.testing.assert_allclose(np.asarray(got[:, 2:-2]), np.asarray(want[:, 2:-2]), atol=1e-5)


def test_zero1_opt_state_sharding_rules(mesh):
    tree = {
        "big": jnp.zeros((64, 512)),  # divisible by 8, big enough
        "small": jnp.zeros((4, 4)),
        "odd": jnp.zeros((63, 512)),
    }
    rules = shard_leading_dim_if_divisible(tree, mesh, min_size=1024)
    assert rules["big"].spec == P("data", None)
    assert rules["small"].spec == P()
    assert rules["odd"].spec == P()


@pytest.mark.e2e
def test_dp_train_step_on_mesh(mesh, rng):
    """Full pretrain step with batch sharded over 8 devices + sharded opt state."""
    import optax

    from climsr_tpu.config.schemas import OptimizerConfig
    from climsr_tpu.models import create_generator
    from climsr_tpu.training.optimizers import build_optimizer
    from climsr_tpu.training.tasks.pretrain import make_pretrain_step
    from climsr_tpu.training.train_state import TrainState

    model = create_generator("esrgan", nf=8, nb=1, gc=4, out_channels=1)
    bsharding = batch_sharding(mesh)
    batch_np = {
        "lr": rng.normal(size=(16, 8, 8, 3)).astype(np.float32),
        "hr": rng.normal(size=(16, 32, 32, 1)).astype(np.float32),
        "elevation": rng.normal(size=(16, 32, 32, 1)).astype(np.float32),
        "mask": np.ones((16, 32, 32, 1), np.float32),
    }
    var = model.init(jax.random.PRNGKey(0), jnp.asarray(batch_np["lr"][:1]),
                     jnp.asarray(batch_np["elevation"][:1]), jnp.asarray(batch_np["mask"][:1]))
    tx = build_optimizer(OptimizerConfig(name="adamw", lr=1e-3), lambda s: 1e-3)
    state = TrainState.create(var["params"], tx)
    state = state.replace(
        params=jax.device_put(state.params, replicated(mesh)),
        opt_state=jax.tree_util.tree_map(
            jax.device_put, state.opt_state, shard_leading_dim_if_divisible(state.opt_state, mesh, min_size=256)
        ),
        step=jax.device_put(state.step, replicated(mesh)),
    )
    batch = {k: jax.device_put(v, bsharding) for k, v in batch_np.items()}
    step = make_pretrain_step(model, "esrgan", tx, compute_dtype=jnp.float32, donate=False)
    new_state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["train/loss"]))
    # loss under sharding == loss computed locally
    step_local = make_pretrain_step(model, "esrgan", tx, compute_dtype=jnp.float32, donate=False)
    _, metrics_local = step_local(
        TrainState.create(var["params"], tx), {k: jnp.asarray(v) for k, v in batch_np.items()}
    )
    np.testing.assert_allclose(float(metrics["train/loss"]), float(metrics_local["train/loss"]), rtol=1e-5)


def test_zero23_shard_largest_divisible_dim(mesh):
    from climsr_tpu.parallel.mesh import shard_largest_divisible_dim

    tree = {
        "conv_kernel": jnp.zeros((3, 3, 64, 48)),  # largest divisible dim = cin 64
        "leading": jnp.zeros((512, 7)),
        "none_divisible": jnp.zeros((3, 3, 7, 5)),
        "small": jnp.zeros((8, 8)),
    }
    rules = shard_largest_divisible_dim(tree, mesh, min_size=1024)
    assert rules["conv_kernel"].spec == P(None, None, "data", None)
    assert rules["leading"].spec == P("data", None)
    assert rules["none_divisible"].spec == P()
    assert rules["small"].spec == P()


@pytest.mark.e2e
@pytest.mark.parametrize("stage", [2, 3])
def test_zero_stage_step_matches_unsharded(mesh, rng, stage):
    """ZeRO-2/3 train steps (gradient reduce-scatter; stage-3 persistent param
    sharding + gather-on-use) are numerically identical to the plain DP step,
    and stage 3 actually leaves the parameters sharded between steps.
    Reference capability: conf/plugins/deepspeed_offload_stage_3.yaml."""
    from climsr_tpu.config.schemas import OptimizerConfig
    from climsr_tpu.models import create_generator
    from climsr_tpu.parallel.mesh import shard_largest_divisible_dim
    from climsr_tpu.training.optimizers import build_optimizer
    from climsr_tpu.training.tasks.pretrain import make_pretrain_step
    from climsr_tpu.training.train_state import TrainState

    model = create_generator("esrgan", nf=16, nb=1, gc=8, out_channels=1)
    batch_np = {
        "lr": rng.normal(size=(16, 8, 8, 3)).astype(np.float32),
        "hr": rng.normal(size=(16, 32, 32, 1)).astype(np.float32),
        "elevation": rng.normal(size=(16, 32, 32, 1)).astype(np.float32),
        "mask": np.ones((16, 32, 32, 1), np.float32),
    }
    var = model.init(jax.random.PRNGKey(0), jnp.asarray(batch_np["lr"][:1]),
                     jnp.asarray(batch_np["elevation"][:1]), jnp.asarray(batch_np["mask"][:1]))
    tx = build_optimizer(OptimizerConfig(name="adam", lr=1e-3), lambda s: 1e-3)

    # plain DP reference step
    ref_state, ref_metrics = make_pretrain_step(
        model, "esrgan", tx, compute_dtype=jnp.float32, donate=False
    )(TrainState.create(var["params"], tx), {k: jnp.asarray(v) for k, v in batch_np.items()})

    shardings = shard_largest_divisible_dim(var["params"], mesh, min_size=256)
    state = TrainState.create(var["params"], tx)
    state = state.replace(
        params=jax.tree_util.tree_map(jax.device_put, state.params, shardings)
        if stage >= 3
        else jax.device_put(state.params, replicated(mesh)),
        opt_state=jax.tree_util.tree_map(
            jax.device_put, state.opt_state,
            shard_largest_divisible_dim(state.opt_state, mesh, min_size=256),
        ),
        step=jax.device_put(state.step, replicated(mesh)),
    )
    batch = {k: jax.device_put(v, batch_sharding(mesh)) for k, v in batch_np.items()}
    step = make_pretrain_step(
        model, "esrgan", tx, compute_dtype=jnp.float32, donate=False,
        zero={"stage": stage, "shardings": shardings},
    )
    new_state, metrics = step(state, batch)

    np.testing.assert_allclose(
        float(metrics["train/loss"]), float(ref_metrics["train/loss"]), rtol=1e-6
    )
    got = jax.device_get(new_state.params)
    want = jax.device_get(ref_state.params)
    for g, w in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-6)
    if stage >= 3:
        # persistent parameter sharding survived the step
        big_leaf_shardings = [
            leaf.sharding.spec
            for leaf, spec in zip(
                jax.tree_util.tree_leaves(new_state.params),
                jax.tree_util.tree_leaves(shardings),
            )
            if spec.spec != P()
        ]
        assert big_leaf_shardings and all(s != P() for s in big_leaf_shardings)


def test_device_store_indexed_step(mesh, rng):
    """Device-resident store + index-batch step produces finite loss."""
    from climsr_tpu.config.schemas import OptimizerConfig
    from climsr_tpu.models import create_generator
    from climsr_tpu.training.optimizers import build_optimizer
    from climsr_tpu.training.tasks.pretrain import make_pretrain_step
    from climsr_tpu.training.train_state import TrainState

    store = {
        "hr": jnp.asarray(rng.normal(size=(32, 32, 32, 1)).astype(np.float32)),
        "elevation": jnp.asarray(rng.normal(size=(32, 32, 32, 1)).astype(np.float32)),
        "mask": jnp.ones((32, 32, 32, 1), jnp.float32),
    }
    model = create_generator("esrgan", nf=8, nb=1, gc=4, out_channels=1)
    var = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1, 32, 32, 1)),
                     jnp.zeros((1, 32, 32, 1)))
    tx = build_optimizer(OptimizerConfig(name="adam", lr=1e-3), lambda s: 1e-3)
    state = TrainState.create(var["params"], tx)
    step = make_pretrain_step(
        model, "esrgan", tx, compute_dtype=jnp.float32, donate=False,
        augment=dict(scale=4), store=store,
    )
    idx = jnp.asarray(np.arange(8, dtype=np.int32))
    new_state, metrics = step(state, idx)
    assert np.isfinite(float(metrics["train/loss"]))
    assert int(new_state.step) == 1


@pytest.mark.e2e  # compile-heavy on the CPU mesh; full tier only
def test_spatial_sharded_multi_esrgan_interior_exact(mesh, rng):
    """Whole-generator spatial sharding of the real fusion forward: with a
    halo covering the receptive field, every row at least RF away from the
    FRAME edges matches the unsharded whole-frame forward exactly (shard
    boundaries are seamless); frame-edge rows differ only because the sharded
    edge devices reflect-pad where the unsharded conv zero-pads."""
    from climsr_tpu.models import create_generator
    from climsr_tpu.parallel.halo import spatial_sharded_apply_multi

    h, w, scale = 192, 32, 4
    model = create_generator("esrgan", nf=8, nb=1, gc=4, out_channels=1)
    lr = jnp.asarray(rng.normal(size=(1, h, w, 3)).astype(np.float32))
    elev = jnp.asarray(rng.normal(size=(1, h * scale, w * scale, 1)).astype(np.float32))
    mask = jnp.ones((1, h * scale, w * scale, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), lr[:, :32], elev[:, : 32 * scale], mask[:, : 32 * scale])

    def gen_fn(x, e, m):
        return model.apply(params, x, e, m)

    sharded = spatial_sharded_apply_multi(
        gen_fn, mesh, halo=20, scale=scale, input_scales=(1, scale, scale)
    )
    got = np.asarray(sharded(lr, elev, mask))
    want = np.asarray(gen_fn(lr, elev, mask))
    assert got.shape == want.shape == (1, h * scale, w * scale, 1)
    rf = 24 * scale  # generous receptive-field bound at HR
    np.testing.assert_allclose(got[:, rf:-rf], want[:, rf:-rf], atol=1e-5)
    # edge rows: reflect-vs-zero padding difference stays bounded
    assert float(np.max(np.abs(got - want))) < 1.0


def test_zero3_gather_keeps_gradients_sharded(mesh, rng):
    """zero_gather_on_use's custom VJP: the parameter cotangent carries the
    ZeRO shardings instead of the replicated annotation a plain
    with_sharding_constraint transpose would pin (which forces an all-reduced
    full gradient per device — the memory/traffic ZeRO-3 exists to avoid)."""
    from climsr_tpu.models import create_generator
    from climsr_tpu.parallel.mesh import shard_largest_divisible_dim, zero_gather_on_use

    model = create_generator("esrgan", nf=16, nb=1, gc=8, out_channels=1, use_pallas=False)
    lr = jnp.asarray(rng.normal(size=(8, 8, 8, 3)), jnp.float32)
    elev = jnp.asarray(rng.normal(size=(8, 32, 32, 1)), jnp.float32)
    mask = jnp.ones((8, 32, 32, 1), jnp.float32)
    hr = jnp.asarray(rng.normal(size=(8, 32, 32, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), lr[:1], elev[:1], mask[:1])["params"]
    shardings = shard_largest_divisible_dim(params, mesh, min_size=256)
    params = jax.tree_util.tree_map(jax.device_put, params, shardings)
    bsh = batch_sharding(mesh)
    lr, elev, mask, hr = (jax.device_put(x, bsh) for x in (lr, elev, mask, hr))

    @jax.jit
    def grads(p):
        def loss(p):
            sr = model.apply({"params": zero_gather_on_use(p, shardings)}, lr, elev, mask)
            return jnp.mean(jnp.abs(sr - hr))

        return jax.grad(loss)(p)

    g = grads(params)
    n_should = sum(1 for s in jax.tree_util.tree_leaves(shardings) if any(a is not None for a in s.spec))
    n_sharded = sum(
        1 for l in jax.tree_util.tree_leaves(g) if any(a is not None for a in l.sharding.spec)
    )
    assert n_should > 0
    assert n_sharded == n_should, (n_sharded, n_should)
