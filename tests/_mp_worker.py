# -*- coding: utf-8 -*-
"""Worker for the 2-process jax.distributed CPU test (see test_multiprocess.py).

Each process owns 4 virtual CPU devices; together they form an 8-device
'data' mesh spanning two processes — the smallest faithful model of a
multi-host TPU pod. Exercises the multi-host input path: put_global /
process_local_slice / device_prefetch assembling global arrays from
process-local batch slices, and a jitted global reduction over the mesh.
"""
import sys


def main(coordinator: str, num_processes: int, process_id: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    # same persistent compile cache as conftest.py: the two fresh worker
    # processes otherwise recompile every jit on every suite run (the single
    # largest chunk of this test's ~2-9 min wall time)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.distributed.initialize(coordinator, num_processes=num_processes, process_id=process_id)

    import numpy as np
    import jax.numpy as jnp

    from climsr_tpu.data.pipeline import device_prefetch
    from climsr_tpu.parallel.mesh import (
        batch_sharding,
        create_mesh,
        process_local_slice,
        put_global,
        put_replicated,
    )

    assert jax.process_count() == num_processes, jax.process_count()
    assert len(jax.devices()) == 4 * num_processes, len(jax.devices())
    mesh = create_mesh(None, ("data",))
    bsharding = batch_sharding(mesh)

    # --- put_global: batch-sharded assembly from per-process slices --------
    global_batch = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    local = global_batch[process_local_slice(16)]
    arr = put_global(local, bsharding)
    assert arr.shape == (16, 3), arr.shape
    total = float(jax.jit(jnp.sum, out_shardings=None)(arr))
    assert abs(total - global_batch.sum()) < 1e-4, (total, global_batch.sum())

    # --- put_replicated across processes ------------------------------------
    rep = put_replicated(np.full((5,), 7.0, np.float32), mesh)
    assert abs(float(jnp.sum(rep)) - 35.0) < 1e-5

    # --- device_prefetch slices + assembles per process ---------------------
    def it():
        for i in range(3):
            yield {"x": np.full((8, 2), float(i), np.float32), "__valid__": 8}

    seen = 0
    for batch in device_prefetch(it(), bsharding):
        assert batch["x"].shape == (8, 2)
        s = float(jax.jit(jnp.sum)(batch["x"]))
        assert abs(s - 16.0 * seen) < 1e-4, (s, seen)
        seen += 1
    assert seen == 3

    # --- a real train step over the 2-process mesh --------------------------
    from climsr_tpu.config.schemas import OptimizerConfig
    from climsr_tpu.models import create_generator
    from climsr_tpu.training.optimizers import build_optimizer
    from climsr_tpu.training.tasks.pretrain import make_pretrain_step
    from climsr_tpu.training.train_state import TrainState

    model = create_generator("srcnn", out_channels=1, use_pallas=False)
    rng = np.random.default_rng(0)  # same seed on every process
    global_bs = 8
    batch_np = {
        "lr": rng.normal(size=(global_bs, 16, 16, 1)).astype(np.float32),
        "hr": rng.normal(size=(global_bs, 16, 16, 1)).astype(np.float32),
        "elevation": np.zeros((global_bs, 16, 16, 1), np.float32),
        "mask": np.ones((global_bs, 16, 16, 1), np.float32),
    }
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(batch_np["lr"][:1]))
    tx = build_optimizer(OptimizerConfig(name="adamw", lr=1e-3), lambda s: 1e-3)
    state = TrainState.create(variables["params"], tx)
    state = jax.tree_util.tree_map(lambda x: put_replicated(np.asarray(x), mesh), state)
    sl = process_local_slice(global_bs)
    batch = put_global({k: v[sl] for k, v in batch_np.items()}, bsharding)
    step = make_pretrain_step(model, "srcnn", tx, compute_dtype=jnp.float32, donate=False)
    new_state, metrics = step(state, batch)
    jax.block_until_ready(new_state.params)
    loss = float(metrics["train/loss"])
    assert np.isfinite(loss), loss
    print(f"MP-TRAIN-LOSS p{process_id} {loss:.6f}", flush=True)

    # --- spatial-shard step on a DP(2) x spatial(4) mesh over 2 processes ---
    # (the data axis spans the process boundary, the halo ppermute rides the
    # intra-process 'spatial' axis — the natural multi-host pod layout)
    sp_mesh = create_mesh(None, ("data", "spatial"), last_axis_size=4)
    sp_model = create_generator("esrgan", nf=8, nb=1, gc=4, out_channels=1, use_pallas=False)
    sp_bs = 4
    sp_np = {
        "lr": rng.normal(size=(sp_bs, 32, 16, 3)).astype(np.float32),
        "hr": rng.normal(size=(sp_bs, 128, 64, 1)).astype(np.float32),
        "elevation": rng.normal(size=(sp_bs, 128, 64, 1)).astype(np.float32),
        "mask": np.ones((sp_bs, 128, 64, 1), np.float32),
    }
    sp_vars = sp_model.init(
        jax.random.PRNGKey(1),
        jnp.asarray(sp_np["lr"][:1]),
        jnp.asarray(sp_np["elevation"][:1]),
        jnp.asarray(sp_np["mask"][:1]),
    )
    sp_tx = build_optimizer(OptimizerConfig(name="adamw", lr=1e-3), lambda s: 1e-3)
    sp_state = TrainState.create(sp_vars["params"], sp_tx)
    sp_state = jax.tree_util.tree_map(lambda x: put_replicated(np.asarray(x), sp_mesh), sp_state)
    sp_sl = process_local_slice(sp_bs)
    sp_batch = put_global({k: v[sp_sl] for k, v in sp_np.items()}, batch_sharding(sp_mesh))
    sp_step = make_pretrain_step(
        sp_model, "esrgan", sp_tx, compute_dtype=jnp.float32, donate=False,
        spatial={"mesh": sp_mesh, "axis": "spatial", "halo": 6, "scale": 4, "batch_axis": "data"},
    )
    sp_state2, sp_metrics = sp_step(sp_state, sp_batch)
    jax.block_until_ready(sp_state2.params)
    sp_loss = float(sp_metrics["train/loss"])
    assert np.isfinite(sp_loss), sp_loss
    print(f"MP-SPATIAL-LOSS p{process_id} {sp_loss:.6f}", flush=True)

    # --- full Trainer.fit -> top-k checkpoint -> resume across the mesh -----
    # (round-2 finding: the 2-process test stopped at a bare train step;
    # checkpointing/validation/top-k/restore were unexercised multi-process.)
    if len(sys.argv) > 5:
        data_dir, out_dir = sys.argv[4], sys.argv[5]
        from glob import glob

        from climsr_tpu.cli.train import main as train_main

        overrides = [
            "experiment=srcnn_pre_training_debug",
            f"datamodule.cfg.data_path={data_dir}",
            "training.batch_size=8",
            "training.validation_batch_size=8",
            "training.num_workers=0",
            "trainer.max_epochs=2",
            "trainer.limit_train_batches=2",
            "trainer.limit_val_batches=1",
            "trainer.limit_test_batches=1",
            "trainer.save_top_k=2",
            "trainer.log_every_n_steps=1",
            "trainer.zero_stage=2",  # grad reduce-scatter + sharded opt state
            "trainer.device_augment=false",
            "print_config=false",
            f"training.output_dir={out_dir}",
        ]
        hp = train_main(list(overrides))
        assert hp is not None and np.isfinite(hp), hp
        ckpt_dirs = sorted(glob(f"{out_dir}/outputs/runs/srcnn/*/checkpoints"))
        assert len(ckpt_dirs) == 1, ckpt_dirs
        steps1 = sorted(int(p.split("/")[-1]) for p in glob(f"{ckpt_dirs[0]}/[0-9]*"))
        assert steps1, "no checkpoint steps written"
        print(f"MP-FIT-HP p{process_id} {hp:.6f}", flush=True)

        hp2 = train_main(
            list(overrides)
            + [f"trainer.resume_from_checkpoint={ckpt_dirs[0]}", "trainer.max_epochs=3"]
        )
        assert hp2 is not None and np.isfinite(hp2), hp2
        ckpt_dirs2 = sorted(glob(f"{out_dir}/outputs/runs/srcnn/*/checkpoints"))
        steps2 = sorted(
            int(p.split("/")[-1]) for d in ckpt_dirs2 for p in glob(f"{d}/[0-9]*")
        )
        # the resumed run continued past the first run's last step
        assert steps2[-1] > steps1[-1], (steps1, steps2)
        print(f"MP-RESUME-HP p{process_id} {hp2:.6f}", flush=True)

        # GAN fit across the 2-process mesh: fused G+D step, BN batch_stats in
        # the state, top-k checkpoint of a GANTrainState saved shard-by-shard
        # (orbax consumes the global sharded jax.Arrays directly; round-4
        # change away from the replicate-everything process_allgather path)
        # (tiny nets, no VGG graph — perceptual factor 0 skips building it)
        hp3 = train_main([
            "experiment=esrgan_fine_tune_no_gan_pre_training",
            f"datamodule.cfg.data_path={data_dir}",
            "datamodule.cfg.europe_extent=false",
            "training.batch_size=8",
            "training.validation_batch_size=8",
            "training.num_workers=0",
            "training.model_weights=null",
            "generator={name: esrgan, nf: 8, nb: 1, gc: 4}",
            "discriminator={name: esrgan, out_channels: 16}",
            "task.cfg.perceptual_loss_factor=0.0",
            "trainer.max_epochs=1",
            "trainer.limit_train_batches=2",
            "trainer.limit_val_batches=1",
            "trainer.limit_test_batches=1",
            "trainer.save_top_k=1",
            "trainer.zero_stage=2",
            "trainer.device_augment=false",
            "trainer.log_every_n_steps=1",
            "print_config=false",
            f"training.output_dir={out_dir}/gan",
        ])
        assert hp3 is not None and np.isfinite(hp3), hp3
        gan_ckpts = glob(f"{out_dir}/gan/outputs/runs/esrgan/*/checkpoints/[0-9]*")
        assert gan_ckpts, "GAN checkpoint not written under jax.distributed"
        print(f"MP-GAN-HP p{process_id} {hp3:.6f}", flush=True)

    print(f"MP-WORKER-OK p{process_id}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
