# -*- coding: utf-8 -*-
"""The Trainer: epoch loop, validation/test with the metric suite, checkpoints.

Role parity with the reference's PL ``Trainer.fit``/``.test`` orchestration
(``climsr/cli/train.py:32-144`` + ``climsr/core/task.py``):

- num_training_steps/warmup inference from the datamodule
  (``task.py:62-92``): steps_per_epoch = len(train_loader) // accum,
- per-epoch validation computing the 16-metric suite; ``hp_metric`` =
  epoch-mean of per-step val/rmse (``task.py:388-391``),
- top-k checkpointing on hp_metric + early stopping (patience, mode=min),
- fine-tune generator-only restore, full resume,
- ``terminate_on_nan``, ``limit_*_batches``, ``fast_dev_run``,
- test after fit over per-variable test loaders (multi-loader "temp" mode).

TPU design: one jitted train step (donated state), data sharded over the
mesh's data axis by the prefetcher, metrics computed on device and only
pulled to host at logging boundaries.
"""
from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import climsr_tpu.consts as consts
from climsr_tpu.config.schemas import (
    DiscriminatorConfig,
    GeneratorConfig,
    OptimizerConfig,
    SchedulerConfig,
    TaskConfig,
    TrainerConfig,
    TrainingConfig,
    TransformsCfg,
)
from climsr_tpu.data.pipeline import VALID_KEY, DataLoader, RawTileLoader, device_prefetch
from climsr_tpu.losses.perceptual import build_perceptual_loss
from climsr_tpu.models import FUSION_GENERATORS, create_discriminator, create_generator
from climsr_tpu.parallel.mesh import batch_sharding, create_mesh, put_replicated, replicated
from climsr_tpu.training.checkpoint import CheckpointManager, restore_generator_params
from climsr_tpu.training.optimizers import build_optimizer
from climsr_tpu.training.schedules import resolve_momentum_schedule, resolve_schedule
from climsr_tpu.training.tasks.gan import make_gan_step, make_gan_val_losses
from climsr_tpu.training.tasks.pretrain import make_eval_step, make_pretrain_step
from climsr_tpu.training.train_state import GANTrainState, TrainState, param_count
from climsr_tpu.utils.logging import MetricLogger

B = consts.batch_items
T = consts.training
logger = logging.getLogger(__name__)

_GENERATOR_KWARGS = {
    "in_channels", "out_channels", "scaling_factor", "nf", "nb", "gc",
    "n_resgroups", "n_resblocks", "n_feats", "reduction",
    "num_rrdb_blocks", "num_rrfdb_blocks",
}


class Trainer:
    def __init__(
        self,
        datamodule,
        generator_cfg: GeneratorConfig,
        task_cfg: TaskConfig,
        trainer_cfg: TrainerConfig,
        training_cfg: TrainingConfig,
        discriminator_cfg: Optional[DiscriminatorConfig] = None,
        optimizers: Optional[Dict[str, Optional[OptimizerConfig]]] = None,
        schedulers: Optional[Dict[str, Optional[SchedulerConfig]]] = None,
        workdir: Optional[str] = None,
        config_snapshot: Optional[Dict] = None,
        callbacks: Optional[List] = None,
        logger_cfg=None,
    ):
        self.callbacks = callbacks or []
        self.dm = datamodule
        self.generator_cfg = generator_cfg
        self.task_cfg = task_cfg
        self.trainer_cfg = trainer_cfg
        self.training_cfg = training_cfg
        self.discriminator_cfg = discriminator_cfg
        self.optimizers_cfg = optimizers or {}
        self.schedulers_cfg = schedulers or {}
        self.config_snapshot = config_snapshot
        self.is_gan = task_cfg.name == "gan_training"
        self.generator_type = generator_cfg.name

        self.workdir = Path(workdir or trainer_cfg.default_root_dir or "outputs/run")
        self.workdir.mkdir(parents=True, exist_ok=True)
        self.metric_logger = MetricLogger.from_config(self.workdir, logger_cfg)

        self.compute_dtype = jnp.bfloat16 if trainer_cfg.precision == "bf16" else jnp.float32
        # Preemption safety: TPU pods receive SIGTERM ahead of eviction. The
        # handler only sets a flag; the train loop saves a checkpoint at the
        # next step boundary and exits cleanly (resume via
        # trainer.resume_from_checkpoint). The reference has no analogue —
        # its recovery is fully manual (SURVEY.md §5.3).
        self.preempted = False
        self._prev_sigterm = None
        try:
            import signal

            self._prev_sigterm = signal.signal(signal.SIGTERM, self._on_sigterm)
        except ValueError:  # not in the main thread (e.g. some test runners)
            pass
        if trainer_cfg.deterministic:
            # Reference pl.Trainer(deterministic=True) analogue: pin matmul /
            # conv accumulation to full precision so results are bit-stable
            # across runs and independent of XLA's precision autotuning.
            # NOTE: like torch.use_deterministic_algorithms this is
            # process-global and stays in effect after the trainer exits
            # (jax.config has no scoped variant usable across our jits).
            jax.config.update("jax_default_matmul_precision", "highest")
        # Spatial-shard (context-parallel) training: append a trailing
        # 'spatial' mesh axis; frames are H-sharded over it inside the train
        # step with a differentiable halo exchange (parallel/halo.py). The
        # batch stays sharded over 'data', so DP x spatial compose.
        self.spatial_size = int(getattr(trainer_cfg, "spatial_shard_size", 0) or 0)
        mesh_axes = tuple(trainer_cfg.mesh_axes)
        if self.spatial_size > 1:
            if len(mesh_axes) == 1:
                mesh_axes = (mesh_axes[0], "spatial")
            if mesh_axes[-1] != "spatial":
                raise ValueError(
                    f"trainer.spatial_shard_size={self.spatial_size} needs a trailing "
                    f"'spatial' mesh axis, but trainer.mesh_axes={mesh_axes} — drop the "
                    f"custom mesh_axes or end it with 'spatial'."
                )
            self.mesh = create_mesh(trainer_cfg.num_devices, mesh_axes, last_axis_size=self.spatial_size)
        else:
            self.mesh = create_mesh(trainer_cfg.num_devices, mesh_axes)
        self.batch_sharding = batch_sharding(self.mesh)

        if getattr(trainer_cfg, "auto_scale_batch_size", False):
            # must run BEFORE the loaders / num_training_steps inference so
            # schedules and epoch lengths see the scaled batch (PL Tuner order)
            self._auto_scale_batch_size()

        # ---- data loaders -------------------------------------------------
        cfg = self.dm.cfg
        self.device_augment = trainer_cfg.device_augment
        self.train_store = None
        if self.device_augment:
            t = cfg.transforms or TransformsCfg()
            self._augment_kwargs = dict(
                scale=cfg.scale_factor,
                use_elevation=cfg.use_elevation,
                use_mask=cfg.use_mask,
                v_flip=t.v_flip,
                h_flip=t.h_flip,
                random_90_rotation=t.random_90_rotation,
            )
            n_tiles = len(self.dm.train_dataset)
            hr_sz = self.dm.train_dataset.hr_size
            est_bytes = n_tiles * hr_sz * hr_sz * 4 * 3  # hr + elev + mask, f32
            use_store = trainer_cfg.device_resident_data is True or (
                trainer_cfg.device_resident_data == "auto" and est_bytes <= trainer_cfg.device_store_max_bytes
            )
            # device-resident stores are a single-host optimization; under
            # jax.distributed each process streams its slice of every batch
            # through the (multi-host-correct) device_prefetch path instead
            if jax.process_count() > 1:
                use_store = False
            if use_store:
                from climsr_tpu.data.pipeline import EpochIndexSampler, build_device_store

                logger.info("Device-resident tile store: %d tiles, ~%.2f GB HBM", n_tiles, est_bytes / 1e9)
                self.train_store = build_device_store(self.dm.train_dataset, num_workers=cfg.num_workers)
                self.train_loader = EpochIndexSampler(n_tiles, cfg.batch_size, shuffle=True, seed=cfg.seed)
            else:
                self.train_loader = RawTileLoader(
                    self.dm.train_dataset,
                    batch_size=cfg.batch_size,
                    shuffle=True,
                    num_workers=cfg.num_workers,
                    seed=cfg.seed,
                )
        else:
            self._augment_kwargs = None
            self.train_loader = DataLoader(
                self.dm.train_dataset,
                batch_size=cfg.batch_size,
                shuffle=True,
                num_workers=cfg.num_workers,
                seed=cfg.seed,
            )
        self.val_loader = DataLoader(
            self.dm.val_dataset,
            batch_size=cfg.validation_batch_size,
            shuffle=False,
            drop_last=False,
            pad_last=True,
            num_workers=cfg.num_workers,
        )
        self.test_loaders = [
            DataLoader(ds, batch_size=cfg.validation_batch_size, shuffle=False, drop_last=False,
                       pad_last=True, num_workers=cfg.num_workers)
            for ds in self.dm.test_datasets
        ]
        # device-resident eval stores (validation runs every epoch; keeping the
        # val/test samples on HBM removes all per-step host transfers). Built
        # LAZILY on first use: test stores must not pin HBM during the whole
        # fit when test() may never run.
        self._eval_stores: Dict[int, Dict] = {}
        self._eval_store_datasets: Dict[int, Any] = {}
        self._eval_store_workers = cfg.num_workers
        if self.train_store is not None:
            self._eval_store_datasets[id(self.val_loader)] = self.dm.val_dataset
            for loader, ds in zip(self.test_loaders, self.dm.test_datasets):
                self._eval_store_datasets[id(loader)] = ds
            self._gather_eval = jax.jit(
                lambda store, idx: jax.tree_util.tree_map(lambda v: jnp.take(v, idx, axis=0), store)
            )

        # num_training_steps inference (reference task.py:62-83)
        accum = max(1, trainer_cfg.accumulate_grad_batches)
        self._accum = accum
        # Float limits <= 1.0 are fractions of the loader (_limit() / reference
        # pl.Trainer semantics); an int(0.5) here would zero out every schedule.
        steps_per_epoch = self._limit_len(len(self.train_loader), trainer_cfg.limit_train_batches)
        self.steps_per_epoch = steps_per_epoch
        self.num_training_steps = (steps_per_epoch // accum) * trainer_cfg.max_epochs
        if trainer_cfg.max_steps and -1 < trainer_cfg.max_steps < self.num_training_steps:
            self.num_training_steps = trainer_cfg.max_steps
        logger.info("Inferred number of training steps: %d", self.num_training_steps)
        # loop-termination limit in MICRO-batch steps (global_step counts
        # micro-batches; max_steps counts optimizer steps like PL), with the
        # PL sentinel max_steps=-1 meaning unlimited
        self._max_micro_steps = (
            trainer_cfg.max_steps * accum
            if (trainer_cfg.max_steps and trainer_cfg.max_steps > 0)
            else None
        )

        # ---- models -------------------------------------------------------
        gen_kwargs = {
            k: getattr(generator_cfg, k) for k in _GENERATOR_KWARGS if hasattr(generator_cfg, k)
        }
        gen_kwargs["remat"] = trainer_cfg.remat
        # generator.use_pallas=null (auto) resolves through create_generator:
        # ON on the TPU backend. Since round 4 the fused trunk kernels carry a
        # fused Pallas BACKWARD (saved-feature custom_vjp, ops/pallas/rdb.py)
        # so training benefits too — measured 98.4 vs 129.2 ms/step (+31%) at
        # the flagship bs=192 config. Explicit true/false is honored as-is.
        gen_kwargs["use_pallas"] = getattr(generator_cfg, "use_pallas", None)
        self.g_model = create_generator(self.generator_type, dtype=self.compute_dtype, **gen_kwargs)
        self.d_model = None
        if self.is_gan:
            if discriminator_cfg is None:
                raise ValueError("GAN task requires a discriminator config")
            self.d_model = create_discriminator(
                discriminator_cfg.name, dtype=self.compute_dtype, in_channels=discriminator_cfg.in_channels
            )

        # ---- init params ---------------------------------------------------
        rng = jax.random.PRNGKey(training_cfg.seed)
        sample = self._example_inputs(cfg)
        if self.generator_type in FUSION_GENERATORS:
            g_vars = self.g_model.init(rng, *sample)
        else:
            g_vars = self.g_model.init(rng, sample[0])
        g_params = g_vars["params"]
        logger.info("Generator '%s': %.2fM params", self.generator_type, param_count(g_params) / 1e6)

        # ---- optimizers ----------------------------------------------------
        g_opt_cfg = self.optimizers_cfg.get(T.generator_optimizer_key) or OptimizerConfig(lr=training_cfg.lr)
        g_sched_cfg = self.schedulers_cfg.get(T.generator_scheduler_key)
        g_schedule = resolve_schedule(g_sched_cfg, g_opt_cfg.lr, self.num_training_steps)
        g_b1_schedule = resolve_momentum_schedule(g_sched_cfg, self.num_training_steps)
        self.g_tx = build_optimizer(
            g_opt_cfg, g_schedule, trainer_cfg.gradient_clip_val, accum, b1_schedule=g_b1_schedule
        )
        self.g_schedule = g_schedule

        if self.is_gan:
            # The GAN step always feeds the discriminator the generator's
            # SR output / the HR target, so init with THAT channel count —
            # flax infers cin from the example input, not from the module
            # field, and a mismatched example would create params that crash
            # at the first real step.
            d_in_ch = getattr(generator_cfg, "out_channels", 1) or 1
            cfg_in_ch = getattr(self.discriminator_cfg, "in_channels", d_in_ch) if self.discriminator_cfg else d_in_ch
            if cfg_in_ch != d_in_ch:
                raise ValueError(
                    f"discriminator.in_channels={cfg_in_ch} does not match the generator "
                    f"output channels ({d_in_ch}) the GAN step feeds it"
                )
            hr_shape = (2, self.dm.train_dataset.hr_size, self.dm.train_dataset.hr_size, d_in_ch)
            d_vars = self.d_model.init(jax.random.PRNGKey(training_cfg.seed + 1), jnp.zeros(hr_shape), train=False)
            d_params = d_vars["params"]
            d_bs = d_vars.get("batch_stats")
            d_opt_cfg = self.optimizers_cfg.get(T.discriminator_optimizer_key) or OptimizerConfig(lr=training_cfg.lr)
            d_sched_cfg = self.schedulers_cfg.get(T.discriminator_scheduler_key)
            d_schedule = resolve_schedule(d_sched_cfg, d_opt_cfg.lr, self.num_training_steps)
            d_b1_schedule = resolve_momentum_schedule(d_sched_cfg, self.num_training_steps)
            self.d_tx = build_optimizer(
                d_opt_cfg, d_schedule, trainer_cfg.gradient_clip_val, accum, b1_schedule=d_b1_schedule
            )
            state = GANTrainState.create(g_params, self.g_tx, d_params, self.d_tx, d_bs)
        else:
            state = TrainState.create(g_params, self.g_tx)

        # fine-tune: generator-only weight graft (cli/train.py:112-121)
        if training_cfg.model_weights:
            grafted = restore_generator_params(training_cfg.model_weights, g_params)
            state = state.replace(**({"g_params": grafted} if self.is_gan else {"params": grafted}))

        # DeepSpeed-ZeRO capability ladder (reference conf/plugins/*):
        # stage 1 scatters eligible optimizer-state leaves over the data axis;
        # stage 2 additionally pins gradients to the sharded layout inside the
        # step (GSPMD lowers the DP grad sum to reduce-scatter); stage 3 keeps
        # the parameters persistently sharded with all-gather-on-use.
        stage = trainer_cfg.zero_stage
        if stage is None:
            stage = 1 if trainer_cfg.shard_optimizer_state else 0
        self.zero_stage = int(stage) if self.mesh.devices.size > 1 else 0
        self._zero_cfg: Dict[str, Any] = {}
        if self.zero_stage >= 2:
            from climsr_tpu.parallel.mesh import shard_largest_divisible_dim

            if self.is_gan:
                self._zero_cfg = {
                    "stage": self.zero_stage,
                    "g_shardings": shard_largest_divisible_dim(state.g_params, self.mesh),
                    "d_shardings": shard_largest_divisible_dim(state.d_params, self.mesh),
                }
            else:
                self._zero_cfg = {
                    "stage": self.zero_stage,
                    "shardings": shard_largest_divisible_dim(state.params, self.mesh),
                }
        self.state = self._place_state(state)

        # ---- compiled steps ------------------------------------------------
        spatial_cfg = None
        if self.spatial_size > 1:
            spatial_cfg = {
                "mesh": self.mesh,
                "axis": "spatial",
                "halo": int(getattr(trainer_cfg, "spatial_shard_halo", 8)),
                "scale": cfg.scale_factor,
                "batch_axis": "data" if self.mesh.shape["data"] > 1 else None,
            }
        if self.is_gan:
            # perceptual_loss_factor == 0 skips building the VGG19 graph entirely
            # (16 convs at HR size — pure overhead when its weight is zero).
            self.perceptual_fn = (
                build_perceptual_loss(
                    differentiable=task_cfg.differentiable_perceptual,
                    compute_dtype=self.compute_dtype,
                    cutoff=getattr(task_cfg, "perceptual_cutoff", "conv5_4"),
                )
                if task_cfg.perceptual_loss_factor
                else None
            )
            self.train_step = make_gan_step(
                self.g_model, self.d_model, self.generator_type, self.g_tx, self.d_tx,
                pixel_weight=task_cfg.pixel_level_loss_factor,
                perceptual_weight=task_cfg.perceptual_loss_factor,
                adversarial_weight=task_cfg.adversarial_loss_factor,
                perceptual_fn=self.perceptual_fn,
                perceptual_interval=getattr(task_cfg, "perceptual_interval", 1),
                compute_dtype=self.compute_dtype,
                augment=self._augment_kwargs,
                augment_seed=training_cfg.seed,
                store=self.train_store,
                zero=self._zero_cfg or None,
                spatial=spatial_cfg,
            )
            self.gan_val_losses = make_gan_val_losses(
                self.g_model, self.d_model, self.generator_type,
                pixel_weight=task_cfg.pixel_level_loss_factor,
                perceptual_weight=task_cfg.perceptual_loss_factor,
                adversarial_weight=task_cfg.adversarial_loss_factor,
                perceptual_fn=self.perceptual_fn,
                compute_dtype=self.compute_dtype,
            )
        else:
            self.train_step = make_pretrain_step(
                self.g_model, self.generator_type, self.g_tx, compute_dtype=self.compute_dtype,
                augment=self._augment_kwargs, augment_seed=training_cfg.seed,
                store=self.train_store, zero=self._zero_cfg or None, spatial=spatial_cfg,
            )

        zmean = zstd = 0.0
        if cfg.normalization_method == "zscore":
            stats = self.dm.zscore_df.set_index(consts.datasets_and_preprocessing.variable)
            key = consts.datasets_and_preprocessing.world_clim_to_cruts_mapping[cfg.world_clim_variable]
            zmean = float(stats.at[key, consts.stats.mean])
            zstd = float(stats.at[key, consts.stats.std])
        self._eval_steps = {
            prefix: make_eval_step(
                self.g_model, self.generator_type,
                normalization_method=cfg.normalization_method,
                normalization_range=tuple(cfg.normalization_range),
                zscore_mean=zmean, zscore_std=zstd,
                compute_dtype=self.compute_dtype, prefix=prefix,
            )
            for prefix in (consts.stages.val, consts.stages.test)
        }

        # ---- checkpointing -------------------------------------------------
        self.ckpt = CheckpointManager(self.workdir / "checkpoints", save_top_k=trainer_cfg.save_top_k)
        self.global_step = 0
        self.early_stop_best = float("inf")
        self.early_stop_count = 0

        if trainer_cfg.resume_from_checkpoint:
            self.state = CheckpointManager(trainer_cfg.resume_from_checkpoint, save_top_k=0).restore(
                self._restore_state_template()
            )
            self.global_step = int(jax.device_get(self.state.step))
            logger.info("Resumed from %s at step %d", trainer_cfg.resume_from_checkpoint, self.global_step)

        self.metric_logger.log_hyperparams(
            {"generator": self.generator_type, "task": task_cfg.name, "lr": training_cfg.lr,
             "batch_size": cfg.batch_size, "precision": trainer_cfg.precision},
            initial_hp_metric=task_cfg.initial_hp_metric_val,
        )

    # -----------------------------------------------------------------------
    def _place_state(self, state):
        """Device placement of a (host or device) state per the ZeRO stage:
        replicate everything, then scatter optimizer state (stage >= 1) and
        parameters (stage 3) over the mesh. Used at init and after resume."""
        state = put_replicated(jax.tree_util.tree_map(jnp.asarray, state), self.mesh)
        if self.zero_stage < 1:
            return state
        from climsr_tpu.parallel.mesh import shard_largest_divisible_dim

        def shard_tree(tree, rules=None):
            rules = rules or shard_largest_divisible_dim(tree, self.mesh)
            return jax.tree_util.tree_map(jax.device_put, tree, rules)

        if self.is_gan:
            state = state.replace(
                g_opt_state=shard_tree(state.g_opt_state),
                d_opt_state=shard_tree(state.d_opt_state),
            )
            if self.zero_stage >= 3:
                state = state.replace(
                    g_params=shard_tree(state.g_params, self._zero_cfg["g_shardings"]),
                    d_params=shard_tree(state.d_params, self._zero_cfg["d_shardings"]),
                )
        else:
            state = state.replace(opt_state=shard_tree(state.opt_state))
            if self.zero_stage >= 3:
                state = state.replace(params=shard_tree(state.params, self._zero_cfg["shardings"]))
        return state

    def _host_state(self):
        """Host copy of the train state (fine-tune grafts, tests, tools).

        Single-process: a plain ``device_get``. Under ``jax.distributed``
        ZeRO-sharded leaves span non-addressable devices, so the global value
        is assembled with ``multihost_utils.process_allgather``. NOT on the
        checkpoint path anymore — saves hand orbax the sharded device arrays
        directly (:meth:`_save_state`) so nothing re-replicates.
        """
        if jax.process_count() == 1:
            return jax.device_get(self.state)
        from jax.experimental import multihost_utils

        # tiled=True: global (possibly non-fully-addressable) arrays come back
        # as their assembled global value, not stacked per process
        return jax.tree_util.tree_map(
            np.asarray, multihost_utils.process_allgather(self.state, tiled=True)
        )

    def _save_state(self):
        """What goes into a checkpoint: the live GLOBAL device arrays.

        Orbax consumes sharded ``jax.Array``s natively — every process writes
        exactly its addressable shards (OCDBT), so a ZeRO-3 run never
        re-assembles the full pytree on any single host (the round-3
        ``process_allgather``-then-save path replicated everything to every
        process). Donation-safe: orbax's async checkpointer snapshots
        device->host synchronously inside ``save()``; only the disk write is
        async, so the train step may donate these buffers immediately after.
        """
        return self.state

    def _restore_state_template(self):
        """Abstract restore target carrying each leaf's SHARDING, so orbax
        restores straight onto the mesh layout ``_place_state`` chose (ZeRO
        stages included) — each process reads only its shards, no host-side
        full-pytree materialization, no re-placement pass."""
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            if isinstance(x, jax.Array)
            else x,
            self.state,
        )

    def _auto_scale_batch_size(self) -> None:
        """trainer.auto_scale_batch_size: grow datamodule.cfg.batch_size to the
        largest power of two whose compiled-step memory plan fits HBM.

        TPU-native replacement for PL's catch-the-OOM Tuner (reference
        core/config.py:144): a throwaway pretrain step (same generator config,
        remat and precision as the real one) is AOT-compiled at doubling batch
        sizes on abstract inputs and XLA's memory_analysis is read — nothing
        runs, nothing can OOM (training/batch_probe.py). Probes the plain
        pixel-loss step: device-augment/ZeRO/spatial variants shift the plan
        by less than the probe's 10% headroom; GAN tasks are declined (the
        D+VGG graph belongs to the task, and no reference experiment tunes it).
        """
        cfg = self.dm.cfg
        mode = self.trainer_cfg.auto_scale_batch_size
        if self.is_gan:
            logger.warning(
                "auto_scale_batch_size supports pixel-loss tasks only; keeping "
                "batch_size=%d for the GAN task", cfg.batch_size,
            )
            return
        from climsr_tpu.training.batch_probe import probe_max_batch_size

        gen_kwargs = {
            k: getattr(self.generator_cfg, k) for k in _GENERATOR_KWARGS if hasattr(self.generator_cfg, k)
        }
        gen_kwargs["remat"] = self.trainer_cfg.remat
        gen_kwargs["use_pallas"] = getattr(self.generator_cfg, "use_pallas", None)
        model = create_generator(self.generator_type, dtype=self.compute_dtype, **gen_kwargs)
        sample = self._example_inputs(cfg)
        if self.generator_type in FUSION_GENERATORS:
            variables = model.init(jax.random.PRNGKey(0), *sample)
        else:
            variables = model.init(jax.random.PRNGKey(0), sample[0])
        opt_cfg = self.optimizers_cfg.get(T.generator_optimizer_key) or OptimizerConfig(
            lr=self.training_cfg.lr
        )
        tx = build_optimizer(opt_cfg, lambda s: opt_cfg.lr)
        state = TrainState.create(variables["params"], tx)
        step = make_pretrain_step(
            model, self.generator_type, tx, compute_dtype=self.compute_dtype, donate=False
        )
        B = consts.batch_items
        lr_shape = sample[0].shape[1:]
        hr = self.dm.train_dataset.hr_size
        template = {B.lr: jnp.zeros((1,) + lr_shape, self.compute_dtype),
                    B.hr: jnp.zeros((1, hr, hr, 1), self.compute_dtype)}
        if self.generator_type in FUSION_GENERATORS:
            template[B.elevation] = jnp.zeros((1, hr, hr, 1), self.compute_dtype)
            template[B.mask] = jnp.zeros((1, hr, hr, 1), self.compute_dtype)
        new_bs = probe_max_batch_size(
            step, state, template, start=cfg.batch_size,
            mode="power" if mode is True else str(mode),
            # global batches are sharded over the data axis: probe the
            # per-device slice, not the global batch, against one chip's HBM
            shards=int(self.mesh.shape.get("data", 1)) * jax.process_count(),
        )
        if new_bs != cfg.batch_size:
            logger.info("auto_scale_batch_size: %d -> %d", cfg.batch_size, new_bs)
            cfg.batch_size = new_bs

    def _example_inputs(self, cfg):
        from climsr_tpu.models import PRE_UPSCALED_GENERATORS

        ds = self.dm.train_dataset
        lr_size = ds.hr_size if self.generator_type in PRE_UPSCALED_GENERATORS else ds.lr_size
        in_ch = 1 + cfg.use_elevation + cfg.use_mask
        x = jnp.zeros((2, lr_size, lr_size, in_ch), self.compute_dtype)
        elev = jnp.zeros((2, ds.hr_size, ds.hr_size, 1), self.compute_dtype)
        mask = jnp.zeros((2, ds.hr_size, ds.hr_size, 1), self.compute_dtype)
        return x, elev, mask

    def _generator_params(self):
        return self.state.g_params if self.is_gan else self.state.params

    def _set_generator_params(self, params) -> None:
        if self.is_gan:
            self.state = self.state.replace(g_params=params)
        else:
            self.state = self.state.replace(params=params)

    def _limit(self, loader_len: int, limit) -> int:
        if self.trainer_cfg.fast_dev_run:
            return min(loader_len, 2)
        return self._limit_len(loader_len, limit)

    @staticmethod
    def _limit_len(loader_len: int, limit) -> int:
        if limit is None:
            return loader_len
        if isinstance(limit, float) and limit <= 1.0:
            return int(loader_len * limit)
        return min(loader_len, int(limit))

    # -----------------------------------------------------------------------
    def fit(self) -> Dict[str, float]:
        if self.trainer_cfg.profiler == "jax":
            # xplane trace viewable in TensorBoard (reference: PL profiler group)
            import jax.profiler as jprof

            with jprof.trace(str(self.workdir / self.trainer_cfg.profiler_dir)):
                return self._fit_impl()
        if self.trainer_cfg.profiler in ("simple", "advanced", "pytorch"):
            # "simple": per-stage wall-time table (PL SimpleProfiler).
            # "advanced"/"pytorch" (PL AdvancedProfiler / PyTorchProfiler):
            # the stage table PLUS a per-op device-time table derived from an
            # xplane trace captured around the fit (utils/profiling.py) —
            # real hardware times, the TPU-native equivalent of their
            # per-function/per-op breakdowns.
            advanced = self.trainer_cfg.profiler in ("advanced", "pytorch")
            trace_dir = self.workdir / self.trainer_cfg.profiler_dir
            self._stage_times: Dict[str, float] = {}
            # trace ONE representative epoch (the first), not the whole fit:
            # a multi-epoch whole-run trace accumulates device events into
            # multi-GB xplane files and taxes every step (PL AdvancedProfiler
            # parity is a per-op table, not a full-run trace)
            self._advanced_trace_dir = trace_dir if advanced else None
            try:
                return self._fit_impl()
            finally:
                self._advanced_trace_dir = None
                total = sum(self._stage_times.values()) or 1.0
                lines = [
                    f"  {name:<16} {secs:8.2f}s  {secs / total * 100:5.1f}%"
                    for name, secs in sorted(self._stage_times.items(), key=lambda kv: -kv[1])
                ]
                logger.info("Profiler report (wall time by stage):\n%s", "\n".join(lines))
                self._stage_times = None
                if advanced:
                    from climsr_tpu.utils.profiling import advanced_profile_report

                    report = advanced_profile_report(trace_dir)
                    if report:
                        logger.info("Profiler report (device time by op):\n%s", report)
                        (self.workdir / "profile_ops.txt").write_text(report)
                    else:
                        logger.warning(
                            "No parsable xplane trace under %s — only the stage table "
                            "is available (per-op parsing needs the tensorflow xplane "
                            "protos)", trace_dir,
                        )
        return self._fit_impl()

    def _staged(self, name: str, fn, *args):
        times = getattr(self, "_stage_times", None)
        if times is None:
            return fn(*args)
        t0 = time.time()
        try:
            return fn(*args)
        finally:
            times[name] = times.get(name, 0.0) + (time.time() - t0)

    def _fit_impl(self) -> Dict[str, float]:
        tc = self.trainer_cfg
        last_val: Dict[str, float] = {}
        max_epochs = 1 if tc.fast_dev_run else tc.max_epochs
        # per-step hooks are opt-in (only pruning uses one) so the common
        # path pays no per-batch Python dispatch for hookless callbacks
        self._batch_end_cbs = [cb for cb in self.callbacks if hasattr(cb, "on_train_batch_end")]
        for cb in self.callbacks:
            hook = getattr(cb, "on_fit_start", None)
            if hook is not None:
                try:
                    hook(self)
                except Exception:
                    logger.exception("Callback %s on_fit_start failed", type(cb).__name__)
        for epoch in range(max_epochs):
            if getattr(self, "_advanced_trace_dir", None) is not None and epoch == 0:
                import jax.profiler as jprof

                jprof.start_trace(str(self._advanced_trace_dir))
                try:
                    self._staged("train_epoch", self.train_epoch, epoch)
                finally:
                    jprof.stop_trace()
            else:
                self._staged("train_epoch", self.train_epoch, epoch)
            # PL hook order: pruning & co. mutate weights at train-epoch end,
            # BEFORE validation — so val metrics and the checkpoint ranked by
            # them describe the same (pruned) parameters. A preempted epoch is
            # NOT an epoch end (PL never fires epoch-end hooks for an
            # interrupted epoch): weight-mutating hooks like pruning must not
            # advance their schedule on a partial epoch right before the
            # forced checkpoint, or the resumed run is one step ahead.
            if not self.preempted:
                for cb in self.callbacks:
                    hook = getattr(cb, "on_train_epoch_end", None)
                    if hook is not None:
                        try:
                            hook(self, epoch)
                        except Exception:
                            logger.exception("Callback %s on_train_epoch_end failed", type(cb).__name__)
            if self.preempted:
                # force=True: the preemption save must land even when
                # save_top_k=0 disabled regular checkpointing
                self.ckpt.save(
                    self.global_step, self._save_state(), hp_metric=None,
                    config=self.config_snapshot, force=True,
                )
                self.ckpt.wait()
                logger.warning(
                    "Preemption checkpoint saved at step %d under %s — resume with "
                    "trainer.resume_from_checkpoint", self.global_step, self.workdir / "checkpoints",
                )
                break
            if (epoch + 1) % tc.check_val_every_n_epoch == 0 or epoch == max_epochs - 1:
                last_val = self._staged("validate", self.validate, epoch)
                hp_metric = last_val.get("hp_metric")
                self.ckpt.save(
                    self.global_step,
                    self._save_state(),
                    hp_metric=hp_metric,
                    config=self.config_snapshot,
                )
                if hp_metric is not None and tc.early_stopping_patience:
                    if hp_metric < self.early_stop_best - 1e-12:
                        self.early_stop_best = hp_metric
                        self.early_stop_count = 0
                    else:
                        self.early_stop_count += 1
                        if self.early_stop_count >= tc.early_stopping_patience:
                            logger.info("Early stopping at epoch %d (patience %d)", epoch, tc.early_stopping_patience)
                            break
            if self._max_micro_steps and self.global_step >= self._max_micro_steps:
                break
        self.ckpt.wait()
        return last_val

    def train_epoch(self, epoch: int) -> None:
        tc = self.trainer_cfg
        self.train_loader.set_epoch(epoch)
        n_batches = self._limit(len(self.train_loader), tc.limit_train_batches)
        if self.train_store is not None:
            it = iter(self.train_loader)  # index batches; data already on device
        else:
            it = device_prefetch(iter(self.train_loader), self.batch_sharding)
        t0 = time.time()
        samples = 0
        for i, batch in enumerate(it):
            if i >= n_batches:
                break
            if isinstance(batch, dict):
                batch.pop(VALID_KEY, None)
                n_in_batch = batch[B.hr].shape[0]
            else:
                n_in_batch = batch.shape[0]
                batch = jnp.asarray(batch)
            self.state, metrics = self.train_step(self.state, batch)
            self.global_step += 1
            for cb in getattr(self, "_batch_end_cbs", ()):
                cb.on_train_batch_end(self)
            if self.preempted:
                break
            samples += n_in_batch
            is_log_step = self.global_step % tc.log_every_n_steps == 0 or i == n_batches - 1
            host = None
            if tc.terminate_on_nan:
                # reference-parity per-STEP check (PL terminate_on_nan); costs
                # one device sync per step — users opt in for the safety
                host = {k: float(v) for k, v in jax.device_get(metrics).items()}
                if any(np.isnan(v) for v in host.values()):
                    raise FloatingPointError(
                        f"NaN in training metrics at step {self.global_step}: {host}"
                    )
            if is_log_step:
                if host is None:
                    host = {k: float(v) for k, v in jax.device_get(metrics).items()}
                dt = time.time() - t0
                host["train/samples_per_sec"] = samples / max(dt, 1e-9)
                # optax.MultiSteps advances the schedule once per *optimizer*
                # step, so divide out the micro-batch count or the logged LR
                # runs ahead of the true schedule by accum x.
                host["lr"] = float(self.g_schedule(self.global_step // self._accum))
                self.metric_logger.log_metrics(host, self.global_step)
            if self._max_micro_steps and self.global_step >= self._max_micro_steps:
                break
        jax.block_until_ready(self.state.step)
        logger.info(
            "epoch %d: %d steps, %.1f samples/s", epoch, min(n_batches, len(self.train_loader)),
            samples / max(time.time() - t0, 1e-9),
        )

    def _eval_batches(self, loader):
        """Yield (batch_on_device, n_valid) — from the HBM store when present."""
        store = self._eval_stores.get(id(loader))
        if store is None and id(loader) in self._eval_store_datasets:
            from climsr_tpu.data.pipeline import build_eval_device_store

            store = build_eval_device_store(
                self._eval_store_datasets[id(loader)], num_workers=self._eval_store_workers
            )
            self._eval_stores[id(loader)] = store
        if store is None:
            for batch in device_prefetch(iter(loader), self.batch_sharding):
                yield batch, float(batch.pop(VALID_KEY))
            return
        n = len(loader.dataset)
        bs = loader.batch_size
        for start in range(0, n, bs):
            idx = np.arange(start, min(start + bs, n), dtype=np.int32)
            n_valid = float(len(idx))
            if len(idx) < bs:  # pad to the compiled batch shape
                idx = np.concatenate([idx, np.full(bs - len(idx), idx[-1], np.int32)])
            yield self._gather_eval(store, jnp.asarray(idx)), n_valid

    def _eval_loop(self, loader, prefix: str, extra_gan_losses: bool = False) -> Dict[str, float]:
        eval_step = self._eval_steps[prefix]
        n_batches = self._limit(len(loader), getattr(self.trainer_cfg, f"limit_{prefix}_batches", None))
        sums: Dict[str, float] = {}
        weights = 0.0
        params = self._generator_params()
        for i, (batch, n_valid) in enumerate(self._eval_batches(loader)):
            if i >= n_batches:
                break
            # Padded tail batch: evaluate only the valid prefix so duplicated
            # samples don't bias the epoch mean (the weighting below is then
            # exact). Costs one extra jit specialization per tail shape,
            # cached across epochs — the reference likewise runs the natural-
            # size tail batch (torch DataLoader drop_last=False). Under
            # jax.distributed the global batch cannot be sliced eagerly
            # (shards span other processes), so the padded batch runs as-is:
            # the n_valid weighting keeps the bias bounded to the tail batch.
            nv = int(n_valid)
            if (
                isinstance(batch, dict)
                and jax.process_count() == 1
                and nv < jax.tree_util.tree_leaves(batch)[0].shape[0]
            ):
                batch = {k: v[:nv] for k, v in batch.items()}
            metrics = eval_step(params, batch)
            if extra_gan_losses and self.is_gan:
                metrics.update(self.gan_val_losses(self.state.g_params, self.state.d_params,
                                                   self.state.d_batch_stats, batch))
            host = jax.device_get(metrics)
            # per-step means weighted by valid count (padded tail batches)
            for k, v in host.items():
                sums[k] = sums.get(k, 0.0) + float(v) * n_valid
            weights += n_valid
        return {k: v / max(weights, 1e-9) for k, v in sums.items()}

    def validate(self, epoch: int) -> Dict[str, float]:
        out = self._eval_loop(self.val_loader, consts.stages.val, extra_gan_losses=True)
        # hp_metric = epoch mean of val/rmse (reference task.py:388-391)
        if "val/rmse" in out:
            out["hp_metric"] = out["val/rmse"]
        self.metric_logger.log_metrics(out, self.global_step)
        logger.info("epoch %d val: rmse=%.5f psnr=%.3f ssim=%.4f", epoch,
                    out.get("val/rmse", float("nan")), out.get("val/psnr", float("nan")),
                    out.get("val/ssim", float("nan")))
        for cb in self.callbacks:
            hook = getattr(cb, "on_validation_end", None)
            if hook is None:
                continue
            try:
                hook(self, epoch, out)
            except Exception as e:
                # the sweep pruner ends a trial by raising through its report
                # callback — that one must propagate, not be logged away
                if type(e).__name__ == "TrialPruned":
                    raise
                logger.exception("Callback %s failed", type(cb).__name__)
        return out

    def test(self) -> List[Dict[str, float]]:
        results = []
        for idx, loader in enumerate(self.test_loaders):
            out = self._eval_loop(loader, consts.stages.test)
            tagged = {f"{k}/{idx}" if len(self.test_loaders) > 1 else k: v for k, v in out.items()}
            self.metric_logger.log_metrics(tagged, self.global_step)
            results.append(out)
        return results

    def _on_sigterm(self, signum, frame) -> None:
        logger.warning(
            "SIGTERM received — writing a preemption checkpoint at the next step boundary"
        )
        self.preempted = True

    def close(self) -> None:
        if self._prev_sigterm is not None:
            import signal

            try:
                signal.signal(signal.SIGTERM, self._prev_sigterm)
            except ValueError:
                pass
            self._prev_sigterm = None
        self.ckpt.wait()
        self.ckpt.close()
        self.metric_logger.close()
