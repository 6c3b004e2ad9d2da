# -*- coding: utf-8 -*-
"""Training CLI: config composition -> datamodule -> Trainer -> fit/test.

Parity: reference ``climsr/cli/train.py`` — ``run()`` wires datamodule, task
and trainer from the composed config; ``main()`` stitches top-level config
groups into the task (optimizers/schedulers/generator/discriminator,
``:160-164``), applies ``infer_generator_config`` channel arithmetic, runs
fit then test, and returns the optimized metric for hparam search
(``:143-144``).

Usage: ``python train.py experiment=esrgan_pre_training [key=value ...]``
"""
from __future__ import annotations

import logging
import sys
import time
from pathlib import Path
from typing import Any, Dict, List, Optional

from climsr_tpu.config.compose import ConfigError, compose, default_config_dir
from climsr_tpu.config.schemas import (
    DiscriminatorConfig,
    GeneratorConfig,
    OptimizerConfig,
    SchedulerConfig,
    SuperResolutionDataConfig,
    TaskConfig,
    TrainerConfig,
    TrainingConfig,
    from_dict,
    infer_generator_config,
)
from climsr_tpu.data.datamodule import SuperResolutionDataModule
from climsr_tpu.training.loop import Trainer

logger = logging.getLogger(__name__)


def print_config(cfg: Dict[str, Any]) -> None:
    import yaml

    print("--- composed config " + "-" * 40)
    print(yaml.safe_dump(cfg, default_flow_style=False, sort_keys=False))
    print("-" * 60)


class _TrialReportCallback:
    """Feeds each validation's optimized metric to the sweep pruner; the
    pruner's TrialPruned propagates out of fit() and ends the trial early."""

    def __init__(self, report, metric: str):
        self._report = report
        self._metric = metric

    def on_validation_end(self, trainer, epoch: int, val_metrics: Dict[str, float]) -> None:
        value = val_metrics.get(self._metric, val_metrics.get("hp_metric"))
        if value is not None:
            self._report(epoch, float(value))


def _flatten_task_cfg(task_dict):
    """Reference-compat aliasing: the reference's task group nests its knobs
    under ``cfg`` (hydra ``task.cfg.*`` override paths); ours is flat — accept
    both by folding task.cfg.* into task.* (the nested key wins)."""
    if isinstance(task_dict, dict) and isinstance(task_dict.get("cfg"), dict):
        return {**{k: v for k, v in task_dict.items() if k != "cfg"}, **task_dict["cfg"]}
    return task_dict


def run(cfg: Dict[str, Any], report_cb=None) -> Optional[float]:
    from climsr_tpu.utils.core import extras

    extras(ignore_warnings=bool(cfg.get("ignore_warnings", True)))  # reference utils.py:17
    if cfg.get("print_config", True):
        print_config(cfg)

    training_cfg = from_dict(TrainingConfig, cfg.get("training")) or TrainingConfig()
    trainer_cfg = from_dict(TrainerConfig, cfg.get("trainer")) or TrainerConfig()
    # profiler config group (profiler=jax/simple/...) maps onto the trainer flag,
    # mirroring the reference's hydra profiler group -> pl.Trainer(profiler=...)
    prof = cfg.get("profiler")
    if prof and not trainer_cfg.profiler:
        trainer_cfg.profiler = prof.get("name") if isinstance(prof, dict) else str(prof)
    task_cfg = from_dict(TaskConfig, _flatten_task_cfg(cfg.get("task"))) or TaskConfig()
    data_cfg = from_dict(SuperResolutionDataConfig, (cfg.get("datamodule") or {}).get("cfg"))
    if data_cfg is None:
        raise ConfigError("config group 'datamodule' resolved to null — select datamodule=<name>")
    generator_cfg = from_dict(GeneratorConfig, cfg.get("generator"))
    if generator_cfg is None:
        raise ConfigError("config group 'generator' resolved to null — select generator=<name>")
    discriminator_cfg = from_dict(DiscriminatorConfig, cfg.get("discriminator"))
    generator_cfg = infer_generator_config(generator_cfg, data_cfg)

    optimizers = {
        key: from_dict(OptimizerConfig, (cfg.get("optimizers") or {}).get(key))
        for key in ("generator_optimizer", "discriminator_optimizer")
    }
    schedulers = {
        key: from_dict(SchedulerConfig, (cfg.get("schedulers") or {}).get(key))
        for key in ("generator_scheduler", "discriminator_scheduler")
    }

    import numpy as np
    import random

    random.seed(training_cfg.seed)
    np.random.seed(training_cfg.seed)

    datamodule = SuperResolutionDataModule(data_cfg)

    # every process must resolve the SAME run dir (orbax multi-host checkpoint
    # coordination writes into one tree), so the timestamp is process-0's
    from climsr_tpu.parallel.mesh import broadcast_string

    run_dir = (
        Path(training_cfg.output_dir)
        / "outputs"
        / "runs"
        / training_cfg.generator_type
        / broadcast_string(time.strftime("%Y-%m-%d_%H-%M-%S"))
    )
    from climsr_tpu.training.callbacks import build_callbacks

    callback_names = cfg.get("callbacks")
    if isinstance(callback_names, str):
        callback_names = [callback_names]  # callbacks=log_images (single select)
    elif isinstance(callback_names, dict):
        callback_names = list(callback_names)
    callbacks = build_callbacks(callback_names)
    if report_cb is not None:
        callbacks.append(
            _TrialReportCallback(report_cb, training_cfg.optimized_metric or "hp_metric")
        )
    trainer = Trainer(
        datamodule=datamodule,
        generator_cfg=generator_cfg,
        task_cfg=task_cfg,
        trainer_cfg=trainer_cfg,
        training_cfg=training_cfg,
        discriminator_cfg=discriminator_cfg,
        optimizers=optimizers,
        schedulers=schedulers,
        workdir=run_dir,
        config_snapshot=cfg,
        callbacks=callbacks,
        logger_cfg=cfg.get("logger"),
    )

    last_val: Dict[str, float] = {}
    try:
        if training_cfg.lr_find_only:
            # reference cli/train.py:98-109 — LR range test, report, exit
            from climsr_tpu.training.lr_finder import lr_range_test

            suggestion, _ = lr_range_test(trainer)
            logger.info("LR finder done; suggestion=%.3g (plots in %s)", suggestion, trainer.workdir)
            return suggestion
        if training_cfg.run_fit:
            last_val = trainer.fit()
        # skip the test phase when evicted: the SIGTERM grace window is for
        # the preemption checkpoint, not a full test pass
        if training_cfg.run_test_after_fit and not trainer.preempted:
            trainer.test()
    finally:
        trainer.close()

    if training_cfg.optimized_metric:
        return last_val.get(training_cfg.optimized_metric)
    return last_val.get("hp_metric")


def _maybe_init_distributed() -> None:
    """Multi-host init (the reference's num_nodes knob): set
    JAX_COORDINATOR_ADDRESS (+ JAX_NUM_PROCESSES, JAX_PROCESS_ID) and the mesh
    spans all hosts' devices; the data axis rides DCN across hosts."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") and not os.environ.get("_CLIMSR_DIST_INITIALIZED"):
        import jax

        jax.distributed.initialize()
        os.environ["_CLIMSR_DIST_INITIALIZED"] = "1"
        logger.info("jax.distributed initialized: process %d/%d", jax.process_index(), jax.process_count())


def main(argv: Optional[List[str]] = None) -> Optional[float]:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(levelname)s: %(message)s")
    from climsr_tpu.utils.core import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    _maybe_init_distributed()
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = compose(default_config_dir(), "config", overrides)

    search_cfg = cfg.get("hparams_search")
    if isinstance(search_cfg, dict) and search_cfg.get("search_space"):
        # sweep mode (reference: hydra -m + Optuna sweeper)
        from climsr_tpu.training.hparams_search import run_search

        metric = search_cfg.get("optimized_metric", "val/rmse")
        base = [o for o in overrides if not o.startswith("hparams_search")]
        base.append(f"training.optimized_metric={metric}")

        def objective(trial_overrides: List[str], report) -> Optional[float]:
            trial_cfg = compose(default_config_dir(), "config", trial_overrides)
            trial_cfg["print_config"] = False
            return run(trial_cfg, report_cb=report)

        best, _ = run_search(
            base,
            search_cfg,
            objective,
            output_dir=str(cfg.get("training", {}).get("output_dir", ".")) + "/hparams_search",
        )
        return best.value if best else None

    return run(cfg)


if __name__ == "__main__":
    main()
