# -*- coding: utf-8 -*-
"""Instantiator facade: config -> constructed objects.

Parity: reference ``climsr/core/instantiator.py`` (``HydraInstantiator``) —
the reference routes every ``_target_`` through ``hydra.utils.instantiate``;
here construction is explicit registries (models, optimizers, schedules), and
this facade gives users of the reference API one object with the same verbs:
``model`` / ``optimizer`` / ``scheduler`` / ``data_module`` / ``instantiate``.
Unlike the reference, nothing needs to be pickled into checkpoints to rebuild
optimizers on resume — configs are plain data (see training/checkpoint.py).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

from climsr_tpu.config.schemas import (
    DiscriminatorConfig,
    GeneratorConfig,
    OptimizerConfig,
    SchedulerConfig,
    SuperResolutionDataConfig,
    from_dict,
)


class Instantiator:
    def instantiate(self, cfg, **kwargs):
        raise NotImplementedError


class RegistryInstantiator(Instantiator):
    """Builds framework objects from typed configs / config dicts."""

    def model(self, generator_cfg, dtype=None, **overrides):
        from climsr_tpu.models import create_generator

        if isinstance(generator_cfg, dict):
            generator_cfg = from_dict(GeneratorConfig, generator_cfg)
        kwargs = {k: getattr(generator_cfg, k) for k in (
            "in_channels", "out_channels", "scaling_factor", "nf", "nb", "gc",
            "n_resgroups", "n_resblocks", "n_feats", "reduction",
            "num_rrdb_blocks", "num_rrfdb_blocks",
        )}
        # use_pallas=None means auto — resolved inside create_generator
        # (fused trunk kernels on the TPU backend; dropped for families
        # without the field)
        kwargs["use_pallas"] = getattr(generator_cfg, "use_pallas", None)
        kwargs.update(overrides)
        return create_generator(generator_cfg.name, dtype=dtype, **kwargs)

    def discriminator(self, cfg, dtype=None):
        from climsr_tpu.models import create_discriminator

        if isinstance(cfg, dict):
            cfg = from_dict(DiscriminatorConfig, cfg)
        return create_discriminator(cfg.name, dtype=dtype, in_channels=cfg.in_channels)

    def optimizer(self, cfg, schedule=None, gradient_clip_val: float = 0.0, accumulate_grad_batches: int = 1):
        from climsr_tpu.training.optimizers import build_optimizer

        if isinstance(cfg, dict):
            cfg = from_dict(OptimizerConfig, cfg)
        schedule = schedule if schedule is not None else (lambda step: cfg.lr)
        return build_optimizer(cfg, schedule, gradient_clip_val, accumulate_grad_batches)

    def scheduler(self, cfg, base_lr: float, num_training_steps: int):
        from climsr_tpu.training.schedules import resolve_schedule

        if isinstance(cfg, dict):
            cfg = from_dict(SchedulerConfig, cfg)
        return resolve_schedule(cfg, base_lr, num_training_steps)

    def data_module(self, cfg):
        from climsr_tpu.data.datamodule import SuperResolutionDataModule

        if isinstance(cfg, dict):
            cfg = from_dict(SuperResolutionDataConfig, cfg.get("cfg", cfg))
        return SuperResolutionDataModule(cfg)

    def instantiate(self, cfg, **kwargs) -> Optional[Any]:
        """Generic dispatch by config shape (GeneratorConfig vs Discriminator...)."""
        if cfg is None:
            return None
        if isinstance(cfg, GeneratorConfig):
            return self.model(cfg, **kwargs)
        if isinstance(cfg, DiscriminatorConfig):
            return self.discriminator(cfg, **kwargs)
        if isinstance(cfg, OptimizerConfig):
            return self.optimizer(cfg, **kwargs)
        raise TypeError(f"Don't know how to instantiate {type(cfg).__name__}")


default_instantiator = RegistryInstantiator()
