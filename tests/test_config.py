# -*- coding: utf-8 -*-
"""Config composition tests: defaults list, experiment presets, overrides, interpolation."""
from pathlib import Path

import pytest

from climsr_tpu.config.compose import ConfigError, compose, default_config_dir
from climsr_tpu.config.schemas import (
    GeneratorConfig,
    SuperResolutionDataConfig,
    TrainerConfig,
    from_dict,
    infer_generator_config,
)

CONF = default_config_dir()


def test_default_config_dir_exists():
    assert (CONF / "config.yaml").exists()


def test_mandatory_experiment_group():
    with pytest.raises(ConfigError, match="mandatory"):
        compose(CONF, overrides=["generator=esrgan"])


def test_compose_esrgan_pre_training():
    cfg = compose(CONF, overrides=["experiment=esrgan_pre_training"])
    assert cfg["generator"]["name"] == "esrgan"
    assert cfg["generator"]["nb"] == 11 and cfg["generator"]["gc"] == 16
    assert cfg["task"]["name"] == "generator_pre_training"
    assert cfg["training"]["batch_size"] == 192
    assert cfg["trainer"]["max_epochs"] == 30
    # interpolation: optimizer lr <- training.lr
    assert cfg["optimizers"]["generator_optimizer"]["lr"] == cfg["training"]["lr"] == 1e-4
    # datamodule picks up batch size through interpolation
    assert cfg["datamodule"]["cfg"]["batch_size"] == 192
    assert cfg["datamodule"]["cfg"]["normalization_method"] == "minmax"


def test_compose_gan_experiment():
    cfg = compose(CONF, overrides=["experiment=esrgan_fine_tune_no_gan_pre_training"])
    assert cfg["task"]["name"] == "gan_training"
    assert cfg["task"]["adversarial_loss_factor"] == 0.005
    assert cfg["discriminator"]["name"] == "rfb_esrgan"
    assert cfg["optimizers"]["discriminator_optimizer"]["name"] == "adamw"
    assert cfg["datamodule"]["cfg"]["europe_extent"] is True


def test_cli_value_overrides_and_group_switch():
    cfg = compose(
        CONF,
        overrides=[
            "experiment=srcnn_pre_training",
            "training.batch_size=8",
            "trainer.max_epochs=1",
            "datamodule.cfg.data_path=/tmp/x",
        ],
    )
    assert cfg["training"]["batch_size"] == 8
    assert cfg["datamodule"]["cfg"]["batch_size"] == 8  # interpolation rerun
    assert cfg["trainer"]["max_epochs"] == 1
    assert cfg["datamodule"]["cfg"]["data_path"] == "/tmp/x"
    assert cfg["generator"]["name"] == "srcnn"


def test_all_experiments_compose():
    for exp in sorted((CONF / "experiment").glob("*.yaml")):
        cfg = compose(CONF, overrides=[f"experiment={exp.stem}"])
        assert cfg["generator"]["name"] in {"srcnn", "esrgan", "rcan", "drln", "rfb_esrgan"}, exp


def test_typed_schema_roundtrip():
    cfg = compose(CONF, overrides=["experiment=rcan_pre_training"])
    data_cfg = from_dict(SuperResolutionDataConfig, cfg["datamodule"]["cfg"])
    assert data_cfg.generator_type == "rcan"
    assert data_cfg.transforms.v_flip is True
    trainer_cfg = from_dict(TrainerConfig, cfg["trainer"])
    assert trainer_cfg.precision == "bf16"
    gen_cfg = from_dict(GeneratorConfig, cfg["generator"])
    assert gen_cfg.n_resgroups == 10


def test_infer_generator_config_channel_arithmetic():
    data_cfg = SuperResolutionDataConfig(use_elevation=False, use_mask=True)
    gen = infer_generator_config(GeneratorConfig(name="esrgan"), data_cfg)
    assert gen.in_channels == 2
    data_cfg = SuperResolutionDataConfig(use_elevation=False, use_mask=False)
    assert infer_generator_config(GeneratorConfig(name="esrgan"), data_cfg).in_channels == 1


def test_env_interpolation(monkeypatch):
    monkeypatch.setenv("CLIMSR_TEST_TOKEN", "sekrit")
    cfg = compose(CONF, overrides=["experiment=srcnn_pre_training", "logger.token=${env:CLIMSR_TEST_TOKEN}"])
    assert cfg["logger"]["token"] == "sekrit"


def test_cli_group_selection_outranks_experiment_body():
    """`experiment=... generator=rcan` must yield a clean rcan config (hydra
    semantics: CLI group selection wins over the experiment's selection), not
    the experiment's esrgan body merged over rcan's knobs."""
    cfg = compose(CONF, overrides=["experiment=esrgan_pre_training", "generator=rcan"])
    assert cfg["generator"]["name"] == "rcan"
    assert cfg["generator"]["n_resgroups"] == 10  # rcan group file knobs intact
    assert "nb" not in cfg["generator"]  # no esrgan leftovers
    # non-selection experiment values (training etc.) still apply
    assert cfg["task"]["name"] == "generator_pre_training"


def test_cli_same_name_selection_keeps_experiment_body():
    """Re-selecting the name the experiment already picked is a no-op: the
    experiment's value tweaks for that group (discriminator.in_channels=1
    here) must survive, unlike a genuine switch to a different config."""
    exp = "experiment=esrgan_fine_tune_no_gan_pre_training"
    base = compose(CONF, overrides=[exp])
    # NB the group FILE is rfb_esrgan_discriminator; its `name:` value is
    # rfb_esrgan — the same model the experiment body picks
    cfg = compose(CONF, overrides=[exp, "discriminator=rfb_esrgan_discriminator"])
    assert base["discriminator"]["in_channels"] == 1
    assert cfg["discriminator"] == base["discriminator"]
    # and the generator case, where file stem == name value
    cfg2 = compose(CONF, overrides=[exp, "generator=esrgan"])
    assert cfg2["generator"] == base["generator"]


def test_inference_cli_mode_aware_source_validation():
    """GeoTIFF mode (the default) must demand tiff_dir — the knob it actually
    reads — and not ds_path, which only the NetCDF mode uses; and vice versa."""
    from climsr_tpu.cli.inference import run
    from climsr_tpu.config.schemas import InferenceConfig

    with pytest.raises(ValueError) as ei:
        run(InferenceConfig(run_inference=True, use_netcdf_datasets=False, to_netcdf=False))
    assert "inference.tiff_dir" in str(ei.value)
    assert "ds_path" not in str(ei.value)
    with pytest.raises(ValueError) as ei:
        run(InferenceConfig(run_inference=True, use_netcdf_datasets=True, to_netcdf=False))
    assert "inference.ds_path" in str(ei.value)
    assert "tiff_dir" not in str(ei.value)


def test_registry_instantiator_verbs():
    """The reference-API facade (reference climsr/core/instantiator.py:37):
    each verb builds a real object from a plain config dict, and generic
    dispatch routes by config type."""
    import jax.numpy as jnp

    from climsr_tpu.config.instantiator import default_instantiator as inst
    from climsr_tpu.config.schemas import GeneratorConfig, from_dict

    model = inst.model({"name": "srcnn"}, dtype=jnp.float32)
    assert type(model).__name__ == "SRCNN"
    disc = inst.discriminator({"name": "rfb_esrgan", "in_channels": 1})
    assert disc.in_channels == 1
    tx = inst.optimizer({"name": "adamw", "lr": 1e-3})
    assert hasattr(tx, "init") and hasattr(tx, "update")  # optax GradientTransformation
    sched = inst.scheduler(
        {"name": "cosine_schedule_with_warmup", "num_warmup_steps": 5},
        base_lr=1e-3,
        num_training_steps=100,
    )
    assert 0.0 <= float(sched(0)) < float(sched(5)) <= 1e-3 * (1 + 1e-6)  # f32 peak
    # generic dispatch: by config type; None passes through; unknown rejects
    assert inst.instantiate(None) is None
    m2 = inst.instantiate(from_dict(GeneratorConfig, {"name": "srcnn"}))
    assert type(m2).__name__ == "SRCNN"
    with pytest.raises(TypeError):
        inst.instantiate(object())


def test_root_body_is_base_layer():
    """hydra `_self_`-first: group files override the root body, not vice
    versa (root-level values only fill where no group provides them)."""
    import yaml

    root = yaml.safe_load((CONF / "config.yaml").read_text())
    assert root["defaults"][0] == "_self_"  # the ordering this test pins
    cfg = compose(CONF, overrides=["experiment=srcnn_pre_training"])
    # root-only keys survive; group-provided keys come from the groups
    assert cfg["print_config"] is True
    assert cfg["trainer"]["max_epochs"] != "???"


def test_from_dict_warns_on_unknown_keys(caplog):
    import logging

    with caplog.at_level(logging.WARNING):
        tc = from_dict(TrainerConfig, {"max_stepz": 7, "max_epochs": 3})
    assert tc.max_epochs == 3
    assert not hasattr(tc, "max_stepz") or tc.max_steps != 7
    assert any("max_stepz" in r.message for r in caplog.records)


def test_task_cfg_reference_alias_flattens():
    from climsr_tpu.cli.train import _flatten_task_cfg

    flat = _flatten_task_cfg(
        {"name": "gan_training", "perceptual_loss_factor": 1.0, "cfg": {"perceptual_loss_factor": 0.005, "perceptual_cutoff": "conv2_2"}}
    )
    assert flat["perceptual_loss_factor"] == 0.005  # nested key wins
    assert flat["perceptual_cutoff"] == "conv2_2"
    assert flat["name"] == "gan_training"
    assert "cfg" not in flat
    assert _flatten_task_cfg(None) is None


def test_inference_cli_missing_mandatory_values():
    from climsr_tpu.cli.inference import _require
    from climsr_tpu.config.schemas import InferenceConfig

    cfg = InferenceConfig()
    with pytest.raises(ValueError, match="inference.pretrained_model"):
        _require(cfg, "pretrained_model", "ds_path")


def test_train_cli_null_generator_rejected(tmp_path):
    from climsr_tpu.cli.train import main

    with pytest.raises(ConfigError, match="generator"):
        main([
            "experiment=srcnn_pre_training_debug",
            "generator=null",
            "print_config=false",
            f"training.output_dir={tmp_path}",
        ])
