# -*- coding: utf-8 -*-
"""Tests for the hparam-search driver, callbacks, and LR-finder math."""
import numpy as np
import pytest

from climsr_tpu.training.hparams_search import (
    CategoricalTPESampler,
    RandomSampler,
    SearchSpace,
    Trial,
    run_search,
)


def _space():
    return SearchSpace.from_config(
        {
            "training.lr": {"type": "categorical", "choices": [1e-4, 1e-3]},
            "datamodule.cfg.use_mask": {"type": "categorical", "choices": [False, True]},
        }
    )


def test_search_space_parsing():
    space = _space()
    assert set(space.dimensions) == {"training.lr", "datamodule.cfg.use_mask"}
    with pytest.raises(ValueError):
        SearchSpace.from_config({"x": {"type": "float", "low": 0}})


def test_tpe_sampler_prefers_good_region():
    space = _space()
    sampler = CategoricalTPESampler(space, seed=0, n_startup_trials=4)
    # fabricate history: lr=1e-3 is clearly better
    history = [
        Trial(i, {"training.lr": 1e-3 if i % 2 else 1e-4, "datamodule.cfg.use_mask": True},
              value=0.1 if i % 2 else 1.0)
        for i in range(20)
    ]
    picks = [sampler.suggest(history)["training.lr"] for _ in range(50)]
    assert picks.count(1e-3) > 30  # strongly biased to the good choice


def test_run_search_drives_objective(tmp_path):
    space_cfg = {
        "n_trials": 8,
        "direction": "minimize",
        "sampler": {"name": "random", "seed": 1},
        "search_space": {"x": {"type": "categorical", "choices": [1, 2, 3]}},
    }

    def objective(overrides):
        x = int([o for o in overrides if o.startswith("x=")][0].split("=")[1])
        return float((x - 2) ** 2)

    best, trials = run_search([], space_cfg, objective, output_dir=str(tmp_path))
    assert best is not None and best.params["x"] == 2
    assert (tmp_path / "trials.csv").exists() and (tmp_path / "best.yaml").exists()
    assert len(trials) == 8


def test_run_search_tolerates_failures(tmp_path):
    cfg = {
        "n_trials": 4,
        "search_space": {"x": {"type": "categorical", "choices": [0, 1]}},
        "sampler": {"name": "random", "seed": 0},
    }

    def objective(overrides):
        x = int([o for o in overrides if o.startswith("x=")][0].split("=")[1])
        if x == 0:
            raise RuntimeError("boom")
        return 1.0

    best, trials = run_search([], cfg, objective, output_dir=str(tmp_path))
    assert best is not None and best.params["x"] == 1


def test_make_grid_and_colorize():
    from climsr_tpu.training.callbacks import make_grid

    imgs = np.random.default_rng(0).normal(size=(3, 8, 8)).astype(np.float32)
    masks = np.ones((3, 8, 8), np.float32)
    masks[0, :4] = 0.0
    grid = make_grid(imgs, masks, nrow=2, cmap="jet")
    assert grid.shape == (16, 16, 3) and grid.dtype == np.uint8
    # masked region painted black
    assert grid[:4, :8].max() == 0


def test_build_callbacks_and_device_stats_monitor():
    from climsr_tpu.training.callbacks import DeviceStatsMonitor, build_callbacks

    cbs = build_callbacks(["log_images", "device_stats_monitor", "early_stopping"])
    assert any(isinstance(c, DeviceStatsMonitor) for c in cbs)
    assert len(cbs) == 2  # early_stopping is a Trainer feature, not a callback

    class _Logger:
        logged = None

        def log_metrics(self, metrics, step):
            self.logged = metrics

    class _Trainer:
        import jax as _jax

        mesh = type("M", (), {"devices": np.asarray(_jax.devices())})()
        metric_logger = _Logger()
        global_step = 7

    mon = DeviceStatsMonitor()
    mon.on_validation_end(_Trainer(), epoch=0, val_metrics={})
    logged = _Trainer.metric_logger.logged
    # CPU test devices may not expose allocator stats; if they do, keys must be well-formed
    if logged is not None:
        assert all(k.startswith("device_stats/dev") for k in logged)


def test_metric_logger_from_config(tmp_path):
    from climsr_tpu.utils.logging import MetricLogger

    # csv-only: no tensorboard writer
    ml = MetricLogger.from_config(tmp_path / "a", "csv")
    assert ml._tb is None
    ml.log_metrics({"train/loss": 1.0}, step=1)
    ml.close()
    assert (tmp_path / "a" / "metrics.csv").exists()

    # wandb isn't installed: falls back to tensorboard+csv with a warning
    ml = MetricLogger.from_config(tmp_path / "b", {"name": "wandb", "project": "p"})
    assert ml._third_party == []
    ml.close()

    # many_loggers resolves its list
    ml = MetricLogger.from_config(tmp_path / "c", {"name": "many_loggers", "loggers": ["tensorboard", "csv"]})
    ml.log_metrics({"x": 2.0}, step=0)
    ml.close()
    assert (tmp_path / "c" / "metrics.csv").exists()


def test_model_pruning_callback_magnitude_and_lottery():
    """l1-unstructured magnitude pruning with cumulative masks and the
    lottery-ticket rewind (reference conf/callbacks/{model_pruning,
    lottery_ticket}.yaml -> PL ModelPruning)."""
    import jax.numpy as jnp

    from climsr_tpu.training.callbacks import ModelPruningCallback

    class FakeTrainer:
        is_gan = False

        def __init__(self, params):
            self._params = params

        def _generator_params(self):
            return self._params

        def _set_generator_params(self, p):
            self._params = p

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(3, 3, 4, 8)).astype(np.float32)
    params = {"conv": {"kernel": jnp.asarray(w0), "bias": jnp.zeros((8,), jnp.float32)}}
    tr = FakeTrainer(params)

    cb = ModelPruningCallback(amount=0.5)
    cb.on_fit_start(tr)
    cb.on_validation_end(tr, 0, {})
    k1 = np.asarray(tr._params["conv"]["kernel"])
    sparsity1 = float((k1 == 0).mean())
    assert 0.45 <= sparsity1 <= 0.55
    # surviving weights unchanged; bias untouched
    alive = k1 != 0
    np.testing.assert_array_equal(k1[alive], w0[alive])
    assert np.asarray(tr._params["conv"]["bias"]).shape == (8,)

    # cumulative: second pass prunes half of the REMAINING weights
    cb.on_validation_end(tr, 1, {})
    k2 = np.asarray(tr._params["conv"]["kernel"])
    assert float((k2 == 0).mean()) > sparsity1 + 0.15

    # per-step enforcement (PL keeps params masked at every step): optimizer
    # drift on pruned positions is zeroed again by on_train_batch_end
    drifted = k2 + 0.5  # every weight moves away from zero
    tr._params = {"conv": {"kernel": jnp.asarray(drifted), "bias": jnp.zeros((8,), jnp.float32)}}
    cb.on_train_batch_end(tr)
    k_masked = np.asarray(tr._params["conv"]["kernel"])
    np.testing.assert_array_equal(k_masked[k2 == 0], 0.0)
    np.testing.assert_array_equal(k_masked[k2 != 0], drifted[k2 != 0])

    # lottery ticket: weights "train" away, rewind restores the initial values
    w_init = {"conv": {"kernel": jnp.asarray(w0), "bias": jnp.zeros((8,), jnp.float32)}}
    tr2 = FakeTrainer(w_init)
    lt = ModelPruningCallback(amount=0.3, use_lottery_ticket_hypothesis=True)
    lt.on_fit_start(tr2)  # captures w0
    tr2._params = {"conv": {"kernel": jnp.asarray(w0 + 1.0), "bias": jnp.zeros((8,), jnp.float32)}}
    lt.on_validation_end(tr2, 0, {})
    k3 = np.asarray(tr2._params["conv"]["kernel"])
    alive3 = k3 != 0
    # survivors equal the INITIAL values, not the trained ones
    np.testing.assert_array_equal(k3[alive3], w0[alive3])


def test_callback_registry_includes_pruning_and_gpu_stats_alias():
    from climsr_tpu.training.callbacks import (
        DeviceStatsMonitor,
        ModelPruningCallback,
        build_callbacks,
    )

    cbs = build_callbacks(["model_pruning", "lottery_ticket", "gpu_stats_monitor"])
    assert isinstance(cbs[0], ModelPruningCallback) and not cbs[0].use_lottery_ticket_hypothesis
    assert isinstance(cbs[1], ModelPruningCallback) and cbs[1].use_lottery_ticket_hypothesis
    assert isinstance(cbs[2], DeviceStatsMonitor)
