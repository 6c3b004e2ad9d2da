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


def test_tpe_sampler_ignores_pruned_trials():
    """Optuna's consider_pruned_trials=False default: a PRUNED trial's value
    is an early-epoch intermediate, not a final — feeding it to the TPE
    good/bad split would bias suggestions toward epoch-0 noise."""
    space = _space()
    sampler = CategoricalTPESampler(space, seed=0, n_startup_trials=4)
    history = []
    for i in range(10):
        # completed evidence: lr=1e-3 is the genuinely good choice
        history.append(Trial(2 * i, {"training.lr": 1e-3, "datamodule.cfg.use_mask": True}, value=1.0))
        history.append(Trial(2 * i + 1, {"training.lr": 1e-4, "datamodule.cfg.use_mask": True}, value=5.0))
    for i in range(10):
        # pruned trials carry stellar-looking epoch-0 intermediates for the
        # bad choice; counting them would flip the good/bad split
        history.append(
            Trial(20 + i, {"training.lr": 1e-4, "datamodule.cfg.use_mask": True}, value=0.01, state="PRUNED")
        )
    picks = [sampler.suggest(history)["training.lr"] for _ in range(50)]
    assert picks.count(1e-3) > 30  # still biased to the COMPLETE-trial winner


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


def test_run_search_median_pruning(tmp_path):
    """Trials reporting worse-than-median intermediates are cut short with
    state PRUNED and their last report as value (reference capability:
    Optuna's pruner in conf/hparams_search/*)."""
    cfg = {
        "n_trials": 8,
        "search_space": {"x": {"type": "categorical", "choices": [0, 1]}},
        "sampler": {"name": "random", "seed": 3},
        "pruner": {"name": "median", "n_startup_trials": 2, "n_warmup_steps": 0},
    }
    attempts = {0: [], 1: []}

    def objective(overrides, report):
        x = int([o for o in overrides if o.startswith("x=")][0].split("=")[1])
        # x=1 converges to 0.1; x=0 is always 10x worse -> gets pruned once
        # two peer trials exist at the same report index. Track how far each
        # run got BEFORE report() raises TrialPruned, so early-stop is
        # directly observable (a swallowed TrialPruned would show n == 5).
        attempts[x].append(0)
        for step in range(5):
            attempts[x][-1] = step + 1
            report(step, (1.0 if x else 10.0) / (step + 1))
        return (1.0 if x else 10.0) / 5

    best, trials = run_search([], cfg, objective, output_dir=str(tmp_path))
    states = [t.state for t in trials]
    assert "PRUNED" in states
    pruned = [t for t in trials if t.state == "PRUNED"]
    assert all(t.params["x"] == 0 for t in pruned)
    assert all(t.value == t.intermediate[-1] for t in pruned)
    assert best is not None and best.params["x"] == 1
    # pruned objectives genuinely STOPPED EARLY: every PRUNED trial's run
    # broke off before its 5th report; completed x=1 runs all reached 5
    early = [n for n in attempts[0] if n < 5]
    assert len(early) == len(pruned) and early, (attempts, states)
    assert all(n == 5 for n in attempts[1])


def test_run_search_resume_continues_numbering(tmp_path):
    cfg = {
        "n_trials": 4,
        "search_space": {"x": {"type": "categorical", "choices": [1, 2, 3]}},
        "sampler": {"name": "random", "seed": 5},
    }

    def objective(overrides):
        x = int([o for o in overrides if o.startswith("x=")][0].split("=")[1])
        return float((x - 2) ** 2)

    _, first = run_search([], cfg, objective, output_dir=str(tmp_path))
    assert len(first) == 4

    calls = []

    def objective2(overrides):
        calls.append(overrides)
        return objective(overrides)

    cfg2 = dict(cfg, n_trials=7)
    best, all_trials = run_search([], cfg2, objective2, output_dir=str(tmp_path))
    # only the 3 new trials ran; prior 4 were reloaded with params intact
    assert len(calls) == 3
    assert [t.number for t in all_trials] == list(range(7))
    assert all(isinstance(t.params["x"], int) for t in all_trials)
    # best considers reloaded AND new trials
    assert best is not None
    assert best.value == min(t.value for t in all_trials if t.value is not None)


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
        step = None

        def log_metrics(self, metrics, step):
            self.logged = metrics
            self.step = step

    class _FakeDev:
        """CPU test devices expose no allocator stats, so fake them — the
        payload assertions must run unconditionally or the test only checks
        registry wiring."""

        def memory_stats(self):
            return {"bytes_in_use": 2**30, "peak_bytes_in_use": 2 * 2**30, "bytes_limit": 4 * 2**30}

    class _Trainer:
        mesh = type("M", (), {"devices": np.asarray([_FakeDev(), _FakeDev()])})()
        metric_logger = _Logger()
        global_step = 7

    mon = DeviceStatsMonitor()
    mon.on_validation_end(_Trainer(), epoch=0, val_metrics={})
    logged = _Trainer.metric_logger.logged
    assert logged is not None and _Trainer.metric_logger.step == 7
    assert logged["device_stats/dev0/bytes_in_use_gib"] == 1.0
    assert logged["device_stats/dev1/peak_bytes_in_use_gib"] == 2.0
    assert logged["device_stats/dev0/utilization"] == 0.25
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
    cb.on_train_epoch_end(tr, 0)
    k1 = np.asarray(tr._params["conv"]["kernel"])
    sparsity1 = float((k1 == 0).mean())
    assert 0.45 <= sparsity1 <= 0.55
    # surviving weights unchanged; bias untouched
    alive = k1 != 0
    np.testing.assert_array_equal(k1[alive], w0[alive])
    assert np.asarray(tr._params["conv"]["bias"]).shape == (8,)

    # cumulative: second pass prunes half of the REMAINING weights
    cb.on_train_epoch_end(tr, 1)
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
    lt.on_train_epoch_end(tr2, 0)
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


def _fake_module(name, **attrs):
    import types

    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


class _Recorder:
    def __init__(self):
        self.calls = []

    def __getattr__(self, name):
        def record(*args, **kwargs):
            self.calls.append((name, args, kwargs))
            return self

        return record

    def __getitem__(self, key):  # neptune run["metric"] style
        self.calls.append(("__getitem__", (key,), {}))
        return self


@pytest.mark.parametrize("name", ["wandb", "mlflow", "neptune", "comet"])
def test_third_party_logger_adapters_call_signatures(tmp_path, name, monkeypatch):
    """Pin the adapter call signatures of utils/logging.py against fake
    modules (round-2 finding: every branch was import-gated and untestable
    in-env, so a signature typo would ship silently)."""
    import sys

    from climsr_tpu.utils.logging import MetricLogger

    rec = _Recorder()
    if name == "wandb":
        monkeypatch.setitem(sys.modules, "wandb", _fake_module("wandb", init=lambda **kw: rec))
    elif name == "mlflow":
        mod = _fake_module(
            "mlflow",
            set_experiment=lambda n: rec.calls.append(("set_experiment", (n,), {})),
            start_run=lambda: rec.calls.append(("start_run", (), {})),
            log_metrics=lambda m, step: rec.calls.append(("log_metrics", (m,), {"step": step})),
            end_run=lambda: rec.calls.append(("end_run", (), {})),
        )
        monkeypatch.setitem(sys.modules, "mlflow", mod)
    elif name == "neptune":
        monkeypatch.setitem(sys.modules, "neptune", _fake_module("neptune", init_run=lambda **kw: rec))
    elif name == "comet":
        monkeypatch.setitem(sys.modules, "comet_ml", _fake_module("comet_ml", Experiment=lambda **kw: rec))

    ml = MetricLogger.from_config(tmp_path / name, {"name": name, "project": "p"})
    assert ml._third_party, f"{name} adapter did not attach"
    ml.log_metrics({"train/loss": 0.5, "val/rmse": 1.25}, step=3)
    ml.close()

    called = [c[0] for c in rec.calls]
    if name == "wandb":
        assert "log" in called and "finish" in called
        log_call = next(c for c in rec.calls if c[0] == "log")
        assert log_call[1][0] == {"train/loss": 0.5, "val/rmse": 1.25} and log_call[2] == {"step": 3}
    elif name == "mlflow":
        assert "set_experiment" in called and "start_run" in called and "end_run" in called
        log_call = next(c for c in rec.calls if c[0] == "log_metrics")
        # mlflow forbids '/' in metric keys -> adapter rewrites to '.'
        assert log_call[1][0] == {"train.loss": 0.5, "val.rmse": 1.25} and log_call[2] == {"step": 3}
    elif name == "neptune":
        assert ("__getitem__", ("train/loss",), {}) in rec.calls
        append_calls = [c for c in rec.calls if c[0] == "append"]
        assert append_calls and all(c[2] == {"step": 3} for c in append_calls)
        assert "stop" in called  # close() must flush the background sync thread
    elif name == "comet":
        log_call = next(c for c in rec.calls if c[0] == "log_metrics")
        assert log_call[1][0] == {"train/loss": 0.5, "val/rmse": 1.25}
        assert "end" in called  # close() must end the experiment


def test_advanced_profiler_per_op_table(tmp_path):
    """profiler=advanced derives a per-op device-time table from an xplane
    trace (round-2 finding: advanced/pytorch silently degraded to the stage
    table)."""
    import jax
    import jax.numpy as jnp

    from climsr_tpu.utils.profiling import advanced_profile_report

    f = jax.jit(lambda x: jnp.tanh(x @ x) + 1.0)
    x = jnp.ones((256, 256), jnp.float32)
    with jax.profiler.trace(str(tmp_path)):
        for _ in range(3):
            x = f(x)
        jax.block_until_ready(x)

    report = advanced_profile_report(tmp_path)
    if report is None:
        pytest.skip("no xplane proto support in this environment")
    assert "TOTAL (compute events)" in report
    assert "ms" in report and "%" in report
    # at least one real op row with a count
    assert any(line.strip() and "op" not in line and "TOTAL" not in line for line in report.splitlines()[1:])


def test_run_search_legacy_trials_csv_starts_fresh(tmp_path, caplog):
    """A trials.csv from an older/foreign format must not crash resume — the
    sweep warns and starts fresh (first write converts the file)."""
    (tmp_path / "trials.csv").write_text("number,value,x\n0,1.0,2\n")
    cfg = {
        "n_trials": 2,
        "search_space": {"x": {"type": "categorical", "choices": [1, 2]}},
        "sampler": {"name": "random", "seed": 0},
    }

    def objective(overrides):
        return 1.0

    best, trials = run_search([], cfg, objective, output_dir=str(tmp_path))
    assert len(trials) == 2 and all(t.number in (0, 1) for t in trials)
    assert best is not None


def test_run_search_pruned_trial_never_best(tmp_path):
    """Optuna semantics: a PRUNED trial's (early-epoch) value must not win
    best.yaml even when it is numerically smaller than completed finals."""
    cfg = {
        "n_trials": 6,
        "search_space": {"x": {"type": "categorical", "choices": [0, 1]}},
        "sampler": {"name": "random", "seed": 3},
        "pruner": {"name": "median", "n_startup_trials": 2, "n_warmup_steps": 0},
    }

    def objective(overrides, report):
        x = int([o for o in overrides if o.startswith("x=")][0].split("=")[1])
        # x=0: stellar first report (0.01) then diverges -> pruned trials
        # would carry value 0.01 if their early reports counted
        # x=1: steady 1.0 -> completes
        for step in range(4):
            report(step, 0.01 if (x == 0 and step == 0) else (5.0 if x == 0 else 1.0))
        return 5.0 if x == 0 else 1.0

    best, trials = run_search([], cfg, objective, output_dir=str(tmp_path))
    assert best is not None
    assert best.state == "COMPLETE"
    assert best.value == 1.0 and best.params["x"] == 1
