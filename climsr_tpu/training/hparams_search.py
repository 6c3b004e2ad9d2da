# -*- coding: utf-8 -*-
"""Hyperparameter search driver (the reference's Optuna sweeper, self-contained).

Parity: ``conf/hparams_search/srcnn_optuna.yaml`` — categorical search space
over training/datamodule knobs, objective = the metric the train CLI returns
(``optimized_metric``, usually val/rmse), direction minimize, n_trials.

Optuna isn't available in this environment, so the driver implements:

- ``random`` sampling, and
- ``tpe`` — a categorical Tree-of-Parzen-Estimators-style sampler: after
  ``n_startup_trials`` random trials, the trials are split at the ``gamma``
  quantile into good/bad sets and each categorical choice is sampled
  proportionally to ``(count_good + 1) / (count_bad + 1)`` — the standard TPE
  ratio rule specialized to categorical spaces (all of the reference's search
  dimensions are categorical).

Results land in ``<output_dir>/hparams_search/trials.csv`` + ``best.yaml``.
"""
from __future__ import annotations

import csv
import logging
import math
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import yaml

logger = logging.getLogger(__name__)


@dataclass
class SearchSpace:
    """name -> list of categorical choices."""

    dimensions: Dict[str, List[Any]]

    @classmethod
    def from_config(cls, cfg: Dict[str, Any]) -> "SearchSpace":
        dims = {}
        for key, spec in (cfg or {}).items():
            if isinstance(spec, dict) and spec.get("type") == "categorical":
                dims[key] = list(spec["choices"])
            elif isinstance(spec, list):
                dims[key] = list(spec)
            else:
                raise ValueError(f"Unsupported search dimension {key}: {spec}")
        return cls(dims)


@dataclass
class Trial:
    number: int
    params: Dict[str, Any]
    value: Optional[float] = None


class CategoricalTPESampler:
    def __init__(self, space: SearchSpace, seed: int = 42, n_startup_trials: int = 10, gamma: float = 0.25):
        self.space = space
        self.rng = np.random.default_rng(seed)
        self.n_startup_trials = n_startup_trials
        self.gamma = gamma

    def suggest(self, history: Sequence[Trial]) -> Dict[str, Any]:
        completed = [t for t in history if t.value is not None and math.isfinite(t.value)]
        if len(completed) < self.n_startup_trials:
            return {k: self._choice(v) for k, v in self.space.dimensions.items()}
        ranked = sorted(completed, key=lambda t: t.value)
        n_good = max(1, int(len(ranked) * self.gamma))
        good, bad = ranked[:n_good], ranked[n_good:]
        params = {}
        for key, choices in self.space.dimensions.items():
            weights = []
            for choice in choices:
                cg = sum(1 for t in good if _eq(t.params.get(key), choice))
                cb = sum(1 for t in bad if _eq(t.params.get(key), choice))
                weights.append((cg + 1.0) / (cb + 1.0))
            w = np.asarray(weights) / np.sum(weights)
            params[key] = choices[int(self.rng.choice(len(choices), p=w))]
        return params

    def _choice(self, choices: List[Any]) -> Any:
        return choices[int(self.rng.integers(len(choices)))]


class RandomSampler(CategoricalTPESampler):
    def suggest(self, history: Sequence[Trial]) -> Dict[str, Any]:
        return {k: self._choice(v) for k, v in self.space.dimensions.items()}


def _eq(a, b) -> bool:
    return a == b


def _to_override(key: str, value: Any) -> str:
    import json

    # JSON is a YAML subset, so the CLI's yaml-based override parser reads it back
    return f"{key}={json.dumps(value)}"


def run_search(
    base_overrides: List[str],
    search_cfg: Dict[str, Any],
    objective: Callable[[List[str]], Optional[float]],
    output_dir: str = "hparams_search",
) -> Tuple[Optional[Trial], List[Trial]]:
    """Run the sweep; ``objective(overrides) -> metric`` is usually cli.train.main."""
    space = SearchSpace.from_config(search_cfg.get("search_space"))
    n_trials = int(search_cfg.get("n_trials", 20))
    direction = search_cfg.get("direction", "minimize")
    sampler_name = (search_cfg.get("sampler") or {}).get("name", "tpe") if isinstance(
        search_cfg.get("sampler"), dict
    ) else search_cfg.get("sampler", "tpe")
    seed = int((search_cfg.get("sampler") or {}).get("seed", 42)) if isinstance(search_cfg.get("sampler"), dict) else 42
    sampler_cls = CategoricalTPESampler if sampler_name == "tpe" else RandomSampler
    sampler = sampler_cls(space, seed=seed, n_startup_trials=int(
        (search_cfg.get("sampler") or {}).get("n_startup_trials", 10)
    ) if isinstance(search_cfg.get("sampler"), dict) else 10)

    sign = 1.0 if direction == "minimize" else -1.0
    out_dir = Path(output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    trials: List[Trial] = []
    best: Optional[Trial] = None
    for i in range(n_trials):
        params = sampler.suggest(trials)
        overrides = list(base_overrides) + [_to_override(k, v) for k, v in params.items()]
        logger.info("Trial %d/%d: %s", i + 1, n_trials, params)
        try:
            raw = objective(overrides)
            value = sign * float(raw) if raw is not None else None
        except Exception:
            logger.exception("Trial %d failed", i)
            value = None
        trial = Trial(number=i, params=params, value=value)
        trials.append(trial)
        if value is not None and (best is None or value < best.value):
            best = trial
            with open(out_dir / "best.yaml", "w") as f:
                yaml.safe_dump({"value": sign * best.value, "params": best.params}, f)
        _write_trials(out_dir / "trials.csv", trials, sign)
    if best:
        logger.info("Best trial: %s -> %.5f", best.params, sign * best.value)
    return best, trials


def _write_trials(path: Path, trials: List[Trial], sign: float) -> None:
    keys = sorted({k for t in trials for k in t.params})
    with open(path, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["number", "value"] + keys)
        for t in trials:
            writer.writerow([t.number, sign * t.value if t.value is not None else ""] + [t.params.get(k) for k in keys])
