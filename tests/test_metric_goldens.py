# -*- coding: utf-8 -*-
"""JAX metric suite vs committed golden values from an independent torch
implementation of the torchmetrics algorithms (see
``scripts/gen_metric_goldens.py``). Breaks the circularity of checking the
JAX formulas only against numpy re-derivations of themselves.

Reference semantics: ``climsr/core/task.py:302-336`` (torchmetrics defaults).
"""
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from climsr_tpu.metrics import functional as F

_FIXTURE = Path(__file__).with_name("fixtures") / "metric_goldens.npz"

_METRICS = {
    "psnr": lambda p, t: F.psnr(p, t),
    "ssim": lambda p, t: F.ssim(p, t),
    "mae": F.mae,
    "mse": F.mse,
    "rmse": F.rmse,
    "mape": F.mape,
    "smape": F.smape,
    "r2": lambda p, t: F.r2_score(p.reshape(-1), t.reshape(-1)),
    "acc@0.1": lambda p, t: F.regression_accuracy(p, t, eps=0.1),
    "acc@0.5": lambda p, t: F.regression_accuracy(p, t, eps=0.5),
    "acc@1.0": lambda p, t: F.regression_accuracy(p, t, eps=1.0),
}


@pytest.fixture(scope="module")
def goldens():
    return np.load(_FIXTURE)


@pytest.mark.parametrize("case", [0, 1, 2])
@pytest.mark.parametrize("name", sorted(_METRICS))
def test_metric_matches_torch_golden(goldens, case, name):
    preds = goldens[f"case{case}_preds"]  # NCHW f32
    target = goldens[f"case{case}_target"]
    key = name if not name.startswith("acc@") else f"acc@{float(name.split('@')[1])}"
    want = float(goldens[f"case{case}_{key}"])
    # jax suite is NHWC
    p = jnp.asarray(preds.transpose(0, 2, 3, 1))
    t = jnp.asarray(target.transpose(0, 2, 3, 1))
    got = float(_METRICS[name](p, t))
    assert got == pytest.approx(want, rel=2e-4, abs=2e-5), (name, case, got, want)
