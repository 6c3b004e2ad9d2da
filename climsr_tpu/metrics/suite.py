# -*- coding: utf-8 -*-
"""The reference's 16-metric validation suite with its normalized/denormalized routing.

Parity: ``climsr/core/task.py:302-380`` —

- ``ssim`` and ``mape`` are computed on the *normalized* tensors,
- ``r2`` on the *flattened denormalized* tensors,
- everything else (psnr, mae, mse, rmse, smape, acc@eps) on *denormalized*,
- accuracy thresholds {0.1, 0.25, 0.5, 0.75, 1, 1.25, 1.5, 2},
- key ``acc@01.25`` reproduces the reference's typo'd label verbatim so logged
  metric names stay interchangeable.

The whole dict is computed inside one jit; under a device mesh the reductions
become global collectives automatically (GSPMD), which supersedes the
torchmetrics ``dist_reduce_fx="sum"`` machinery.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax

import climsr_tpu.consts as consts
from climsr_tpu.metrics import functional as F

REGRESSION_ACCURACY_THRESHOLDS = (0.1, 0.25, 0.5, 0.75, 1.0, 1.25, 1.5, 2.0)

# Reference label quirk: eps=1.25 is logged as "acc@01.25" (task.py:325).
_ACC_LABELS = ("acc@0.1", "acc@0.25", "acc@0.5", "acc@0.75", "acc@1", "acc@01.25", "acc@1.5", "acc@2")


def compute_metric_suite(
    normalized_sr: jax.Array,
    normalized_hr: jax.Array,
    denormalized_sr: jax.Array,
    denormalized_hr: jax.Array,
    mode: Optional[str] = consts.stages.val,
) -> Dict[str, jax.Array]:
    normalized_hr = normalized_hr.astype(normalized_sr.dtype)
    denormalized_hr = denormalized_hr.astype(denormalized_sr.dtype)

    results: Dict[str, jax.Array] = {}
    for label, eps in zip(_ACC_LABELS, REGRESSION_ACCURACY_THRESHOLDS):
        results[f"{mode}/{label}"] = F.regression_accuracy(denormalized_sr, denormalized_hr, eps=eps)
    results[f"{mode}/psnr"] = F.psnr(denormalized_sr, denormalized_hr)
    results[f"{mode}/ssim"] = F.ssim(normalized_sr, normalized_hr)
    results[f"{mode}/mae"] = F.mae(denormalized_sr, denormalized_hr)
    results[f"{mode}/mse"] = F.mse(denormalized_sr, denormalized_hr)
    results[f"{mode}/rmse"] = F.rmse(denormalized_sr, denormalized_hr)
    results[f"{mode}/mape"] = F.mape(normalized_sr, normalized_hr)
    results[f"{mode}/smape"] = F.smape(denormalized_sr, denormalized_hr)
    results[f"{mode}/r2"] = F.r2_score(denormalized_sr, denormalized_hr)
    return results
