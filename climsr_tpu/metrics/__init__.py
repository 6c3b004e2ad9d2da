# -*- coding: utf-8 -*-
"""Quality metrics as pure jax functions + the reference's 16-metric suite."""
from climsr_tpu.metrics.functional import (  # noqa: F401
    mae,
    mape,
    mse,
    psnr,
    r2_score,
    regression_accuracy,
    rmse,
    smape,
    ssim,
)
from climsr_tpu.metrics.suite import REGRESSION_ACCURACY_THRESHOLDS, compute_metric_suite  # noqa: F401
