#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Generate golden metric values with an independent torch implementation.

The reference computes its 16-metric suite with torchmetrics at defaults
(``climsr/core/task.py:302-336``: ``PSNR()``, ``SSIM()``, ``MAE``, ``MSE``,
``RMSE``, ``MAPE``, ``SMAPE``, ``R2Score``). torchmetrics is not installable
here, so this script re-derives each metric in plain torch following the
torchmetrics algorithm definitions:

- PSNR(data_range=None): ``10*log10(range^2 / mse)`` with
  ``range = max(target) - min(target)`` over the whole batch.
- SSIM(data_range=None): 11x11 gaussian window (sigma 1.5), k1=0.01 k2=0.03,
  VALID-window convolution (no padding), per-channel, data_range =
  ``max(preds.max-preds.min, target.max-target.min)``, mean over the map.
- MAPE: ``mean(|p - t| / clamp(|t|, eps=1.17e-6))``.
- SMAPE: ``mean(2|p - t| / clamp(|p| + |t|, eps=1.17e-6))``.
- R2Score: on flattened 1-D inputs, ``1 - ss_res/ss_tot``.

The captured values are committed as ``tests/fixtures/metric_goldens.npz``
and ``tests/test_metric_goldens.py`` asserts the JAX suite matches them —
breaking the circularity of testing JAX formulas against numpy re-derivations
of the same code.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
import torch
import torch.nn.functional as F


def t_psnr(preds, target):
    data_range = target.max() - target.min()
    mse = torch.mean((preds - target) ** 2)
    return 10.0 * torch.log10(data_range**2 / mse)


def _gaussian_kernel(kernel_size=11, sigma=1.5):
    coords = torch.arange(kernel_size, dtype=torch.float64) - (kernel_size - 1) / 2.0
    g = torch.exp(-(coords**2) / (2 * sigma**2))
    g = g / g.sum()
    return (g[:, None] @ g[None, :]).to(torch.float32)


def t_ssim(preds, target, k1=0.01, k2=0.03):
    # NCHW in; valid-window gaussian SSIM per torchmetrics' algorithm
    data_range = torch.max(preds.max() - preds.min(), target.max() - target.min())
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    ch = preds.shape[1]
    kern = _gaussian_kernel().expand(ch, 1, 11, 11)

    def filt(x):
        return F.conv2d(x, kern, groups=ch)

    mu_p, mu_t = filt(preds), filt(target)
    mu_p2, mu_t2, mu_pt = mu_p**2, mu_t**2, mu_p * mu_t
    sigma_p = filt(preds * preds) - mu_p2
    sigma_t = filt(target * target) - mu_t2
    sigma_pt = filt(preds * target) - mu_pt
    num = (2 * mu_pt + c1) * (2 * sigma_pt + c2)
    den = (mu_p2 + mu_t2 + c1) * (sigma_p + sigma_t + c2)
    return (num / den).mean()


def t_mape(preds, target, eps=1.17e-6):
    return torch.mean(torch.abs(preds - target) / torch.clamp(torch.abs(target), min=eps))


def t_smape(preds, target, eps=1.17e-6):
    return torch.mean(
        2 * torch.abs(preds - target) / torch.clamp(torch.abs(preds) + torch.abs(target), min=eps)
    )


def t_r2(preds, target):
    p, t = preds.flatten(), target.flatten()
    ss_res = torch.sum((t - p) ** 2)
    ss_tot = torch.sum((t - t.mean()) ** 2)
    return 1 - ss_res / ss_tot


def main() -> None:
    rng = np.random.default_rng(1234)
    cases = {}
    for i, (shape, scale, shift) in enumerate(
        [((4, 1, 32, 32), 1.0, 0.0), ((2, 1, 48, 48), 5.0, 10.0), ((3, 2, 24, 24), 0.3, -2.0)]
    ):
        target = (rng.normal(size=shape) * scale + shift).astype(np.float32)
        preds = (target + rng.normal(size=shape).astype(np.float32) * 0.2 * scale).astype(np.float32)
        tp, tt = torch.from_numpy(preds), torch.from_numpy(target)
        cases[f"case{i}_preds"] = preds
        cases[f"case{i}_target"] = target
        cases[f"case{i}_psnr"] = t_psnr(tp, tt).item()
        cases[f"case{i}_ssim"] = t_ssim(tp, tt).item()
        cases[f"case{i}_mae"] = torch.mean(torch.abs(tp - tt)).item()
        cases[f"case{i}_mse"] = torch.mean((tp - tt) ** 2).item()
        cases[f"case{i}_rmse"] = torch.sqrt(torch.mean((tp - tt) ** 2)).item()
        cases[f"case{i}_mape"] = t_mape(tp, tt).item()
        cases[f"case{i}_smape"] = t_smape(tp, tt).item()
        cases[f"case{i}_r2"] = t_r2(tp, tt).item()
        for eps in (0.1, 0.5, 1.0):
            cases[f"case{i}_acc@{eps}"] = torch.mean((torch.abs(tp - tt) <= eps).float()).item()
    out = Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "metric_goldens.npz"
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(out, n_cases=3, **cases)
    print(f"wrote {out} with 3 cases")


if __name__ == "__main__":
    main()
