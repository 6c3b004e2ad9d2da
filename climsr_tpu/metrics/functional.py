# -*- coding: utf-8 -*-
"""Image/regression quality metrics as pure jax functions.

Parity targets (semantics of the torchmetrics versions used by the reference,
see ``climsr/core/task.py:302-340``):

- ``psnr``: ``data_range`` defaults to ``max(target) - min(target)`` of the
  current batch (torchmetrics ``PSNR(data_range=None)`` behavior).
- ``ssim``: 11x11 gaussian window, sigma 1.5, k1=0.01, k2=0.03, valid-window
  mean; ``data_range`` defaults to
  ``max(preds.range, target.range)`` like torchmetrics ``SSIM(data_range=None)``.
- ``mape``/``smape``: denominator clamped at 1.17e-6 (torchmetrics epsilon).
- ``r2_score``: plain 1 - SS_res/SS_tot over the flattened inputs.
- ``regression_accuracy``: fraction of pixels with ``|pred - target| <= eps``
  (reference ``climsr/metrics/regression_accuracy.py``).

All functions are jit-safe and reduce to scalars. Under a sharded batch
(``jax.sharding``), the contained means/sums compile to global collectives, so
these are also the distributed ("dist_reduce") forms — no explicit psum needed.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_TM_EPS = 1.17e-6  # torchmetrics MAPE/SMAPE denominator clamp


def mse(preds: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(preds - target))


def rmse(preds: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.sqrt(mse(preds, target))


def mae(preds: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(preds - target))


def mape(preds: jax.Array, target: jax.Array) -> jax.Array:
    denom = jnp.clip(jnp.abs(target), min=_TM_EPS)
    return jnp.mean(jnp.abs(preds - target) / denom)


def smape(preds: jax.Array, target: jax.Array) -> jax.Array:
    denom = jnp.clip(jnp.abs(preds) + jnp.abs(target), min=_TM_EPS)
    return jnp.mean(2.0 * jnp.abs(preds - target) / denom)


def r2_score(preds: jax.Array, target: jax.Array) -> jax.Array:
    preds = preds.reshape(-1)
    target = target.reshape(-1)
    ss_res = jnp.sum(jnp.square(target - preds))
    ss_tot = jnp.sum(jnp.square(target - jnp.mean(target)))
    return 1.0 - ss_res / ss_tot


def regression_accuracy(preds: jax.Array, target: jax.Array, eps: float = 1.0) -> jax.Array:
    return jnp.mean((jnp.abs(preds - target) <= eps).astype(jnp.float32))


def psnr(preds: jax.Array, target: jax.Array, data_range: float | jax.Array | None = None) -> jax.Array:
    if data_range is None:
        data_range = jnp.max(target) - jnp.min(target)
    return 10.0 * jnp.log10(jnp.square(data_range) / mse(preds, target))


def _gaussian_kernel1d(kernel_size: int, sigma: float) -> jax.Array:
    coords = jnp.arange(kernel_size, dtype=jnp.float32) - (kernel_size - 1) / 2.0
    g = jnp.exp(-jnp.square(coords) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def _filter2d_separable(x: jax.Array, k1d: jax.Array) -> jax.Array:
    """Depthwise separable gaussian filter on NHWC, valid padding.

    Separable 1D convs: 2*K multiply-adds per pixel instead of K^2 — the same
    trick production SSIM kernels use; XLA maps these to efficient TPU convs.
    """
    c = x.shape[-1]
    kh = jnp.tile(k1d.reshape(-1, 1, 1, 1), (1, 1, 1, c))  # (K,1,1,C) HWIO depthwise
    kw = jnp.tile(k1d.reshape(1, -1, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    # Metrics must not inherit the TPU's bf16 conv default — force full precision.
    hi = jax.lax.Precision.HIGHEST
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c, precision=hi
    )
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c, precision=hi
    )
    return x


@partial(jax.jit, static_argnames=("kernel_size", "sigma", "k1", "k2"))
def ssim(
    preds: jax.Array,
    target: jax.Array,
    data_range: float | jax.Array | None = None,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Structural similarity over NHWC batches (scalar mean over valid windows)."""
    preds = preds.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if preds.shape[1] < kernel_size or preds.shape[2] < kernel_size:
        raise ValueError(
            f"ssim needs images >= {kernel_size}px (got {preds.shape[1]}x{preds.shape[2]}); "
            "no valid windows would remain"
        )
    if data_range is None:
        data_range = jnp.maximum(
            jnp.max(preds) - jnp.min(preds),
            jnp.max(target) - jnp.min(target),
        )
    c1 = jnp.square(k1 * data_range)
    c2 = jnp.square(k2 * data_range)
    k1d = _gaussian_kernel1d(kernel_size, sigma)

    mu_p = _filter2d_separable(preds, k1d)
    mu_t = _filter2d_separable(target, k1d)
    mu_pp = _filter2d_separable(preds * preds, k1d)
    mu_tt = _filter2d_separable(target * target, k1d)
    mu_pt = _filter2d_separable(preds * target, k1d)

    sigma_p = mu_pp - mu_p * mu_p
    sigma_t = mu_tt - mu_t * mu_t
    sigma_pt = mu_pt - mu_p * mu_t

    num = (2.0 * mu_p * mu_t + c1) * (2.0 * sigma_pt + c2)
    den = (mu_p * mu_p + mu_t * mu_t + c1) * (sigma_p + sigma_t + c2)
    return jnp.mean(num / den)
