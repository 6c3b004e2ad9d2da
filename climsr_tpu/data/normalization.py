# -*- coding: utf-8 -*-
"""Min-max and z-score scalers as pure functions over numpy or jax arrays.

Behavioral parity with reference ``climsr/data/normalization.py``:

- ``MinMaxScaler.normalize(arr, min, max, missing_indicator)``: optional
  missing-indicator→NaN substitution, optional per-array nanmin/nanmax,
  ``scale = (b - a) / (range + eps)``, then NaN→``nan_substitution``, float32 out.
- ``MinMaxScaler.denormalize(arr, min, max)``: exact inverse with *per-sample*
  min/max broadcast across a batch (the reference does this with a
  transpose/permute trick at ``normalization.py:63-84``; here min/max are
  reshaped to ``(B, 1, 1, 1)`` which is layout-agnostic and XLA-friendly).
- ``StandardScaler``: ``(x - mean) / (std + eps)``; denormalize is
  ``x * std + mean`` — deliberately *without* eps, matching the reference
  asymmetry at ``normalization.py:115-116``.

All functions are non-mutating and safe to call inside ``jax.jit`` when given
jnp arrays (NaN handling is via ``where``, no boolean indexing).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import numpy as np

minmax = "minmax"
zscore = "zscore"

Array = Union[np.ndarray, "jax.Array"]  # noqa: F821


def _xp(arr):
    """Return the array namespace (numpy or jax.numpy) for ``arr``."""
    if isinstance(arr, np.ndarray) or np.isscalar(arr):
        return np
    import jax.numpy as jnp

    return jnp


def _broadcast_per_sample(stat, arr, xp):
    """Reshape per-sample stats ``(B,)`` to broadcast over ``(B, ...)`` arrays.

    Scalars pass through unchanged.
    """
    stat = xp.asarray(stat)
    if stat.ndim == 0:
        return stat
    return stat.reshape(stat.shape + (1,) * (arr.ndim - stat.ndim))


def minmax_normalize(
    arr: Array,
    min: Optional[Array] = None,  # noqa: A002 — parity with reference API
    max: Optional[Array] = None,  # noqa: A002
    missing_indicator: Optional[float] = None,
    feature_range: Tuple[float, float] = (0.0, 1.0),
    eps: float = 1e-8,
    nan_substitution: float = 0.0,
) -> Array:
    xp = _xp(arr)
    a, b = feature_range
    out = xp.asarray(arr, dtype=xp.float32)
    if missing_indicator:
        out = xp.where(out == missing_indicator, xp.nan, out)
    if min is None or max is None:
        max = xp.nanmax(out)  # noqa: A001
        min = xp.nanmin(out)  # noqa: A001
    min = _broadcast_per_sample(min, out, xp)  # noqa: A001
    max = _broadcast_per_sample(max, out, xp)  # noqa: A001
    data_range = max - min
    scale = (b - a) / (data_range + eps)
    out = out * scale + (a - min * scale)
    out = xp.where(xp.isnan(out), nan_substitution, out)
    return out.astype(xp.float32)


def minmax_denormalize(
    arr: Array,
    min: Array,  # noqa: A002
    max: Array,  # noqa: A002
    feature_range: Tuple[float, float] = (0.0, 1.0),
    eps: float = 1e-8,
) -> Array:
    xp = _xp(arr)
    a, b = feature_range
    min = _broadcast_per_sample(min, arr, xp)  # noqa: A001
    max = _broadcast_per_sample(max, arr, xp)  # noqa: A001
    data_range = max - min
    scale = (b - a) / (data_range + eps)
    min_ = a - min * scale
    return (arr - min_) / scale


def zscore_normalize(
    arr: Array,
    mean: Array,
    std: Array,
    eps: float = 1e-8,
    missing_indicator: Optional[float] = None,
    nan_substitution: Optional[float] = None,
) -> Array:
    xp = _xp(arr)
    out = xp.asarray(arr, dtype=xp.float32)
    if missing_indicator:
        out = xp.where(out == missing_indicator, xp.nan, out)
    out = (out - mean) / (std + eps)
    if nan_substitution is not None and nan_substitution:
        # Reference quirk (`StandardScaler._normalize:110`): substitution only
        # happens when the configured value is truthy (a 0.0 sub is a no-op).
        out = xp.where(xp.isnan(out), nan_substitution, out)
    return out.astype(xp.float32)


def zscore_denormalize(arr: Array, mean: Array, std: Array) -> Array:
    # No eps here — matches the reference inverse (normalization.py:116).
    return (arr * std) + mean


@dataclasses.dataclass
class Scaler:
    """Common scaler interface; see :class:`MinMaxScaler` / :class:`StandardScaler`."""

    def normalize(self, *args, **kwargs):
        return self._normalize(*args, **kwargs)

    def denormalize(self, *args, **kwargs):
        return self._denormalize(*args, **kwargs)


@dataclasses.dataclass
class MinMaxScaler(Scaler):
    eps: float = 1e-8
    feature_range: Tuple[float, float] = (0.0, 1.0)
    nan_substitution: float = 0.0

    def _normalize(self, arr, min=None, max=None, missing_indicator=None):  # noqa: A002
        return minmax_normalize(
            arr,
            min=min,
            max=max,
            missing_indicator=missing_indicator,
            feature_range=self.feature_range,
            eps=self.eps,
            nan_substitution=self.nan_substitution,
        )

    def _denormalize(self, arr, min, max):  # noqa: A002
        return minmax_denormalize(arr, min=min, max=max, feature_range=self.feature_range, eps=self.eps)


@dataclasses.dataclass
class StandardScaler(Scaler):
    mean: float = 0.0
    std: float = 1.0
    eps: float = 1e-8
    missing_indicator: Optional[float] = None
    nan_substitution: Optional[float] = None

    def _normalize(self, arr, missing_indicator=None):
        # Per-call override, mirroring MinMaxScaler. The reference's
        # StandardScaler._normalize takes no such argument, which makes its
        # GeoTIFF inference dataset crash with a TypeError in standardize mode
        # (geo_tiff_inference_dataset.py:79-81 passes missing_indicator
        # unconditionally); we accept it so both modes treat elevation voids
        # (-32768) as missing instead of ~-100-sigma outliers.
        return zscore_normalize(
            arr,
            mean=self.mean,
            std=self.std,
            eps=self.eps,
            missing_indicator=self.missing_indicator if missing_indicator is None else missing_indicator,
            nan_substitution=self.nan_substitution,
        )

    def _denormalize(self, arr):
        return zscore_denormalize(arr, mean=self.mean, std=self.std)
