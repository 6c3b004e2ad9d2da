# -*- coding: utf-8 -*-
"""Scaler parity tests mirroring reference MinMaxScaler/StandardScaler semantics."""
import jax.numpy as jnp
import numpy as np
import pytest

from climsr_tpu.data.normalization import (
    MinMaxScaler,
    StandardScaler,
    minmax_denormalize,
    minmax_normalize,
    zscore_denormalize,
    zscore_normalize,
)


def test_minmax_roundtrip_scalar_stats(rng):
    arr = rng.normal(10.0, 5.0, size=(16, 16)).astype(np.float32)
    s = MinMaxScaler(feature_range=(-1.0, 1.0))
    norm = s.normalize(arr, min=arr.min(), max=arr.max())
    assert norm.dtype == np.float32
    assert norm.min() >= -1.0 - 1e-5 and norm.max() <= 1.0 + 1e-5
    denorm = s.denormalize(norm, min=arr.min(), max=arr.max())
    np.testing.assert_allclose(denorm, arr, rtol=1e-4, atol=1e-3)


def test_minmax_auto_range_and_nan_substitution(rng):
    arr = rng.normal(0.0, 1.0, size=(8, 8)).astype(np.float32)
    arr[0, 0] = np.nan
    s = MinMaxScaler(feature_range=(0.0, 1.0))
    norm = s.normalize(arr)
    assert np.isfinite(norm).all()
    assert norm[0, 0] == 0.0  # NaN -> nan_substitution


def test_minmax_missing_indicator():
    arr = np.array([[1.0, 2.0], [9.0, 3.0]], dtype=np.float32)
    s = MinMaxScaler(feature_range=(0.0, 1.0))
    norm = s.normalize(arr, missing_indicator=9.0)
    # min=1, max=3 after indicator removal; indicator cell -> 0.0
    assert norm[1, 0] == 0.0
    np.testing.assert_allclose(norm[0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(norm[1, 1], 1.0, rtol=1e-6)


def test_minmax_per_sample_denormalize_batch():
    # Per-sample min/max vectors broadcast over (B, H, W, C) like the
    # reference's permute trick (normalization.py:80-82).
    batch = np.stack(
        [np.full((4, 4, 1), 0.0, np.float32), np.full((4, 4, 1), 1.0, np.float32)]
    )
    mins = np.array([-10.0, 0.0], dtype=np.float32)
    maxs = np.array([10.0, 50.0], dtype=np.float32)
    denorm = minmax_denormalize(batch, mins, maxs, feature_range=(0.0, 1.0))
    np.testing.assert_allclose(denorm[0], -10.0, atol=1e-4)
    np.testing.assert_allclose(denorm[1], 50.0, atol=1e-3)


def test_minmax_jnp_matches_numpy(rng):
    arr = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    mins = np.array([-1.0, -2.0], np.float32)
    maxs = np.array([3.0, 4.0], np.float32)
    a = minmax_normalize(arr, mins, maxs, feature_range=(-1, 1))
    b = minmax_normalize(jnp.asarray(arr), jnp.asarray(mins), jnp.asarray(maxs), feature_range=(-1, 1))
    np.testing.assert_allclose(np.asarray(b), a, rtol=1e-6)


def test_zscore_roundtrip(rng):
    arr = rng.normal(7.0, 3.0, size=(16, 16)).astype(np.float32)
    s = StandardScaler(mean=7.0, std=3.0)
    norm = s.normalize(arr)
    # denormalize has no eps (reference asymmetry) -> tiny residual only
    denorm = s.denormalize(norm)
    np.testing.assert_allclose(denorm, arr, rtol=1e-4, atol=1e-4)


def test_zscore_missing_indicator_and_nan_sub():
    arr = np.array([[-32768.0, 3.0]], dtype=np.float32)
    norm = zscore_normalize(arr, mean=1.0, std=2.0, missing_indicator=-32768.0, nan_substitution=-5.0)
    assert norm[0, 0] == -5.0
    np.testing.assert_allclose(norm[0, 1], (3.0 - 1.0) / (2.0 + 1e-8), rtol=1e-6)


def test_zscore_denormalize_no_eps():
    np.testing.assert_allclose(zscore_denormalize(np.float32(2.0), mean=1.0, std=3.0), 7.0)


@pytest.mark.parametrize("feature_range", [(0.0, 1.0), (-1.0, 1.0)])
def test_minmax_feature_range_endpoints(feature_range):
    arr = np.array([[0.0, 10.0]], dtype=np.float32)
    norm = minmax_normalize(arr, 0.0, 10.0, feature_range=feature_range)
    np.testing.assert_allclose(norm[0, 0], feature_range[0], atol=1e-6)
    np.testing.assert_allclose(norm[0, 1], feature_range[1], rtol=1e-5)
