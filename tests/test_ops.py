# -*- coding: utf-8 -*-
"""Resize/pixel-shuffle parity tests against cv2 and torch references."""
import cv2
import numpy as np
import torch

from climsr_tpu.ops import (
    nearest_downsample,
    nearest_upsample,
    pixel_shuffle,
    pixel_unshuffle,
    resize_nearest,
)


def test_nearest_downsample_matches_cv2(rng):
    img = rng.normal(size=(128, 128)).astype(np.float32)
    want = cv2.resize(img, (32, 32), interpolation=cv2.INTER_NEAREST)
    got = np.asarray(nearest_downsample(img, 4))
    np.testing.assert_array_equal(got, want)


def test_nearest_upsample_matches_cv2(rng):
    img = rng.normal(size=(32, 32)).astype(np.float32)
    want = cv2.resize(img, (128, 128), interpolation=cv2.INTER_NEAREST)
    got = np.asarray(nearest_upsample(img, 4))
    np.testing.assert_array_equal(got, want)


def test_resize_nearest_general_matches_cv2(rng):
    img = rng.normal(size=(113, 113)).astype(np.float32)
    want = cv2.resize(img, (452, 452), interpolation=cv2.INTER_NEAREST)
    got = np.asarray(resize_nearest(img, 452, 452))
    np.testing.assert_array_equal(got, want)


def test_nearest_ops_nhwc_batch(rng):
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    up = np.asarray(nearest_upsample(x, 2))
    assert up.shape == (2, 16, 16, 3)
    down = np.asarray(nearest_downsample(up, 2))
    np.testing.assert_array_equal(down, x)


def test_pixel_shuffle_matches_torch(rng):
    n, h, w, c, r = 2, 4, 5, 8, 2
    x = rng.normal(size=(n, h, w, c)).astype(np.float32)
    got = np.asarray(pixel_shuffle(x, r))
    want = torch.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), r).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(got, want)


def test_pixel_unshuffle_inverts(rng):
    x = rng.normal(size=(2, 6, 6, 4)).astype(np.float32)
    y = pixel_unshuffle(pixel_shuffle(x, 2), 2)
    np.testing.assert_array_equal(np.asarray(y), x)
