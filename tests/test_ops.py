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


def test_fused_upsample_conv_exact(rng):
    import jax
    import jax.numpy as jnp

    from climsr_tpu.ops.fused_upsample_conv import nearest_up2_conv3
    from climsr_tpu.ops.resize import nearest_upsample

    x = jnp.asarray(rng.normal(size=(2, 9, 7, 5)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 5, 6)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    dn = jax.lax.conv_dimension_numbers((2, 18, 14, 5), w.shape, ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(nearest_upsample(x, 2), w, (1, 1), "SAME", dimension_numbers=dn) + b
    got = nearest_up2_conv3(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_esrgan_fused_upsample_checkpoint_interchange(rng):
    import jax
    import jax.numpy as jnp
    import jax.tree_util as tu

    from climsr_tpu.models import create_generator

    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 3)).astype(np.float32))
    e = jnp.zeros((1, 32, 32, 1))
    m = jnp.ones((1, 32, 32, 1))
    naive = create_generator("esrgan", nf=16, nb=1, gc=8, out_channels=1, fused_upsample=False)
    fused = create_generator("esrgan", nf=16, nb=1, gc=8, out_channels=1, fused_upsample=True)
    v = naive.init(key, x, e, m)
    paths_naive = {tu.keystr(p) for p, _ in tu.tree_flatten_with_path(v["params"])[0]}
    paths_fused = {tu.keystr(p) for p, _ in tu.tree_flatten_with_path(fused.init(key, x, e, m)["params"])[0]}
    assert paths_naive == paths_fused
    np.testing.assert_allclose(
        np.asarray(fused.apply(v, x, e, m)), np.asarray(naive.apply(v, x, e, m)), atol=1e-4
    )


def test_nearest_up2_conv3_t_matches_nhwc_variant(rng):
    import jax.numpy as jnp

    from climsr_tpu.ops.fused_upsample_conv import nearest_up2_conv3, nearest_up2_conv3_t

    x = jnp.asarray(rng.normal(size=(2, 6, 10, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 4)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(4,)).astype(np.float32) * 0.1)
    want = nearest_up2_conv3(x, k, b)  # (N, 2H, 2W, F)
    got_t = nearest_up2_conv3_t(x, k, b)  # (F, N*2H*2W)
    got = jnp.transpose(got_t.reshape(4, 2, 12, 20), (1, 2, 3, 0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
