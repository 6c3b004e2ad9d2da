# -*- coding: utf-8 -*-
"""Native raster-IO core tests: parity with the Python codec + batch decode."""
import numpy as np
import pytest

from climsr_tpu.io.geotiff import GeoProfile, read_geotiff, write_geotiff
from climsr_tpu.native import (
    native_available,
    nearest_resize_native,
    read_raster_native,
    read_tiles_batch_native,
)

pytestmark = pytest.mark.skipif(not native_available(), reason="native build unavailable")


def test_native_read_matches_python(tmp_path, rng):
    arr = rng.normal(size=(64, 48)).astype(np.float32)
    arr[0, 0] = np.nan
    fp = tmp_path / "t.tif"
    write_geotiff(fp, arr, GeoProfile.global_grid(64, 48))
    got = read_raster_native(fp)
    assert got is not None
    np.testing.assert_array_equal(got, arr)


def test_native_read_uint8(tmp_path, rng):
    arr = rng.integers(0, 255, size=(16, 16)).astype(np.uint8)
    fp = tmp_path / "u8.tif"
    write_geotiff(fp, arr, GeoProfile(width=16, height=16, nodata=None))
    got = read_raster_native(fp)
    np.testing.assert_array_equal(got, arr.astype(np.float32))


def test_native_rejects_unknown_returns_none(tmp_path):
    fp = tmp_path / "not_a.tif"
    fp.write_bytes(b"garbage data here")
    assert read_raster_native(fp) is None


def test_native_resize_matches_cv2(rng):
    import cv2

    img = rng.normal(size=(128, 128)).astype(np.float32)
    want = cv2.resize(img, (32, 32), interpolation=cv2.INTER_NEAREST)
    got = nearest_resize_native(img, 32, 32)
    np.testing.assert_array_equal(got, want)
    up_want = cv2.resize(img, (256, 256), interpolation=cv2.INTER_NEAREST)
    up_got = nearest_resize_native(img, 256, 256)
    np.testing.assert_array_equal(up_got, up_want)


def test_native_batch_decode(tmp_path, rng):
    paths = []
    arrays = []
    for i in range(10):
        arr = rng.normal(size=(32, 32)).astype(np.float32)
        fp = tmp_path / f"tile{i}.tif"
        write_geotiff(fp, arr)
        paths.append(str(fp))
        arrays.append(arr)
    paths.append(str(tmp_path / "missing.tif"))
    tiles, status = read_tiles_batch_native(paths, 32, 32, n_threads=4)
    assert status[:10].sum() == 0
    assert status[10] != 0  # missing file flagged, not crashed
    for i in range(10):
        np.testing.assert_array_equal(tiles[i], arrays[i])


def test_native_predictor2_strip_decode(tmp_path, rng):
    """Native decoder must un-difference predictor-2 int16 strip files (or
    refuse), never return raw deltas as pixels (regression: tag 317 ignored)."""
    from test_io import _write_tiff_i16_pred2  # tests/ dir is on sys.path under pytest

    arr = rng.integers(-3000, 6000, size=(24, 32)).astype(np.int16)
    fp = tmp_path / "p2.tif"
    _write_tiff_i16_pred2(fp, arr, tile=0)
    got = read_raster_native(fp)
    if got is not None:  # decoded natively -> must be un-differenced
        np.testing.assert_array_equal(got, arr.astype(np.float32))
    # either way the full read path must be correct
    back, _ = read_geotiff(fp)
    np.testing.assert_array_equal(back, arr)
