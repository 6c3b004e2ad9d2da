# -*- coding: utf-8 -*-
"""GeoTIFF / NetCDF codec round-trip tests."""
import numpy as np
import pytest
from PIL import Image

from climsr_tpu.io.geotiff import GeoProfile, read_geotiff, read_raster, write_geotiff
from climsr_tpu.io.netcdf import ClimateSeries, read_climate_series, write_climate_series


def test_geotiff_float32_roundtrip(tmp_path, rng):
    arr = rng.normal(size=(64, 48)).astype(np.float32)
    arr[0, 0] = np.nan
    fp = tmp_path / "t.tif"
    write_geotiff(fp, arr, GeoProfile.global_grid(64, 48))
    back, profile = read_geotiff(fp)
    np.testing.assert_array_equal(back, arr)
    assert profile.width == 48 and profile.height == 64
    assert profile.origin_x == -180.0 and profile.origin_y == 90.0
    assert np.isnan(profile.nodata)


def test_geotiff_readable_by_pil(tmp_path, rng):
    # interop check: PIL (another TIFF reader) decodes our output identically
    arr = rng.normal(size=(32, 32)).astype(np.float32)
    fp = tmp_path / "t.tif"
    write_geotiff(fp, arr)
    with Image.open(fp) as img:
        via_pil = np.array(img)
    np.testing.assert_array_equal(via_pil, arr)


def test_geotiff_reads_pil_written(tmp_path, rng):
    # and we decode PIL-written float32 TIFFs
    arr = rng.normal(size=(20, 30)).astype(np.float32)
    fp = tmp_path / "pil.tif"
    Image.fromarray(arr).save(fp)
    back = read_raster(fp)
    np.testing.assert_array_equal(back, arr)


def test_geotiff_uint8(tmp_path, rng):
    arr = rng.integers(0, 255, size=(16, 16)).astype(np.uint8)
    fp = tmp_path / "u8.tif"
    write_geotiff(fp, arr, GeoProfile(width=16, height=16, nodata=None))
    back = read_raster(fp)
    np.testing.assert_array_equal(back, arr)


def test_geotiff_geo_profile_custom(tmp_path):
    arr = np.zeros((10, 20), np.float32)
    p = GeoProfile(width=20, height=10, origin_x=-16.0, origin_y=84.5, pixel_size_x=0.125, pixel_size_y=0.125, nodata=-9.0)
    fp = tmp_path / "eu.tif"
    write_geotiff(fp, arr, p)
    _, back = read_geotiff(fp)
    assert back.origin_x == -16.0 and back.origin_y == 84.5
    assert back.pixel_size_x == 0.125
    assert back.nodata == -9.0


def test_netcdf_roundtrip(tmp_path, rng):
    data = rng.normal(size=(4, 36, 72)).astype(np.float32)
    data[0, 0, 0] = np.nan
    time = np.array(["1901-01-16", "1901-02-16", "1901-03-16", "1901-04-16"], dtype="datetime64[D]")
    lat = np.linspace(-89.75, 89.75, 36)
    lon = np.linspace(-179.75, 179.75, 72)
    series = ClimateSeries(variable="tmp", data=data, time=time, lat=lat, lon=lon)
    fp = tmp_path / "x.nc"
    write_climate_series(fp, series, title="CRU TS4.05 Average Temperature")
    back = read_climate_series(fp, "tmp")
    assert back.data.shape == data.shape
    assert np.isnan(back.data[0, 0, 0])
    valid = ~np.isnan(data)
    np.testing.assert_allclose(back.data[valid], data[valid], rtol=1e-6)
    np.testing.assert_array_equal(back.time, time)
    np.testing.assert_allclose(back.lat, lat)


def test_netcdf_bad_variable(tmp_path, rng):
    series = ClimateSeries(
        variable="pre",
        data=rng.normal(size=(1, 4, 4)).astype(np.float32),
        time=np.array(["2000-01-01"], dtype="datetime64[D]"),
        lat=np.arange(4.0),
        lon=np.arange(4.0),
    )
    fp = tmp_path / "p.nc"
    write_climate_series(fp, series)
    with pytest.raises(KeyError):
        read_climate_series(fp, "tmp")


# --- TIFF predictor-2 regression fixtures (hand-rolled minimal TIFFs) -------
# GDAL-produced int16 rasters (WorldClim elevation) commonly ship with
# predictor=2 horizontal differencing; reference behavior is rasterio's
# (libtiff) decode. Differencing resets at each row of each chunk, so tiled
# files must be un-differenced per tile — regression for a bug where one
# whole-image cumsum corrupted every pixel right of the first tile column.
import struct as _struct


def _pred2_encode_rows(chunk: np.ndarray) -> bytes:
    enc = chunk.astype(np.int64)
    enc = np.concatenate([enc[:, :1], np.diff(enc, axis=1)], axis=1)
    return enc.astype("<i2").tobytes()


def _write_tiff_i16_pred2(fp, arr: np.ndarray, tile: int = 0) -> None:
    """Minimal little-endian TIFF: int16, uncompressed, predictor=2.

    tile=0 writes one strip per row; tile>0 writes tile×tile tiles.
    """
    h, w = arr.shape
    entries = []  # (tag, type, count, value) -- type 3=SHORT 4=LONG
    chunks = []
    if tile:
        th = tw = tile
        for ty in range(0, h, th):
            for tx in range(0, w, tw):
                block = np.zeros((th, tw), np.int64)
                sub = arr[ty : ty + th, tx : tx + tw]
                block[: sub.shape[0], : sub.shape[1]] = sub
                chunks.append(_pred2_encode_rows(block))
    else:
        chunks = [_pred2_encode_rows(arr[y : y + 1]) for y in range(h)]

    n = len(chunks)
    header = 8
    data_off = header
    offsets = []
    for c in chunks:
        offsets.append(data_off)
        data_off += len(c)
    # offset arrays (LONG) live after pixel data when n > 1
    extra = b""
    off_array_pos = data_off
    if n > 1:
        extra += b"".join(_struct.pack("<I", o) for o in offsets)
        counts_pos = off_array_pos + 4 * n
        extra += b"".join(_struct.pack("<I", len(c)) for c in chunks)
        ifd_off = counts_pos + 4 * n
    else:
        ifd_off = data_off

    def tag(tid, typ, count, value):
        entries.append(_struct.pack("<HHI", tid, typ, count) + _struct.pack("<I", value))

    tag(256, 4, 1, w)
    tag(257, 4, 1, h)
    tag(258, 3, 1, 16)
    tag(259, 3, 1, 1)  # uncompressed
    tag(277, 3, 1, 1)  # samples per pixel
    if not tile:
        tag(278, 4, 1, 1)  # rows per strip
    if tile:
        tag(322, 4, 1, tile)
        tag(323, 4, 1, tile)
        tag(324, 4, n, offsets[0] if n == 1 else off_array_pos)
        tag(325, 4, n, len(chunks[0]) if n == 1 else off_array_pos + 4 * n)
    else:
        tag(273, 4, n, offsets[0] if n == 1 else off_array_pos)
        tag(279, 4, n, len(chunks[0]) if n == 1 else off_array_pos + 4 * n)
    tag(317, 3, 1, 2)  # predictor = horizontal differencing
    tag(339, 3, 1, 2)  # sample format = signed int
    entries.sort(key=lambda e: _struct.unpack("<H", e[:2])[0])

    ifd = _struct.pack("<H", len(entries)) + b"".join(entries) + _struct.pack("<I", 0)
    with open(fp, "wb") as f:
        f.write(b"II" + _struct.pack("<HI", 42, ifd_off))
        for c in chunks:
            f.write(c)
        f.write(extra)
        f.write(ifd)


def _pred3_encode_rows(chunk: np.ndarray) -> bytes:
    """TIFF TechNote 3 float predictor encode (the inverse of the decoder):
    per row, big-endian sample bytes split into MSB-first byte planes, then
    horizontal byte differencing. This is what GDAL writes for float32
    PREDICTOR=3 DEFLATE GeoTIFFs."""
    rows, cols = chunk.shape
    be = np.ascontiguousarray(chunk.astype(">f4")).view(np.uint8).reshape(rows, cols, 4)
    planes = be.transpose(0, 2, 1).reshape(rows, 4 * cols).astype(np.int16)
    diff = np.concatenate([planes[:, :1], np.diff(planes, axis=1)], axis=1)
    return (diff & 0xFF).astype(np.uint8).tobytes()


def _write_tiff_f32_pred3(fp, arr: np.ndarray, tile: int = 0, rows_per_strip: int = 4) -> None:
    """Minimal little-endian TIFF: float32, DEFLATE, predictor=3."""
    import zlib as _zlib

    h, w = arr.shape
    entries = []
    chunks = []
    if tile:
        th = tw = tile
        for ty in range(0, h, th):
            for tx in range(0, w, tw):
                block = np.zeros((th, tw), np.float32)
                sub = arr[ty : ty + th, tx : tx + tw]
                block[: sub.shape[0], : sub.shape[1]] = sub
                chunks.append(_zlib.compress(_pred3_encode_rows(block)))
    else:
        chunks = [
            _zlib.compress(_pred3_encode_rows(arr[y : y + rows_per_strip]))
            for y in range(0, h, rows_per_strip)
        ]

    n = len(chunks)
    data_off = 8
    offsets = []
    for c in chunks:
        offsets.append(data_off)
        data_off += len(c)
    extra = b""
    off_array_pos = data_off
    if n > 1:
        extra += b"".join(_struct.pack("<I", o) for o in offsets)
        extra += b"".join(_struct.pack("<I", len(c)) for c in chunks)
        ifd_off = off_array_pos + 8 * n
    else:
        ifd_off = data_off

    def tag(tid, typ, count, value):
        entries.append(_struct.pack("<HHI", tid, typ, count) + _struct.pack("<I", value))

    tag(256, 4, 1, w)
    tag(257, 4, 1, h)
    tag(258, 3, 1, 32)
    tag(259, 3, 1, 8)  # deflate
    tag(277, 3, 1, 1)
    if tile:
        tag(322, 4, 1, tile)
        tag(323, 4, 1, tile)
        tag(324, 4, n, offsets[0] if n == 1 else off_array_pos)
        tag(325, 4, n, len(chunks[0]) if n == 1 else off_array_pos + 4 * n)
    else:
        tag(278, 4, 1, rows_per_strip)
        tag(273, 4, n, offsets[0] if n == 1 else off_array_pos)
        tag(279, 4, n, len(chunks[0]) if n == 1 else off_array_pos + 4 * n)
    tag(317, 3, 1, 3)  # predictor = floating point
    tag(339, 3, 1, 3)  # sample format = IEEE float
    entries.sort(key=lambda e: _struct.unpack("<H", e[:2])[0])

    ifd = _struct.pack("<H", len(entries)) + b"".join(entries) + _struct.pack("<I", 0)
    with open(fp, "wb") as f:
        f.write(b"II" + _struct.pack("<HI", 42, ifd_off))
        for c in chunks:
            f.write(c)
        f.write(extra)
        f.write(ifd)


def test_geotiff_predictor3_strips(tmp_path, rng):
    arr = (rng.standard_normal((33, 48)) * 40).astype(np.float32)
    arr[0, :3] = [np.nan, np.inf, -0.0]  # exact byte-level roundtrip incl. specials
    fp = tmp_path / "p3_strips.tif"
    _write_tiff_f32_pred3(fp, arr, tile=0, rows_per_strip=4)
    back, _ = read_geotiff(fp)
    np.testing.assert_array_equal(back.view(np.uint32), arr.view(np.uint32))


def test_geotiff_predictor3_tiled(tmp_path, rng):
    arr = (rng.standard_normal((40, 56)) * 40).astype(np.float32)
    fp = tmp_path / "p3_tiled.tif"
    _write_tiff_f32_pred3(fp, arr, tile=16)
    back, _ = read_geotiff(fp)
    np.testing.assert_array_equal(back, arr)


def test_geotiff_predictor2_strips(tmp_path, rng):
    arr = rng.integers(-3000, 6000, size=(32, 48)).astype(np.int16)
    fp = tmp_path / "p2_strips.tif"
    _write_tiff_i16_pred2(fp, arr, tile=0)
    back, _ = read_geotiff(fp)
    np.testing.assert_array_equal(back, arr)


def test_geotiff_predictor2_tiled(tmp_path, rng):
    arr = rng.integers(-3000, 6000, size=(40, 56)).astype(np.int16)
    fp = tmp_path / "p2_tiled.tif"
    _write_tiff_i16_pred2(fp, arr, tile=16)
    back, _ = read_geotiff(fp)
    np.testing.assert_array_equal(back, arr)


def test_cf_time_non_zero_padded_origin():
    """CRU-TS 4.05 ships 'days since 1900-1-1' — np.datetime64 rejects
    non-ISO origins unless the decoder normalizes them."""
    import numpy as np

    from climsr_tpu.io.netcdf import _decode_cf_time

    t = _decode_cf_time(np.array([0.0, 31.0]), "days since 1900-1-1")
    assert str(t[0]) == "1900-01-01" and str(t[1]) == "1900-02-01"
    t2 = _decode_cf_time(np.array([1.0]), "months since 1901-1-16 00:00:00")
    assert str(t2[0]).startswith("1901-02")
    # ISO 'T'-separated time-of-day must truncate like the space form, not
    # blow up int() during zero-padding
    t3 = _decode_cf_time(np.array([0.0]), "days since 1900-01-01T00:00:00")
    assert str(t3[0]) == "1900-01-01"
