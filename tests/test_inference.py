# -*- coding: utf-8 -*-
"""Inference pipeline tests: tiled SR blending, whole-series CRU-TS flow, NetCDF export."""
import numpy as np
import pytest

import jax.numpy as jnp

import climsr_tpu.consts as consts
from climsr_tpu.inference.tiled import TiledSR, pad_to_multiple, whole_frame_sr
from climsr_tpu.io.geotiff import GeoProfile, read_geotiff, write_geotiff
from climsr_tpu.io.netcdf import ClimateSeries, read_climate_series, write_climate_series


def _upsample_fn(scale=4):
    # stand-in 'generator': nearest upsample, so tiled output is exactly checkable
    from climsr_tpu.ops.resize import nearest_upsample

    def fn(lr, *extras):
        return nearest_upsample(lr[..., :1], scale)

    return fn


def test_pad_to_multiple_reflect():
    frame = np.arange(30, dtype=np.float32).reshape(5, 6, 1)
    padded, (h, w) = pad_to_multiple(frame, 4)
    assert padded.shape == (8, 8, 1)
    assert (h, w) == (5, 6)


def test_tiled_sr_matches_direct_for_translation_invariant_fn(rng):
    frame = rng.normal(size=(96, 96, 1)).astype(np.float32)
    tiler = TiledSR(_upsample_fn(), scale=4, tile_size=32, overlap=8, batch_size=4, compute_dtype=jnp.float32)
    out = tiler(frame)
    want = np.repeat(np.repeat(frame, 4, axis=0), 4, axis=1)
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_tiled_sr_nonmultiple_frame(rng):
    frame = rng.normal(size=(90, 113, 1)).astype(np.float32)
    tiler = TiledSR(_upsample_fn(), scale=4, tile_size=32, overlap=8, batch_size=4, compute_dtype=jnp.float32)
    out = tiler(frame)
    # covers the original extent exactly in the top-left corner
    want = np.repeat(np.repeat(frame, 4, axis=0), 4, axis=1)
    np.testing.assert_allclose(out[: 90 * 4, : 113 * 4], want, atol=1e-5)


def test_tiled_overlap_validation():
    with pytest.raises(ValueError):
        TiledSR(_upsample_fn(), scale=4, tile_size=32, overlap=16)


def test_whole_frame_sr_batching(rng):
    frames = rng.normal(size=(5, 16, 16, 1)).astype(np.float32)
    out = whole_frame_sr(_upsample_fn(), frames, batch_size=2, compute_dtype=jnp.float32)
    assert out.shape == (5, 64, 64, 1)
    np.testing.assert_allclose(out[4], np.repeat(np.repeat(frames[4], 4, 0), 4, 1), atol=1e-5)


@pytest.fixture()
def cruts_fixture(tmp_path, rng):
    """Mini CRU-TS world: NetCDF series + elevation + land-mask GeoTIFFs."""
    h, w, scale, months = 24, 48, 4, 5
    hr_h, hr_w = h * scale, w * scale
    data = rng.normal(10, 5, size=(months, h, w)).astype(np.float32)
    data[:, :4, :] = np.nan  # ocean strip
    time = np.array([f"1901-{m:02d}-16" for m in range(1, months + 1)], dtype="datetime64[D]")
    lat = np.linspace(-89, 89, h)
    lon = np.linspace(-179, 179, w)
    nc_path = tmp_path / "cru_ts4.05.1901.2020.tmp.dat.nc"
    write_climate_series(nc_path, ClimateSeries("tmp", data, time, lat, lon))

    mask_hr = np.ones((hr_h, hr_w), np.float32)
    mask_hr[: 4 * scale, :] = np.nan  # ocean at HR
    mask_path = tmp_path / "land_mask.tif"
    write_geotiff(mask_path, mask_hr, GeoProfile.global_grid(hr_h, hr_w))

    elev = rng.normal(500, 300, size=(hr_h, hr_w)).astype(np.float32)
    elev_path = tmp_path / "elevation.tif"
    write_geotiff(elev_path, elev, GeoProfile.global_grid(hr_h, hr_w, nodata=None))
    return dict(tmp_path=tmp_path, nc=nc_path, mask=mask_path, elev=elev_path, months=months, hw=(h, w), scale=scale)


def test_cruts_inference_dataset_channels(cruts_fixture):
    from climsr_tpu.inference.datasets import CRUTSInferenceDataset

    ds = CRUTSInferenceDataset(
        ds_path=str(cruts_fixture["nc"]),
        elevation_file=str(cruts_fixture["elev"]),
        land_mask_file=str(cruts_fixture["mask"]),
        generator_type="esrgan",
        scaling_factor=4,
    )
    assert len(ds) == cruts_fixture["months"]
    item = ds[0]
    h, w = cruts_fixture["hw"]
    assert item[consts.batch_items.lr].shape == (h, w, 3)  # data + elev_lr + mask_lr
    assert item[consts.batch_items.elevation].shape == (h * 4, w * 4, 1)
    assert item[consts.batch_items.filename].startswith("cruts-tmp-1901-01")
    assert np.isfinite(item[consts.batch_items.lr]).all()


def test_cruts_elevation_voids_treated_as_missing(cruts_fixture, rng):
    """SRTM void pixels (-32768) in the CRU-TS elevation raster are missing
    data: without the missing-indicator the minmax auto-range collapses to
    vmin=-32768 and every real elevation lands at the top of the range."""
    from climsr_tpu.inference.datasets import CRUTSInferenceDataset

    h, w = cruts_fixture["hw"]
    scale = cruts_fixture["scale"]
    hr_h, hr_w = h * scale, w * scale
    elev = rng.normal(500, 300, size=(hr_h, hr_w)).astype(np.float32)
    void_yx = (40, 40)  # on land (ocean strip is the first 16 HR rows)
    elev[void_yx] = consts.world_clim.elevation_missing_indicator
    write_geotiff(cruts_fixture["elev"], elev, GeoProfile.global_grid(hr_h, hr_w, nodata=None))

    ds = CRUTSInferenceDataset(
        ds_path=str(cruts_fixture["nc"]),
        elevation_file=str(cruts_fixture["elev"]),
        land_mask_file=str(cruts_fixture["mask"]),
        generator_type="esrgan",
        scaling_factor=scale,
    )
    e = np.asarray(ds.elevation_data)[..., 0]
    assert np.isfinite(e).all()
    assert e[void_yx] == 0.0  # void -> NaN -> substitution, not a data value
    land = np.zeros((hr_h, hr_w), bool)
    land[4 * scale:, :] = True
    land[void_yx] = False
    # the real elevations still span the normalize range instead of being
    # squashed against +1 by a -32768 vmin
    assert e[land].min() < -0.9 and e[land].max() > 0.9


def test_full_inference_flow_writes_geotiffs_and_netcdf(cruts_fixture, rng):
    import jax

    from climsr_tpu.inference.datasets import CRUTSInferenceDataset
    from climsr_tpu.inference.run import inference_on_full_images, transform_tiff_files_to_net_cdf
    from climsr_tpu.models import create_generator

    ds = CRUTSInferenceDataset(
        ds_path=str(cruts_fixture["nc"]),
        elevation_file=str(cruts_fixture["elev"]),
        land_mask_file=str(cruts_fixture["mask"]),
        generator_type="esrgan",
        scaling_factor=4,
    )
    model = create_generator("esrgan", nf=8, nb=1, gc=4, out_channels=1, dtype=jnp.float32)
    item = ds[0]
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1,) + item[consts.batch_items.lr].shape),
        jnp.zeros((1,) + item[consts.batch_items.elevation].shape),
        jnp.zeros((1,) + item[consts.batch_items.mask].shape),
    )["params"]

    out_dir = cruts_fixture["tmp_path"] / "sr" / "tmp"
    written = inference_on_full_images(model, params, ds, str(out_dir), "esrgan", batch_size=2)
    assert len(written) == cruts_fixture["months"]

    arr, profile = read_geotiff(written[0])
    h, w = cruts_fixture["hw"]
    assert arr.shape == (h * 4, w * 4)
    assert np.isnan(arr[:2, :]).all()  # ocean masked to NaN
    assert np.isfinite(arr[-10:, :]).all()

    nc_out = cruts_fixture["tmp_path"] / "nc"
    transform_tiff_files_to_net_cdf(str(cruts_fixture["tmp_path"] / "sr"), str(nc_out), ["tmp"], prefix="esrgan")
    out_files = list(nc_out.glob("*.nc"))
    assert len(out_files) == 1
    back = read_climate_series(out_files[0], "tmp")
    assert back.data.shape == (cruts_fixture["months"], h * 4, w * 4)


def test_result_inspection_compare(cruts_fixture):
    from dataclasses import replace

    from climsr_tpu.result_inspection.models import CompareStatsResults

    nn = read_climate_series(cruts_fixture["nc"], "tmp")
    results = CompareStatsResults.compute(nn, nn, lats=[0.0, 45.0], lons=[0.0, 90.0])
    assert results.mae == 0.0 and results.rmse == 0.0
    frame = results.to_frame()
    assert len(frame) == 2

    # non-identical pair with a KNOWN error: a constant +2 offset must give
    # mae == rmse == 2 exactly (an always-zero or self-comparing compute fails)
    shifted = replace(nn, data=nn.data + 2.0)
    res2 = CompareStatsResults.compute(shifted, nn, lats=[0.0, 45.0], lons=[0.0, 90.0])
    np.testing.assert_allclose(res2.mae, 2.0, rtol=1e-6)
    np.testing.assert_allclose(res2.rmse, 2.0, rtol=1e-6)
    np.testing.assert_allclose(res2.mse, 4.0, rtol=1e-6)


@pytest.fixture()
def europe_fixture(tmp_path, rng):
    """Europe-extent world: LR GeoTIFF dir + stats table + HR elevation/mask."""
    import pandas as pd

    import climsr_tpu.consts as consts

    D = consts.datasets_and_preprocessing
    S = consts.stats
    hr, scale = 64, 4
    lr = hr // scale
    rows = []
    tiff_dir = tmp_path / "tiffs"
    for m in range(3):
        arr = rng.normal(10, 5, size=(lr, lr)).astype(np.float32)
        name = f"cruts-tmp-1901-{m + 1:02d}-16.tif"
        write_geotiff(tiff_dir / name, arr, GeoProfile.global_grid(lr, lr))
        rows.append({D.filename: name, S.min: float(arr.min()), S.max: float(arr.max()),
                     S.global_min: -20.0, S.global_max: 40.0})
    mask = np.ones((hr, hr), np.float32)
    mask[:8] = np.nan
    write_geotiff(tmp_path / "mask.tif", mask, GeoProfile.global_grid(hr, hr))
    write_geotiff(tmp_path / "elev.tif", rng.normal(500, 100, (hr, hr)).astype(np.float32),
                  GeoProfile.global_grid(hr, hr, nodata=None))
    return dict(tmp_path=tmp_path, tiff_dir=tiff_dir, df=pd.DataFrame(rows), hr=hr, lr=lr)


def test_geotiff_inference_dataset_and_flow(europe_fixture, rng):
    import jax

    from climsr_tpu.inference.datasets import GeoTiffInferenceDataset
    from climsr_tpu.inference.run import inference_on_full_images
    from climsr_tpu.models import create_generator

    fx = europe_fixture
    ds = GeoTiffInferenceDataset(
        tiff_dir=str(fx["tiff_dir"]),
        tiff_df=fx["df"],
        variable="tmp",
        elevation_file=str(fx["tmp_path"] / "elev.tif"),
        land_mask_file=str(fx["tmp_path"] / "mask.tif"),
        generator_type="esrgan",
        hr_size=fx["hr"],
        use_global_min_max=True,
    )
    assert len(ds) == 3
    item = ds[0]
    assert item["lr"].shape == (fx["lr"], fx["lr"], 3)
    assert float(item["min"]) == -20.0  # global min/max from the stats table

    model = create_generator("esrgan", nf=8, nb=1, gc=4, out_channels=1)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, fx["lr"], fx["lr"], 3), np.float32),
        np.zeros((1, fx["hr"], fx["hr"], 1), np.float32),
        np.zeros((1, fx["hr"], fx["hr"], 1), np.float32),
    )["params"]
    out_dir = fx["tmp_path"] / "sr_out"
    written = inference_on_full_images(model, params, ds, str(out_dir), "esrgan", batch_size=2)
    assert len(written) == 3
    arr, _ = read_geotiff(written[0])
    assert arr.shape == (fx["hr"], fx["hr"])
    assert np.isnan(arr[:8]).all()  # ocean masked


def test_geotiff_dataset_standardize_elevation_voids(europe_fixture, rng):
    """SRTM void pixels (-32768) on land must come out of z-score
    normalization as 0 (missing), not ~-330-sigma finite outliers that the
    NaN guard can't catch. (The reference crashes outright here: its
    StandardScaler._normalize takes no missing_indicator argument but the
    GeoTIFF dataset passes one unconditionally.)"""
    import pandas as pd

    import climsr_tpu.consts as consts
    from climsr_tpu.inference.datasets import GeoTiffInferenceDataset

    D = consts.datasets_and_preprocessing
    S = consts.stats
    fx = europe_fixture
    elev, prof = read_geotiff(fx["tmp_path"] / "elev.tif")
    elev[32, 32] = consts.world_clim.elevation_missing_indicator  # land void
    write_geotiff(fx["tmp_path"] / "elev.tif", elev, prof)
    stats = pd.DataFrame(
        [
            {D.variable: "tmp", S.mean: 10.0, S.std: 5.0},
            {D.variable: consts.world_clim.elev, S.mean: 500.0, S.std: 100.0},
        ]
    )
    ds = GeoTiffInferenceDataset(
        tiff_dir=str(fx["tiff_dir"]),
        tiff_df=fx["df"],
        variable="tmp",
        elevation_file=str(fx["tmp_path"] / "elev.tif"),
        land_mask_file=str(fx["tmp_path"] / "mask.tif"),
        generator_type="esrgan",
        hr_size=fx["hr"],
        normalize=False,
        standardize=True,
        standardize_stats=stats,
    )
    e = np.asarray(ds.elevation_data)
    assert np.isfinite(e).all()
    assert abs(float(e[32, 32, 0])) < 6.0, "void leaked through as a -330-sigma value"


def test_tiled_sr_with_extras_matches_whole_frame(rng):
    """Overlap-tiled SR with HR-space conditioning == whole-frame for a local fn."""
    from climsr_tpu.inference.tiled import TiledSR
    from climsr_tpu.ops.resize import nearest_upsample

    def fn(lr, elev, mask):
        return nearest_upsample(lr[..., :1], 4) + elev * 0.5

    frame = rng.normal(size=(64, 64, 1)).astype(np.float32)
    elev = rng.normal(size=(256, 256, 1)).astype(np.float32)
    mask = np.ones((256, 256, 1), np.float32)
    tiler = TiledSR(fn, scale=4, tile_size=32, overlap=8, batch_size=4, compute_dtype=jnp.float32)
    got = tiler(frame, extras=(elev, mask))
    want = np.repeat(np.repeat(frame, 4, 0), 4, 1) + elev * 0.5
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_tiled_sr_device_denorm_and_land_pack(rng):
    """The e2e sweep's fused path: post_fn denormalizes on device with
    per-frame scalars and pack_indices gathers only land pixels — the packed
    readback scattered into a NaN canvas must equal the legacy host path
    (full-frame readback, host denormalize, np.where ocean mask)."""
    import jax.numpy as jnp

    from climsr_tpu.data.normalization import MinMaxScaler
    from climsr_tpu.inference.tiled import TiledSR
    from climsr_tpu.ops.resize import nearest_upsample

    def fn(lr):
        return nearest_upsample(lr[..., :1], 4) * 0.5

    scaler = MinMaxScaler(feature_range=(-1.0, 1.0))
    frame = rng.uniform(-1, 1, size=(64, 96, 1)).astype(np.float32)
    mask = rng.uniform(size=(256, 384)) > 0.7  # ~30% land, like real CRU-TS
    land_idx = np.flatnonzero(mask.ravel()).astype(np.int32)
    vmin, vmax = -5.0, 40.0

    def post(out, args):
        return scaler.denormalize(out, args[0], args[1])

    packed = TiledSR(
        fn, scale=4, tile_size=32, overlap=8, batch_size=4,
        compute_dtype=jnp.float32, post_fn=post, pack_indices=land_idx,
    )
    vals = np.asarray(packed.device_call(frame, post_args=(vmin, vmax))).astype(np.float32)
    assert vals.shape == (land_idx.size,)
    got = np.full((256, 384), np.nan, np.float32)
    got.ravel()[land_idx] = vals

    legacy = TiledSR(fn, scale=4, tile_size=32, overlap=8, batch_size=4, compute_dtype=jnp.float32)
    arr = np.asarray(legacy(frame))[..., 0].astype(np.float32)
    want = np.where(mask, scaler.denormalize(arr, vmin, vmax), np.nan).astype(np.float32)

    np.testing.assert_allclose(got, want, atol=1e-4, equal_nan=True)

    # undersized frames must refuse pack (pre-padding would misalign the gather)
    with pytest.raises(ValueError, match="pack_indices"):
        packed.device_call(rng.normal(size=(16, 16, 1)).astype(np.float32))

    # __call__ promises a cropped frame, which pack mode cannot deliver
    with pytest.raises(ValueError, match="device_call"):
        packed(frame)


def test_pack12_roundtrip_error_bound(rng):
    """12-bit transport codec (ops/pack12.py): exact word layout inverts and
    the reconstruction error honors the documented bound on (-RANGE, RANGE);
    values beyond the range clamp to the range edge."""
    import jax.numpy as jnp

    from climsr_tpu.ops.pack12 import MAX_ABS_ERR, RANGE, pack12, packed_len, unpack12

    vals = rng.uniform(-1.2, 1.2, size=(3, 1001)).astype(np.float32)
    w = np.asarray(pack12(jnp.asarray(vals)))
    assert w.shape == (3, packed_len(1001)) and w.dtype == np.uint32
    got = unpack12(w, 1001)
    assert np.max(np.abs(got - vals)) <= MAX_ABS_ERR + 1e-7

    # overshoot clamps to the code range instead of wrapping
    wide = np.array([[-5.0, -RANGE, 0.0, RANGE, 5.0, 0.1, -0.1, 0.25]], np.float32)
    back = unpack12(np.asarray(pack12(jnp.asarray(wide))), 8)
    np.testing.assert_allclose(
        back[0], [-RANGE, -RANGE, 0.0, RANGE, RANGE, 0.1, -0.1, 0.25], atol=MAX_ABS_ERR + 1e-7
    )


def test_tiled_sr_pack12_readback_matches_f16_path(rng):
    """TiledSR(pack12=True) returns uint32 words whose unpacking matches the
    plain packed-land readback within the codec's error bound — the sweep's
    default D2H transport (25% fewer bytes than f16 on the tunnel)."""
    import jax.numpy as jnp

    from climsr_tpu.inference.tiled import TiledSR
    from climsr_tpu.ops.pack12 import MAX_ABS_ERR, packed_len, unpack12
    from climsr_tpu.ops.resize import nearest_upsample

    def fn(lr):
        return nearest_upsample(lr[..., :1], 4) * 0.5

    frames = rng.uniform(-1, 1, size=(3, 64, 96, 1)).astype(np.float32)
    mask = rng.uniform(size=(256, 384)) > 0.7
    land_idx = np.flatnonzero(mask.ravel()).astype(np.int32)

    mk = lambda **kw: TiledSR(  # noqa: E731
        fn, scale=4, tile_size=32, overlap=8, batch_size=4,
        compute_dtype=jnp.float32, pack_indices=land_idx, **kw
    )
    words = np.asarray(mk(pack12=True).device_call_many(frames))
    assert words.dtype == np.uint32 and words.shape == (3, packed_len(land_idx.size))
    plain = np.asarray(mk().device_call_many(frames)).astype(np.float32)
    np.testing.assert_allclose(unpack12(words, land_idx.size), plain, atol=MAX_ABS_ERR + 1e-3)

    with pytest.raises(ValueError, match="pack_indices"):
        TiledSR(fn, scale=4, tile_size=32, overlap=8, pack12=True)


def test_tiled_sr_grouped_dispatch_matches_per_frame(rng):
    """device_call_many on a frame group == per-frame device_call, incl. the
    packed-readback + device-denorm path (the grouped transport fast path the
    e2e sweep uses to amortize the per-dispatch round-trip)."""
    import jax.numpy as jnp

    from climsr_tpu.data.normalization import MinMaxScaler
    from climsr_tpu.inference.tiled import TiledSR
    from climsr_tpu.ops.resize import nearest_upsample

    def fn(lr):
        return nearest_upsample(lr[..., :1], 4) * 0.5

    scaler = MinMaxScaler(feature_range=(-1.0, 1.0))
    frames = rng.uniform(-1, 1, size=(5, 64, 96, 1)).astype(np.float32)
    mask = rng.uniform(size=(256, 384)) > 0.7
    land_idx = np.flatnonzero(mask.ravel()).astype(np.int32)

    def post(out, args):
        return scaler.denormalize(out, args[0], args[1])

    packed = TiledSR(
        fn, scale=4, tile_size=32, overlap=8, batch_size=4,
        compute_dtype=jnp.float32, post_fn=post, pack_indices=land_idx,
    )
    post_args = np.array([[-5.0 + i, 40.0 - i] for i in range(5)], np.float32)
    group = np.asarray(packed.device_call_many(frames, post_args=post_args))
    assert group.shape == (5, land_idx.size)
    for i in range(5):
        single = np.asarray(packed.device_call(frames[i], post_args=tuple(post_args[i])))
        np.testing.assert_allclose(group[i], single, atol=1e-5)


def test_tiled_sr_static_lr_channels(rng):
    """set_static_lr_channels: a 1-channel varying frame + device-resident
    invariant channels == shipping the full multi-channel frame."""
    import jax.numpy as jnp

    from climsr_tpu.inference.tiled import TiledSR
    from climsr_tpu.ops.resize import nearest_upsample

    def fn(lr):
        # consumes all 3 channels so a channel-order bug cannot hide
        return nearest_upsample(lr[..., :1] + 0.25 * lr[..., 1:2] - 0.125 * lr[..., 2:3], 4)

    frames = rng.normal(size=(3, 64, 96, 3)).astype(np.float32)
    static = rng.normal(size=(64, 96, 2)).astype(np.float32)
    frames[..., 1:] = static  # invariant trailing channels

    full = TiledSR(fn, scale=4, tile_size=32, overlap=8, batch_size=4, compute_dtype=jnp.float32)
    want = np.asarray(full.device_call_many(frames))

    slim = TiledSR(fn, scale=4, tile_size=32, overlap=8, batch_size=4, compute_dtype=jnp.float32)
    slim.set_static_lr_channels(static)
    got = np.asarray(slim.device_call_many(frames[..., :1]))
    np.testing.assert_allclose(got, want, atol=1e-5)

    with pytest.raises(ValueError, match="static LR channels"):
        slim.device_call_many(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))


def test_tiled_sr_undersized_frame_with_extras(rng):
    """A frame smaller than the tile gets reflect-pre-padded host-side; the HR
    extras must be padded consistently or the in-jit tile slicing mismatches."""
    from climsr_tpu.inference.tiled import TiledSR
    from climsr_tpu.ops.resize import nearest_upsample

    def fn(lr, elev, mask):
        return nearest_upsample(lr[..., :1], 4) + elev * 0.5

    h, w = 20, 40  # both below tile_size=32
    frame = rng.normal(size=(h, w, 1)).astype(np.float32)
    elev = rng.normal(size=(h * 4, w * 4, 1)).astype(np.float32)
    mask = np.ones((h * 4, w * 4, 1), np.float32)
    tiler = TiledSR(fn, scale=4, tile_size=32, overlap=8, batch_size=4, compute_dtype=jnp.float32)
    got = tiler(frame, extras=(elev, mask))
    want = np.repeat(np.repeat(frame, 4, 0), 4, 1) + elev * 0.5
    assert got.shape == (h * 4, w * 4, 1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_whole_frame_sr_uploads_extras_once(rng, monkeypatch):
    """Extras are broadcast to the batch INSIDE the jit from a single device
    copy — NOT re-shipped per chunk — and numerics are unchanged. The
    host->device conversions are counted via a proxy over the module's jnp."""
    import climsr_tpu.inference.tiled as tiled_mod

    frames = rng.normal(size=(5, 16, 16, 1)).astype(np.float32)
    elev = rng.normal(size=(64, 64, 1)).astype(np.float32)

    def fn(lr, elev_b):
        from climsr_tpu.ops.resize import nearest_upsample

        assert elev_b.ndim == 4  # batched inside the jit
        return nearest_upsample(lr[..., :1], 4) + elev_b

    counts = {"extra_uploads": 0}
    real_jnp = tiled_mod.jnp

    class _JnpProxy:
        def __getattr__(self, name):
            attr = getattr(real_jnp, name)
            if name != "asarray":
                return attr

            def asarray(x, *a, **k):
                if getattr(x, "shape", None) == elev.shape:
                    counts["extra_uploads"] += 1
                return attr(x, *a, **k)

            return asarray

    monkeypatch.setattr(tiled_mod, "jnp", _JnpProxy())
    out = whole_frame_sr(fn, frames, extras=(elev,), batch_size=2, compute_dtype=jnp.float32)
    want = np.repeat(np.repeat(frames[3], 4, 0), 4, 1) + elev
    np.testing.assert_allclose(out[3], want, atol=1e-5)
    # 5 frames at batch_size=2 = 3 chunks; the raster must convert ONCE total
    assert counts["extra_uploads"] == 1, counts


def test_spatial_shard_inference_matches_single_device(cruts_fixture):
    """inference.spatial_shard=true: whole-globe SR produced jointly by the
    8-device mesh matches the single-device whole-frame output — exactly for
    rows a receptive field away from the frame edges (shard seams are
    invisible), loosely at the frame edges (reflect-halo vs zero padding)."""
    import jax

    from climsr_tpu.inference.datasets import CRUTSInferenceDataset
    from climsr_tpu.inference.run import inference_on_full_images
    from climsr_tpu.models import create_generator

    ds = CRUTSInferenceDataset(
        ds_path=str(cruts_fixture["nc"]),
        elevation_file=str(cruts_fixture["elev"]),
        land_mask_file=str(cruts_fixture["mask"]),
        generator_type="srcnn",  # pre-upscaled input: small receptive field
        scaling_factor=4,
    )
    model = create_generator("srcnn", out_channels=1, dtype=jnp.float32)
    item = ds[0]
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,) + item[consts.batch_items.lr].shape))["params"]

    out_single = cruts_fixture["tmp_path"] / "sr_single"
    out_shard = cruts_fixture["tmp_path"] / "sr_shard"
    w_single = inference_on_full_images(model, params, ds, str(out_single), "srcnn", batch_size=2)
    w_shard = inference_on_full_images(
        model, params, ds, str(out_shard), "srcnn", batch_size=2, spatial_shard=True
    )
    assert len(w_single) == len(w_shard) == cruts_fixture["months"]
    a, _ = read_geotiff(w_single[0])
    b, _ = read_geotiff(w_shard[0])
    assert a.shape == b.shape
    rf = 8  # srcnn receptive-field radius (9x9 -> 1x1 -> 5x5) is 6 at HR
    interior = slice(rf, a.shape[0] - rf)
    np.testing.assert_allclose(
        np.nan_to_num(b[interior]), np.nan_to_num(a[interior]), atol=1e-4
    )


def test_spatial_shard_inference_rcan_psum_attention(cruts_fixture):
    """inference.spatial_shard=true with RCAN: run.py must clone the model
    with spatial_axis/spatial_halo so the channel attention pools globally
    via psum (models/rcan.py CALayer) instead of each shard's local window.
    Pins the wiring end-to-end through inference_on_full_images — a missing
    clone would silently change every written GeoTIFF. Tolerances are loose
    (3-row shards << receptive field, so seams are approximate); the sharded
    sweep must complete, preserve the ocean mask, and track the
    single-device output."""
    import jax

    from climsr_tpu.inference.datasets import CRUTSInferenceDataset
    from climsr_tpu.inference.run import inference_on_full_images
    from climsr_tpu.models import create_generator

    ds = CRUTSInferenceDataset(
        ds_path=str(cruts_fixture["nc"]),
        elevation_file=str(cruts_fixture["elev"]),
        land_mask_file=str(cruts_fixture["mask"]),
        generator_type="rcan",
        scaling_factor=4,
    )
    model = create_generator(
        "rcan", n_resgroups=1, n_resblocks=1, n_feats=8, reduction=4,
        out_channels=1, dtype=jnp.float32,
    )
    item = ds[0]
    in_ch = item[consts.batch_items.lr].shape[-1]
    hr = cruts_fixture["hw"][0] * 4, cruts_fixture["hw"][1] * 4
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1,) + item[consts.batch_items.lr].shape),
        jnp.zeros((1, hr[0], hr[1], 1)),
        jnp.ones((1, hr[0], hr[1], 1)),
    )["params"]

    out_single = cruts_fixture["tmp_path"] / "sr_rcan_single"
    out_shard = cruts_fixture["tmp_path"] / "sr_rcan_shard"
    w_single = inference_on_full_images(model, params, ds, str(out_single), "rcan", batch_size=2)
    w_shard = inference_on_full_images(
        model, params, ds, str(out_shard), "rcan", batch_size=2, spatial_shard=True
    )
    assert len(w_single) == len(w_shard) == cruts_fixture["months"]
    a, _ = read_geotiff(w_single[0])
    b, _ = read_geotiff(w_shard[0])
    assert a.shape == b.shape
    np.testing.assert_array_equal(np.isnan(a), np.isnan(b))  # ocean mask preserved
    a0, b0 = np.nan_to_num(a), np.nan_to_num(b)
    rms = np.sqrt(np.mean((a0 - b0) ** 2)) / max(np.sqrt(np.mean(a0**2)), 1e-6)
    assert rms < 0.15, f"sharded rcan diverged from single-device: rms ratio {rms:.3f}"


def test_inspect_results_cli(cruts_fixture, tmp_path):
    """Result-inspection CLI end to end: three comparison sets, plots + CSVs.

    Reference: ``climsr/cli/inspect_results.py`` (custom points / built-in
    mountain peaks / 2-location subset)."""
    import pandas as pd

    from climsr_tpu.cli.inspect_results import run
    from climsr_tpu.config.schemas import ResultInspectionConfig

    peaks = pd.DataFrame({"name": ["a", "b"], "lat": [10.0, -20.0], "lon": [30.0, 100.0], "altitude": [1000, 2000]})
    peaks_path = tmp_path / "peaks.feather"
    peaks.to_feather(peaks_path)

    results_dir = tmp_path / "inspection"
    run(ResultInspectionConfig(
        ds_temp_nn_path=str(cruts_fixture["nc"]),
        ds_temp_cru_path=str(cruts_fixture["nc"]),
        peaks_feather=str(peaks_path),
        results_dir=str(results_dir),
    ))
    for tag in ("peaks_feather", "mountain_peaks", "2_locations"):
        assert (results_dir / f"{tag}.csv").exists()
        assert (results_dir / f"{tag}_line.png").exists()
        assert (results_dir / f"{tag}_box.png").exists()
    # identical datasets -> per-point stats agree exactly in the table
    frame = pd.read_csv(results_dir / "2_locations.csv")
    assert (frame["nn_mean"] == frame["cru_mean"]).all()
    assert (frame["nn_max"] == frame["cru_max"]).all()


def test_tiled_grouped_blend_matches_loop_blend(rng):
    """The 4-parity-group dense blend (compile/runtime fix for many-tile
    frames) is numerically identical to the per-tile update-slice loop."""
    import jax.numpy as jnp

    from climsr_tpu.inference.tiled import TiledSR

    fn = _upsample_fn()
    frame = rng.normal(size=(96, 144, 1)).astype(np.float32)
    # tile=32 overlap=8 -> stride=16... wait t <= 2*stride means 32 <= 32: ok
    grouped = TiledSR(fn, scale=4, tile_size=32, overlap=8, batch_size=512, compute_dtype=jnp.float32)
    out_g = grouped(frame)
    # force the loop path by monkeypatching the threshold: rebuild with a
    # geometry where grouping disengages (overlap > tile/4 -> stride < tile/2)
    loop = TiledSR(fn, scale=4, tile_size=32, overlap=12, batch_size=512, compute_dtype=jnp.float32)
    out_l = loop(frame)
    # both reconstruct the linear upsample exactly (weights normalize to 1)
    want = np.asarray(fn(frame[None]))[0]
    np.testing.assert_allclose(out_g, want, atol=1e-5)
    np.testing.assert_allclose(out_l, want, atol=1e-5)


def test_srcnn_tiled_inference_scale_one(cruts_fixture, rng):
    """srcnn frames are pre-upscaled (HR in, HR out): the tiler must run at
    scale 1 — this used to trace TiledSR at scale 4 and crash on the feather
    window broadcast."""
    import jax

    from climsr_tpu.inference.datasets import CRUTSInferenceDataset
    from climsr_tpu.inference.run import inference_on_full_images
    from climsr_tpu.models import create_generator

    ds = CRUTSInferenceDataset(
        ds_path=str(cruts_fixture["nc"]),
        elevation_file=str(cruts_fixture["elev"]),
        land_mask_file=str(cruts_fixture["mask"]),
        generator_type="srcnn",
        scaling_factor=4,
    )
    model = create_generator("srcnn", out_channels=1, dtype=jnp.float32)
    item = ds[0]
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,) + item[consts.batch_items.lr].shape))["params"]
    out_dir = cruts_fixture["tmp_path"] / "sr_srcnn" / "tmp"
    written = inference_on_full_images(
        model, params, ds, str(out_dir), "srcnn", batch_size=2, tile_size=64, tile_overlap=8
    )
    assert len(written) == cruts_fixture["months"]
    h, w = cruts_fixture["hw"]
    arr, _ = read_geotiff(written[0])
    assert arr.shape == (h * 4, w * 4)
    assert np.isfinite(arr[cruts_fixture["scale"] * 4 :]).all()


def test_standardize_mode_denormalizes_with_zscore(cruts_fixture, rng):
    """normalize=False: the dataset z-scores inputs, so outputs must map back
    through x*std+mean — not through the per-frame minmax range."""
    import pandas as pd

    import jax

    from climsr_tpu.inference.datasets import CRUTSInferenceDataset
    from climsr_tpu.inference.run import inference_on_full_images
    from climsr_tpu.models import create_generator

    D = consts.datasets_and_preprocessing
    S = consts.stats
    mean, std = 100.0, 2.0  # far from the data's own range -> detectable
    stats = pd.DataFrame(
        {
            D.variable: ["tmp", consts.world_clim.elev],
            S.mean: [mean, 500.0],
            S.std: [std, 300.0],
        }
    )
    ds = CRUTSInferenceDataset(
        ds_path=str(cruts_fixture["nc"]),
        elevation_file=str(cruts_fixture["elev"]),
        land_mask_file=str(cruts_fixture["mask"]),
        generator_type="esrgan",
        scaling_factor=4,
        normalize=False,
        standardize=True,
        standardize_stats=stats,
    )
    model = create_generator("esrgan", nf=8, nb=1, gc=4, out_channels=1, dtype=jnp.float32)
    item = ds[0]
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1,) + item[consts.batch_items.lr].shape),
        jnp.zeros((1,) + item[consts.batch_items.elevation].shape),
        jnp.zeros((1,) + item[consts.batch_items.mask].shape),
    )["params"]
    out_dir = cruts_fixture["tmp_path"] / "sr_std" / "tmp"
    written = inference_on_full_images(model, params, ds, str(out_dir), "esrgan", batch_size=2)
    arr, _ = read_geotiff(written[0])
    land = arr[np.isfinite(arr)]
    # random-init generator emits O(1) values; z-score denorm centers them at
    # mean=100 with spread ~std=2 — the old minmax mapping would land near the
    # frame's own [vmin, vmax] range (~10 +- 5)
    assert abs(np.median(land) - mean) < 10 * std, np.median(land)


def test_netcdf_export_lat_ascending_roundtrip(cruts_fixture, rng):
    """The exported NetCDF stores lat ascending (CRU-TS convention): reading
    it back and flipping (as our own readers do) reproduces the GeoTIFF."""
    from glob import glob

    from climsr_tpu.inference.run import transform_tiff_files_to_net_cdf

    src_dir = cruts_fixture["tmp_path"] / "nc_rt" / "tmp"
    src_dir.mkdir(parents=True)
    h, w = 16, 32
    arr = rng.normal(size=(h, w)).astype(np.float32)
    write_geotiff(src_dir / "cruts-tmp-1901-01-16.tif", arr, GeoProfile.global_grid(h, w))
    nc_dir = cruts_fixture["tmp_path"] / "nc_rt_out"
    transform_tiff_files_to_net_cdf(str(src_dir.parent), str(nc_dir), ["tmp"], prefix="rt")
    nc_path = glob(str(nc_dir / "*.nc"))[0]
    series = read_climate_series(nc_path, "tmp")
    assert series.lat[0] < series.lat[-1], "lat must ascend from the south"
    np.testing.assert_allclose(np.flipud(series.data[0]), arr, rtol=1e-6)


@pytest.mark.e2e
def test_inference_cli_end_to_end(cruts_fixture, tmp_path):
    """The real `python inference.py` surface: compose config -> checkpoint
    load -> per-variable SR -> GeoTIFF writes -> CF NetCDF export."""
    import glob

    import jax
    import orbax.checkpoint as ocp
    import pandas as pd

    from climsr_tpu.cli.inference import main
    from climsr_tpu.models import create_generator

    D = consts.datasets_and_preprocessing
    h, w = cruts_fixture["hw"]
    scale = cruts_fixture["scale"]
    pd.DataFrame({D.dataset: ["cru-ts"], D.variable: ["tmp"], "min": [0.0], "max": [20.0]}).to_feather(
        tmp_path / "minmax.feather"
    )
    model = create_generator("esrgan", nf=8, nb=1, gc=4, out_channels=1, dtype=jnp.bfloat16)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h, w, 3), jnp.bfloat16),
        jnp.zeros((1, h * scale, w * scale, 1), jnp.bfloat16),
        jnp.ones((1, h * scale, w * scale, 1), jnp.bfloat16),
    )["params"]
    ckpt = tmp_path / "ckpt"
    with ocp.StandardCheckpointer() as c:
        c.save(ckpt, {"params": jax.device_get(params)})

    out = tmp_path / "out"
    main([
        "inference.run_inference=true", "inference.to_netcdf=true",
        "inference.use_netcdf_datasets=true",
        f"inference.ds_path={cruts_fixture['nc']}",
        f"inference.elevation_file={cruts_fixture['elev']}",
        f"inference.land_mask_file={cruts_fixture['mask']}",
        f"inference.min_max_lookup={tmp_path / 'minmax.feather'}",
        f"inference.zscore_lookup={tmp_path / 'minmax.feather'}",
        f"inference.pretrained_model={ckpt}",
        "inference.generator_type=esrgan",
        # the generator group carries 'name' — must not collide with the
        # positional generator_type in load_generator
        "generator={name: esrgan, nf: 8, nb: 1, gc: 4, out_channels: 1}",
        f"inference.inference_out_path={out}",
        f"inference.extent_out_path_sr_nc={tmp_path / 'nc_out'}",
        "inference.cruts_variable=tmp",
        "inference.batch_size=2",
    ])
    tifs = sorted(glob.glob(f"{out}/tmp/*.tif"))
    assert len(tifs) == cruts_fixture["months"]
    arr, _ = read_geotiff(tifs[0])
    assert arr.shape == (h * scale, w * scale)
    ncs = glob.glob(f"{tmp_path}/nc_out/*.nc")
    assert ncs
    series = read_climate_series(ncs[0], "tmp")
    assert series.lat[0] < series.lat[-1]
    np.testing.assert_allclose(
        np.nan_to_num(np.flipud(series.data[0])), np.nan_to_num(arr), atol=1e-3
    )
