# -*- coding: utf-8 -*-
"""End-to-end ETL test: fabricated raw CRU-TS + WorldClim -> all 7 steps ->
schema-compatible feathers/tiles consumable by the datamodule."""
import os
from glob import glob

import numpy as np
import pandas as pd
import pytest

import climsr_tpu.consts as consts
from climsr_tpu.config.schemas import PreProcessingConfig
from climsr_tpu.io.geotiff import GeoProfile, write_geotiff
from climsr_tpu.io.netcdf import ClimateSeries, write_climate_series
from climsr_tpu.preprocessing import preprocessing as P

D = consts.datasets_and_preprocessing
WC = consts.world_clim


@pytest.fixture()
def raw_world(tmp_path, rng, monkeypatch):
    # shrink the target HR grid so the test is fast
    monkeypatch.setattr(WC, "target_hr_resolution", (288, 144))

    cruts_dir = tmp_path / "cruts"
    cruts_dir.mkdir()
    months = 4
    for var in consts.cruts.temperature_vars:
        data = rng.normal(10, 5, size=(months, 36, 72)).astype(np.float32)
        data[:, :6, :] = np.nan
        time = np.array([f"1999-{m:02d}-16" for m in range(1, months + 1)], dtype="datetime64[D]")
        write_climate_series(
            cruts_dir / consts.cruts.file_pattern.format(var),
            ClimateSeries(var, data, time, np.linspace(-89, 89, 36), np.linspace(-179, 179, 72)),
        )

    # WorldClim raw tree: wc2.1/2.5m/<var>/ with a couple of monthly rasters
    wc_dir = tmp_path / "world-clim" / "extracted"
    years = [1999, 2002, 2010]  # train / val / test buckets
    for var in [WC.tmin, WC.tmax, WC.elev]:
        for year in [0] if var == WC.elev else years:
            for month in (1, 2):
                d = wc_dir / "wc2.1" / "2.5m" / var
                d.mkdir(parents=True, exist_ok=True)
                arr = rng.normal(5, 10, size=(72, 144)).astype(np.float32)
                arr[:10, :] = WC.ocean_mask_value
                if var == WC.elev:
                    fname = "wc2.1_2.5m_elev.tif"
                else:
                    fname = f"wc2.1_2.5m_{var}_{year}-{month:02d}.tif"
                write_geotiff(d / fname, arr, GeoProfile.global_grid(72, 144, nodata=None))
                if var == WC.elev:
                    break
            if var == WC.elev:
                break

    out_dir = tmp_path / "out"
    cfg = PreProcessingConfig(
        data_dir_cruts=str(cruts_dir),
        data_dir_world_clim=str(wc_dir),
        output_path=str(out_dir),
        run_cruts_to_tiff=True,
        run_world_clim_resize=True,
        run_tavg_rasters_generation=True,
        run_world_clim_tiling=True,
        run_statistics_computation=True,
        run_z_score_stats_computation=True,
        run_min_max_stats_computation=True,
        run_train_val_test_split=True,
        run_extent_extraction=True,
        patch_size=(64, 64),
        patch_stride=32,
        n_workers=1,
        train_years=(1961, 1999),
        val_years=(2000, 2005),
        test_years=(2006, 2020),
    )
    return cfg, out_dir


def test_full_pipeline(raw_world):
    cfg, out = raw_world
    P.run_cruts_to_tiff(cfg)
    P.run_world_clim_resize(cfg)
    P.run_tavg_rasters_generation(cfg)
    P.run_world_clim_tiling(cfg)
    P.run_statistics_computation(cfg)
    P.run_train_val_test_split(cfg)
    P.run_extent_extraction(cfg)

    pre = out / D.preprocessing_output_path
    # step 1: monthly CRU-TS GeoTIFFs
    cruts_tiffs = glob(str(pre / D.cruts_preprocessing_out_path / consts.cruts.full_res_dir / "tmp" / "*.tif"))
    assert len(cruts_tiffs) == 4
    # step 2: resized rasters at the (shrunk) target resolution
    resized = glob(str(pre / D.world_clim_preprocessing_out_path / WC.resized_dir / "**" / "*.tif"), recursive=True)
    assert resized
    from climsr_tpu.io.geotiff import read_geotiff

    arr, profile = read_geotiff(resized[0])
    assert arr.shape == (144, 288)
    assert np.isnan(arr[:15, :]).any()  # ocean indicator unified to NaN
    # step 3: tavg rasters exist
    tavg = glob(str(pre / D.world_clim_preprocessing_out_path / WC.resized_dir / "**" / f"*{WC.tavg}*.tif"),
                recursive=True)
    assert len(tavg) > 0
    # step 4: tiles with offsets in filename
    tiles = glob(str(pre / D.world_clim_preprocessing_out_path / WC.tiles_dir / "**" / "*.tif"), recursive=True)
    assert tiles
    assert any(".0.0.tif" in t for t in tiles)
    # step 5: stats feathers with reference schema
    zdf = pd.read_feather(pre / D.feather_path / D.zscore_stats_filename)
    assert set([consts.stats.mean, consts.stats.std, consts.stats.normalized_min]) <= set(zdf.columns)
    assert WC.temp in zdf[D.variable].values
    mmdf = pd.read_feather(pre / D.feather_path / D.min_max_stats_filename)
    assert set([consts.stats.global_min, consts.stats.global_max, D.dataset]) <= set(mmdf.columns)
    assert (mmdf[mmdf[D.dataset] == "cru-ts"][D.variable] == "tmn").any()
    # step 6: split feathers per variable/stage
    train_df = pd.read_feather(pre / D.feather_path / WC.tmin / D.train_feather)
    assert len(train_df) > 0
    assert set([D.tile_file_path, D.x, D.y, D.resolution]) <= set(train_df.columns)
    assert (train_df[D.year] <= 1999).all()
    val_df = pd.read_feather(pre / D.feather_path / WC.tmin / D.val_feather)
    # val restricted to non-overlapping tiles
    assert (val_df[D.x] % 64 == 0).all() and (val_df[D.y] % 64 == 0).all()
    # step 7: extent crops + extent split feathers
    extent = glob(str(pre / D.world_clim_preprocessing_out_path / consts.cruts.europe_extent / "**" / "*.tif"),
                  recursive=True)
    assert extent
    assert (pre / D.feather_path / WC.tmin / "train_europe_extent.feather").exists()


def test_filename_parsers():
    assert P._year_from_filename("wc2.1_2.5m_tmin_1999-02.tif") == 1999
    assert P._month_from_filename("wc2.1_2.5m_tmin_1999-02.tif") == 2
    assert P._resolution_from_filename("wc2.1_2.5m_tmin_1999-02.tif") == "2.5m"
    assert P._is_future(2020) and not P._is_future(2019)


def test_tile_windows_edge_snap():
    wins = list(P._tile_windows(100, 100, 64, 64, 32))
    # last windows snap back so every tile is full-size
    assert all(0 <= c <= 36 and 0 <= r <= 36 for c, r in wins)
    assert (36, 36) in wins
