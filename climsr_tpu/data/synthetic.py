# -*- coding: utf-8 -*-
"""Synthetic mini-dataset factory in the reference's on-disk layout.

The reference's tests require multi-GB preprocessed WorldClim/CRU-TS datasets
on disk (SURVEY.md §4). This module instead fabricates a tiny but
schema-identical dataset — feather tile indices, GeoTIFF tiles, stats tables —
so unit tests, benchmarks and end-to-end training runs work out of the box.

Layout produced under ``root`` (matches ``consts.datasets_and_preprocessing``):

    pre-processed/feather/{tmin,tavg,tmax,prec}/{train,val,test}.feather
    pre-processed/feather/elev/elev.feather
    pre-processed/feather/statistics_zscore.feather
    pre-processed/feather/statistics_min_max.feather
    tiles/...tif  (float32 GeoTIFFs, NaN ocean pixels)

Fields are smooth random climate-like rasters (superposed cosines + terrain-
correlated signal) so SR models actually have learnable structure.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd

import climsr_tpu.consts as consts
from climsr_tpu.io.geotiff import GeoProfile, write_geotiff

D = consts.datasets_and_preprocessing
S = consts.stats


def _smooth_field(rng: np.random.Generator, size: int, n_modes: int = 6, scale: float = 1.0) -> np.ndarray:
    yy, xx = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size), indexing="ij")
    field = np.zeros((size, size), np.float32)
    for _ in range(n_modes):
        fx, fy = rng.uniform(0.5, 4.0, 2)
        phase = rng.uniform(0, 2 * np.pi, 2)
        field += rng.uniform(0.3, 1.0) * np.cos(2 * np.pi * (fx * xx + phase[0])) * np.cos(
            2 * np.pi * (fy * yy + phase[1])
        )
    return (field * scale).astype(np.float32)


def make_synthetic_dataset(
    root: os.PathLike,
    n_tiles_per_stage: Tuple[int, int, int] = (24, 8, 8),
    tile_size: int = 128,
    variables: Optional[List[str]] = None,
    europe_extent: bool = False,
    seed: int = 0,
) -> Path:
    """Create the dataset tree; returns the root path (the ``data_path`` config value)."""
    rng = np.random.default_rng(seed)
    root = Path(root)
    feather_dir = root / D.preprocessing_output_path / D.feather_path
    tiles_dir = root / "tiles"
    feather_dir.mkdir(parents=True, exist_ok=True)
    tiles_dir.mkdir(parents=True, exist_ok=True)

    variables = variables or list(consts.world_clim.temperature_vars)
    hr_size = 452 if europe_extent else tile_size
    resolution = consts.world_clim.resolution_2_5m

    # shared terrain + ocean mask per tile grid position
    n_positions = max(n_tiles_per_stage)
    terrains = {}
    oceans = {}
    for pos in range(n_positions):
        terrains[pos] = _smooth_field(rng, hr_size, scale=800.0) + 600.0
        ocean = _smooth_field(rng, hr_size) < -0.8  # ~20% ocean blobs
        oceans[pos] = ocean

    # elevation tiles + index
    elev_rows = []
    elev_dir = tiles_dir / consts.world_clim.elev
    for pos in range(n_positions):
        x, y = pos * tile_size, 0
        fname = f"elev_{resolution}_{x}_{y}.tif"
        fp = elev_dir / fname
        elev_arr = terrains[pos].copy()
        elev_arr[oceans[pos]] = consts.world_clim.elevation_missing_indicator
        write_geotiff(fp, elev_arr, GeoProfile.global_grid(hr_size, hr_size, nodata=None))
        elev_rows.append(
            {
                D.filename: fname,
                D.file_path: str(fp),
                D.tile_file_path: str(fp),
                D.variable: consts.world_clim.elev,
                D.x: x,
                D.y: y,
                D.year: 0,
                D.month: 0,
                D.resolution: resolution,
            }
        )
    (feather_dir / consts.world_clim.elev).mkdir(exist_ok=True)
    # The datamodule suffixes *every* feather it loads in europe-extent mode
    # (reference super_resolution_data_module.py:67-72), including elev.
    elev_feather_name = (
        f"{consts.world_clim.elev}_europe_extent.feather" if europe_extent else f"{consts.world_clim.elev}.feather"
    )
    pd.DataFrame(elev_rows).reset_index(drop=True).to_feather(
        feather_dir / consts.world_clim.elev / elev_feather_name
    )

    offsets = {consts.world_clim.tmin: -8.0, consts.world_clim.tavg: 0.0, consts.world_clim.tmax: 8.0,
               consts.world_clim.prec: 50.0}
    stage_years = {consts.stages.train: 1990, consts.stages.val: 2002, consts.stages.test: 2010}

    all_stats_rows = []
    zscore_rows: Dict[str, Dict[str, float]] = {}
    global_minmax: Dict[str, Tuple[float, float]] = {}

    per_var_tiles: Dict[str, Dict[str, List[dict]]] = {}
    for var in variables:
        per_var_tiles[var] = {}
        var_tile_dir = tiles_dir / var
        collected = []
        for stage, n_tiles in zip(consts.stages.stages, n_tiles_per_stage):
            rows = []
            year = stage_years[stage]
            for i in range(n_tiles):
                pos = i % n_positions
                month = (i % 12) + 1
                base = offsets.get(var, 0.0)
                arr = (
                    base
                    + _smooth_field(rng, hr_size, scale=10.0)
                    + 0.006 * (1500.0 - terrains[pos])  # lapse-rate-ish terrain coupling
                    + rng.normal(0, 0.3, (hr_size, hr_size)).astype(np.float32)
                ).astype(np.float32)
                arr[oceans[pos]] = np.nan
                x, y = pos * tile_size, 0
                fname = f"{var}_{year}_{month:02d}_{resolution}_{x}_{y}.tif"
                fp = var_tile_dir / fname
                write_geotiff(fp, arr, GeoProfile.global_grid(hr_size, hr_size))
                tile_min = float(np.nanmin(arr))
                tile_max = float(np.nanmax(arr))
                collected.append(arr)
                row = {
                    D.filename: fname,
                    D.file_path: str(fp),
                    D.tile_file_path: str(fp),
                    D.variable: var,
                    D.x: x,
                    D.y: y,
                    D.year: year + (i // 12),
                    D.month: month,
                    D.resolution: resolution,
                }
                rows.append(row)
                all_stats_rows.append(
                    {
                        D.filename: fname,
                        D.variable: var,
                        D.year: row[D.year],
                        D.month: month,
                        D.resolution: resolution,
                        D.dataset: "world-clim",
                        S.min: tile_min,
                        S.max: tile_max,
                    }
                )
            per_var_tiles[var][stage] = rows

        stacked = np.concatenate([a[np.isfinite(a)] for a in collected])
        gmin, gmax = float(stacked.min()), float(stacked.max())
        global_minmax[var] = (gmin, gmax)
        mean, std = float(stacked.mean()), float(stacked.std())
        cruts_name = D.world_clim_to_cruts_mapping.get(var, var)
        zscore_rows[cruts_name] = {
            S.mean: mean,
            S.std: std,
            S.min: gmin,
            S.max: gmax,
            S.normalized_min: (gmin - mean) / (std + 1e-8),
            S.normalized_max: (gmax - mean) / (std + 1e-8),
        }

    # 'temp' z-score = mean over tmin/tavg/tmax (reference preprocessing.py:250-361)
    tvars = [v for v in variables if v in consts.world_clim.temperature_vars]
    if tvars:
        agg = {k: float(np.mean([zscore_rows[D.world_clim_to_cruts_mapping.get(v, v)][k] for v in tvars]))
               for k in [S.mean, S.std, S.min, S.max, S.normalized_min, S.normalized_max]}
        zscore_rows[consts.cruts.tmp] = agg  # 'temp' maps to 'tmp'

    elev_vals = np.concatenate([t[~oceans[p]] for p, t in terrains.items()])
    zscore_rows[consts.world_clim.elev] = {
        S.mean: float(elev_vals.mean()),
        S.std: float(elev_vals.std()),
        S.min: float(elev_vals.min()),
        S.max: float(elev_vals.max()),
        S.normalized_min: float((elev_vals.min() - elev_vals.mean()) / (elev_vals.std() + 1e-8)),
        S.normalized_max: float((elev_vals.max() - elev_vals.mean()) / (elev_vals.std() + 1e-8)),
    }

    zdf = pd.DataFrame([{D.variable: k, **v} for k, v in zscore_rows.items()])
    zdf.reset_index(drop=True).to_feather(feather_dir / D.zscore_stats_filename)

    stats_df = pd.DataFrame(all_stats_rows)
    for var, (gmin, gmax) in global_minmax.items():
        sel = stats_df[D.variable] == var
        stats_df.loc[sel, S.global_min] = gmin
        stats_df.loc[sel, S.global_max] = gmax
    stats_df.reset_index(drop=True).to_feather(feather_dir / D.min_max_stats_filename)

    for var in variables:
        var_feather_dir = feather_dir / var
        var_feather_dir.mkdir(exist_ok=True)
        for stage, fname in zip(
            consts.stages.stages, [D.train_feather, D.val_feather, D.test_feather]
        ):
            df = pd.DataFrame(per_var_tiles[var][stage])
            suffix = "_europe_extent" if europe_extent else ""
            if suffix:
                stem, ext = os.path.splitext(fname)
                fname_out = f"{stem}{suffix}{ext}"
            else:
                fname_out = fname
            df.reset_index(drop=True).to_feather(var_feather_dir / fname_out)

    return root
