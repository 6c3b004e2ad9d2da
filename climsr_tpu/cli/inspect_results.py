# -*- coding: utf-8 -*-
"""Result-inspection CLI: point-wise SR vs CRU-TS comparison at mountain peaks.

Parity: reference ``climsr/cli/inspect_results.py`` — loads the SR NetCDF and
the original CRU-TS NetCDF, runs three comparisons (custom points file /
built-in mountain peaks / 2-location subset), writes line/box plots + CSV.
"""
from __future__ import annotations

import logging
import os
import sys
from pathlib import Path
from typing import List, Optional

import pandas as pd

import climsr_tpu.consts as consts
from climsr_tpu.config.compose import compose, default_config_dir
from climsr_tpu.config.schemas import ResultInspectionConfig, from_dict
from climsr_tpu.inference.datasets import get_variable_from_ds_fp
from climsr_tpu.io.netcdf import read_climate_series
from climsr_tpu.result_inspection.models import CompareStatsResults

logger = logging.getLogger(__name__)


def _run_internal(ds_nn, ds_cru, lats, lons, alts, names, tag: str, results_dir: Path) -> None:
    results = CompareStatsResults.compute(ds_nn, ds_cru, lats, lons, alts, names)
    results.print_comparison_summary()
    results.line_plot(results_dir / f"{tag}_line.png")
    results.box_plot(results_dir / f"{tag}_box.png")
    results.to_frame().to_csv(results_dir / f"{tag}.csv", index=False)
    logger.info("Wrote %s comparison to %s", tag, results_dir)


def run(cfg: ResultInspectionConfig) -> None:
    results_dir = Path(cfg.results_dir)
    results_dir.mkdir(parents=True, exist_ok=True)

    var_nn = get_variable_from_ds_fp(cfg.ds_temp_nn_path)
    var_cru = get_variable_from_ds_fp(cfg.ds_temp_cru_path)
    ds_nn = read_climate_series(cfg.ds_temp_nn_path, var_nn)
    ds_cru = read_climate_series(cfg.ds_temp_cru_path, var_cru)

    ri = consts.result_inspection
    # 1) custom probe points from feather, if provided
    if cfg.peaks_feather and os.path.exists(cfg.peaks_feather):
        peaks = pd.read_feather(cfg.peaks_feather)
        _run_internal(
            ds_nn, ds_cru,
            peaks["lat"].tolist(), peaks["lon"].tolist(),
            peaks.get("altitude", peaks.get("alt", pd.Series([None] * len(peaks)))).tolist(),
            peaks.get("name", pd.Series([f"peak{i}" for i in range(len(peaks))])).tolist(),
            "peaks_feather", results_dir,
        )
    # 2) built-in mountain-peak probe set
    _run_internal(ds_nn, ds_cru, ri.lats, ri.lons, ri.alts,
                  [f"peak{i}" for i in range(len(ri.lats))], "mountain_peaks", results_dir)
    # 3) two-location subset
    _run_internal(ds_nn, ds_cru, ri.lats[:2], ri.lons[:2], ri.alts[:2],
                  ["loc0", "loc1"], "2_locations", results_dir)


def main(argv: Optional[List[str]] = None) -> None:
    logging.basicConfig(level=logging.INFO)
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = compose(default_config_dir(), "result_inspection", overrides)
    run(from_dict(ResultInspectionConfig, cfg.get("result_inspection") or cfg))


if __name__ == "__main__":
    main()
