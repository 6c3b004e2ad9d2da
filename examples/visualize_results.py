#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Visualize SR results vs the original CRU-TS series.

Parity: reference ``notebooks/visualize-results.ipynb`` — side-by-side frames,
per-point time series at the mountain-peak probes, and error statistics — as a
runnable script.

    python examples/visualize_results.py \
        --sr-nc <generator>.cru_ts4.05.nn.inference.1901.2020.tmp.dat.nc \
        --cru-nc cru_ts4.05.1901.2020.tmp.dat.nc --out results/figures
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import climsr_tpu.consts as consts
from climsr_tpu.data.utils import im_show_with_colorbar
from climsr_tpu.inference.datasets import get_variable_from_ds_fp
from climsr_tpu.io.netcdf import read_climate_series
from climsr_tpu.result_inspection.models import CompareStatsResults


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--sr-nc", required=True)
    parser.add_argument("--cru-nc", required=True)
    parser.add_argument("--out", default="results/figures")
    parser.add_argument("--frame", type=int, default=0, help="time index to render")
    args = parser.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    sr = read_climate_series(args.sr_nc, get_variable_from_ds_fp(args.sr_nc))
    cru = read_climate_series(args.cru_nc, get_variable_from_ds_fp(args.cru_nc))

    t = min(args.frame, sr.data.shape[0] - 1)
    im_show_with_colorbar(cru.data[t], title=f"CRU-TS 0.5° (t={t})", save_path=out / "cru_frame.png")
    im_show_with_colorbar(sr.data[t], title=f"SR 0.125° (t={t})", save_path=out / "sr_frame.png")

    ri = consts.result_inspection
    results = CompareStatsResults.compute(sr, cru, ri.lats, ri.lons, ri.alts)
    results.print_comparison_summary()
    results.line_plot(out / "probe_means.png")
    results.box_plot(out / "probe_box.png")
    results.to_frame().to_csv(out / "probe_stats.csv", index=False)

    diff_mean = float(np.nanmean(sr.data) - np.nanmean(cru.data))
    print(f"global mean shift (SR - CRU): {diff_mean:+.4f}")
    print(f"figures written to {out}")


if __name__ == "__main__":
    main()
