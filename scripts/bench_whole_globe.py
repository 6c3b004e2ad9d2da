#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Whole-globe e2e throughput: CRU-TS-sized series through the full pipeline.

Builds a synthetic full-size world (360x720 LR months + 1440x2880 elevation /
land mask), runs `inference_on_full_images` with the flagship generator (the
shipped auto-tiled path: 128px Pallas tiles, pipelined writer pool) including
GeoTIFF writes, and reports months/s. Round-2 baseline on this host: 0.20
months/s with the serial write path.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_whole_globe.py [months]
"""
from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

import jax

# each inference_on_full_images call builds a fresh TiledSR (fresh jit): the
# persistent cache makes sweep 2's "compile" a disk hit, isolating steady state
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

from climsr_tpu.inference.datasets import CRUTSInferenceDataset
from climsr_tpu.inference.run import inference_on_full_images
from climsr_tpu.io.geotiff import GeoProfile, write_geotiff
from climsr_tpu.io.netcdf import ClimateSeries, write_climate_series
from climsr_tpu.models import create_generator


def main() -> None:
    months = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    h, w, scale = 360, 720, 4
    hr_h, hr_w = h * scale, w * scale
    rng = np.random.default_rng(0)
    root = Path(tempfile.mkdtemp(prefix="globe_bench_"))

    data = rng.normal(10, 5, size=(months, h, w)).astype(np.float32)
    data[:, :40, :] = np.nan  # polar ocean strip
    tstamps = np.array(
        [f"{1901 + m // 12}-{m % 12 + 1:02d}-16" for m in range(months)], dtype="datetime64[D]"
    )
    nc = root / "cru_ts4.05.1901.2020.tmp.dat.nc"
    write_climate_series(
        nc, ClimateSeries("tmp", data, tstamps, np.linspace(-89, 89, h), np.linspace(-179, 179, w))
    )
    mask_hr = np.ones((hr_h, hr_w), np.float32)
    mask_hr[: 40 * scale, :] = np.nan
    write_geotiff(root / "land_mask.tif", mask_hr, GeoProfile.global_grid(hr_h, hr_w))
    elev = rng.normal(500, 300, size=(hr_h, hr_w)).astype(np.float32)
    write_geotiff(root / "elevation.tif", elev, GeoProfile.global_grid(hr_h, hr_w, nodata=None))

    ds = CRUTSInferenceDataset(
        ds_path=str(nc),
        elevation_file=str(root / "elevation.tif"),
        land_mask_file=str(root / "land_mask.tif"),
        generator_type="esrgan",
        scaling_factor=scale,
    )
    model = create_generator(
        "esrgan", nf=64, nb=11, gc=16, out_channels=1, dtype=jnp.bfloat16, use_pallas=True
    )
    # init at a small dummy tile: conv params are shape-independent, and an
    # eager whole-frame 360x720 init forward would add minutes of per-op
    # compile + transfer over the device tunnel before the timed section
    item = ds[0]
    in_ch = item["lr"].shape[-1]
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, in_ch), jnp.bfloat16),
        jnp.zeros((1, 128, 128, 1), jnp.bfloat16),
        jnp.ones((1, 128, 128, 1), jnp.bfloat16),
    )["params"]

    out_dir = root / "sr" / "tmp"
    # sweep 1 includes the one-time tiled-jit compile; sweep 2 is steady state
    t0 = time.perf_counter()
    inference_on_full_images(model, params, ds, str(out_dir), "esrgan", batch_size=8)
    t1 = time.perf_counter()
    out_dir2 = root / "sr2" / "tmp"
    inference_on_full_images(model, params, ds, str(out_dir2), "esrgan", batch_size=8)
    t2 = time.perf_counter()
    n_out = len(list(out_dir2.glob("*.tif")))
    print(f"e2e cold (incl compile): {months} months in {t1 - t0:.1f}s = {months / (t1 - t0):.3f} months/s")
    print(f"e2e warm: {months} months in {t2 - t1:.1f}s = {months / (t2 - t1):.3f} months/s ({n_out} GeoTIFFs)")
    print(f"outputs under {root}")


if __name__ == "__main__":
    main()
