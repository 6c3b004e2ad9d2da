#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Decompose the whole-globe e2e rate into its transport/compute/IO parts.

The e2e sweep (scripts/bench_whole_globe.py) wanders 2x+ with "device-tunnel
weather"; this probe measures each leg separately so a bad number can be
attributed instead of guessed at:

  1. D2H bandwidth: packed land-vector group fetch (the sweep's readback),
  2. H2D bandwidth: one month's 1-channel LR frame upload,
  3. device-only compute: one group's tiled SR with no readback,
  4. host-only IO: denorm + GeoTIFF write of one frame,
  5. the pipelined sweep itself (as shipped) for the same months.

Run it EXCLUSIVELY (nothing else on the host: the box has one core and the
writer pool + codec are host-bound).

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_globe_transport.py [months]
"""
from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    months = int(sys.argv[1]) if len(sys.argv) > 1 else 24

    from climsr_tpu.inference.datasets import CRUTSInferenceDataset
    from climsr_tpu.inference.run import inference_on_full_images
    from climsr_tpu.io.geotiff import GeoProfile, write_geotiff
    from climsr_tpu.io.netcdf import ClimateSeries, write_climate_series
    from climsr_tpu.models import create_generator
    import scripts.bench_whole_globe as g  # reuse the synthetic globe builder

    h, w, scale = 360, 720, 4
    hr_h, hr_w = h * scale, w * scale
    rng = np.random.default_rng(0)
    root = Path(tempfile.mkdtemp(prefix="globe_probe_"))

    data = rng.normal(10, 5, size=(months, h, w)).astype(np.float32)
    data[:, :40, :] = np.nan
    tstamps = np.array(
        [f"{1901 + m // 12}-{m % 12 + 1:02d}-16" for m in range(months)], dtype="datetime64[D]"
    )
    nc = root / "cru_ts4.05.1901.2020.tmp.dat.nc"
    write_climate_series(
        nc, ClimateSeries("tmp", data, tstamps, np.linspace(-89, 89, h), np.linspace(-179, 179, w))
    )
    field = rng.normal(size=(hr_h // 40, hr_w // 40)).astype(np.float32)
    field = np.kron(field, np.ones((40, 40), np.float32))
    for ax in (0, 1):
        acc = np.zeros_like(field)
        for d in range(-20, 21):
            acc += np.roll(field, d, axis=ax)
        field = acc / 41
    mask_hr = np.where(field >= np.quantile(field, 0.71), 1.0, np.nan).astype(np.float32)
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
    item = ds[0]
    in_ch = item["lr"].shape[-1]
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, in_ch), jnp.bfloat16),
        jnp.zeros((1, 128, 128, 1), jnp.bfloat16),
        jnp.ones((1, 128, 128, 1), jnp.bfloat16),
    )["params"]

    land_idx = np.flatnonzero(np.asarray(ds.mask_np).ravel()).astype(np.int32)
    n_land = land_idx.size
    print(f"# land fraction {n_land / ds.mask_np.size:.3f} -> packed vector {n_land * 2 / 1e6:.2f} MB f16")

    # ---- 1/2: raw link bandwidth --------------------------------------------
    k = 8
    grp_f16 = jnp.zeros((k, n_land), jnp.float16)
    jax.block_until_ready(grp_f16)
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(grp_f16)
        d2h = time.perf_counter() - t0
    mb = k * n_land * 2 / 1e6
    print(f"# D2H: {mb:.1f} MB packed group in {d2h:.2f}s = {mb / d2h:.1f} MB/s")

    frame = np.zeros((k, h, w, 1), np.float32)
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(frame.astype(np.float16)))
        h2d = time.perf_counter() - t0
    mbu = frame.size * 2 / 1e6
    print(f"# H2D: {mbu:.1f} MB frame group in {h2d:.2f}s = {mbu / h2d:.1f} MB/s")

    # ---- 3: device-only compute for one group -------------------------------
    from climsr_tpu.inference.run import make_generator_fn
    from climsr_tpu.inference.tiled import TiledSR

    gen_fn = make_generator_fn(model, params, "esrgan")
    frames = np.stack([ds[i]["lr"] for i in range(min(months, k))])
    tiler = TiledSR(
        gen_fn, scale=scale, tile_size=128, overlap=8,
        batch_size=min(64, max(1, (8 * 8 * 64 * 64) // (128 * 128))),
        output_dtype=jnp.float16, pack_indices=land_idx,
    )
    tiler.set_extras((ds.elevation_data, ds.mask_hr))
    if frames.shape[-1] > 1:
        tiler.set_static_lr_channels(frames[0, ..., 1:])
        frames = frames[..., :1]
    pad = k - frames.shape[0]
    if pad:
        frames = np.concatenate([frames, np.repeat(frames[-1:], pad, axis=0)])
    out = tiler.device_call_many(frames)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = tiler.device_call_many(frames)
    jax.block_until_ready(out)
    t_disp = time.perf_counter() - t0
    print(f"# device group ({k} months, dispatch+compute, no host readback): "
          f"{t_disp:.2f}s = {k / t_disp:.2f} months/s")
    t0 = time.perf_counter()
    host = np.asarray(tiler.device_call_many(frames))
    t_all = time.perf_counter() - t0
    print(f"# device group + readback: {t_all:.2f}s = {k / t_all:.2f} months/s "
          f"({host.nbytes / 1e6:.1f} MB)")

    # ---- 4: host-only write leg ---------------------------------------------
    from climsr_tpu.data.normalization import MinMaxScaler

    scaler = MinMaxScaler(feature_range=(-1.0, 1.0))
    prof = GeoProfile.global_grid(hr_h, hr_w)
    t0 = time.perf_counter()
    for j in range(k):
        vals = host[j].astype(np.float32)
        vals = scaler.denormalize(vals, -10.0, 30.0)
        arr = np.full((hr_h, hr_w), np.nan, np.float32)
        arr.ravel()[land_idx] = vals
        write_geotiff(root / f"probe_{j}.tif", arr, prof)
    t_host = (time.perf_counter() - t0)
    print(f"# host denorm+scatter+write: {t_host / k * 1e3:.0f} ms/frame "
          f"= {k / t_host:.2f} months/s if serial")

    # ---- 5: the shipped pipelined sweep -------------------------------------
    t0 = time.perf_counter()
    inference_on_full_images(model, params, ds, str(root / "sr" / "tmp"), "esrgan", batch_size=8)
    t1 = time.perf_counter()
    t0b = time.perf_counter()
    inference_on_full_images(model, params, ds, str(root / "sr2" / "tmp"), "esrgan", batch_size=8)
    t1b = time.perf_counter()
    print(f"# pipelined sweep: {months} months in {t1 - t0:.1f}s then {t1b - t0b:.1f}s "
          f"= {months / (t1b - t0b):.2f} months/s warm")


if __name__ == "__main__":
    from climsr_tpu.utils.core import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    main()
