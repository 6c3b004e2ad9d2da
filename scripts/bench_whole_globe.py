#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Whole-globe e2e throughput: CRU-TS-sized series through the full pipeline.

Builds a synthetic full-size world (360x720 LR months + 1440x2880 elevation /
land mask at the real ~29% land fraction), runs `inference_on_full_images`
with the flagship generator (the shipped auto-tiled path: 128px Pallas tiles,
land-packed f16 readback, pipelined writer pool) including
GeoTIFF writes, and reports the steady-state months/s via differenced sweeps.
History on this host: round 2 = 0.20 months/s (serial writes), round 3 = 0.29
(pipelined writer, full-frame f16 readback, per-sweep setup un-amortized).

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


def run(
    months: int = 60, json_line: bool = False, warmup_months: int = 4, repeats: int = 3
) -> dict:
    """Build the synthetic globe and measure the STEADY-STATE e2e rate.

    Sweeps through ``inference_on_full_images`` (full pipeline: NetCDF
    read -> normalization -> overlap-tiled SR on device -> land-packed f16
    readback -> host denorm of the packed vector -> GeoTIFF writes):

      1. cold, ``warmup_months`` (includes the one-time tiled-jit compile),
      2. warm, ``warmup_months``    — carries the per-sweep fixed overhead
         (re-trace of the tiled jit, compile-cache load, extras upload),
      3. warm, ``months`` — repeated ``repeats`` times.

    Steady months/s per repeat = (months - warmup_months) / (t_full - setup)
    with setup = the sweep-2 time: the differencing removes the per-sweep
    setup that a real 1440-month production run amortizes to nothing but
    that dominates any single short sweep. The REPORTED rate is the MEDIAN
    over the repeats, with the min-max spread in the dict/log — a single
    captured sweep was observed to wander 2x with device-tunnel weather
    (round-4 verdict), so one sample is not a number. The land mask is
    thresholded to the real CRU-TS land fraction (~29% of the 0.5-degree
    globe) — the packed readback and write sizes match production.
    """
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
    # smooth random field thresholded at the real CRU-TS land fraction: 29%
    # of cells are land (continent-scale blobs, not salt-and-pepper)
    field = rng.normal(size=(hr_h // 40, hr_w // 40)).astype(np.float32)
    field = np.kron(field, np.ones((40, 40), np.float32))
    for ax in (0, 1):  # cheap separable smoothing
        acc = np.zeros_like(field)
        for d in range(-20, 21):
            acc += np.roll(field, d, axis=ax)
        field = acc / 41
    mask_hr = np.where(field >= np.quantile(field, 0.71), 1.0, np.nan).astype(np.float32)
    mask_hr[: 40 * scale, :] = np.nan  # keep the polar strip ocean
    write_geotiff(root / "land_mask.tif", mask_hr, GeoProfile.global_grid(hr_h, hr_w))
    elev = rng.normal(500, 300, size=(hr_h, hr_w)).astype(np.float32)
    write_geotiff(root / "elevation.tif", elev, GeoProfile.global_grid(hr_h, hr_w, nodata=None))

    # a short warmup series in its own NetCDF: sweeps 1-2 run these few months
    nc_warm = root / "warmup.tmp.dat.nc"
    write_climate_series(
        nc_warm,
        ClimateSeries(
            "tmp", data[:warmup_months], tstamps[:warmup_months],
            np.linspace(-89, 89, h), np.linspace(-179, 179, w),
        ),
    )

    def make_ds(path):
        return CRUTSInferenceDataset(
            ds_path=str(path),
            elevation_file=str(root / "elevation.tif"),
            land_mask_file=str(root / "land_mask.tif"),
            generator_type="esrgan",
            scaling_factor=scale,
        )

    ds_warm = make_ds(nc_warm)
    ds = make_ds(nc)
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

    out = sys.stderr if json_line else sys.stdout
    # sweep 1 (cold, warmup months): one-time tiled-jit compile
    t0 = time.perf_counter()
    inference_on_full_images(model, params, ds_warm, str(root / "sr1" / "tmp"), "esrgan", batch_size=8)
    t1 = time.perf_counter()
    # sweep 2 (warm, warmup months): carries only the per-sweep fixed setup
    inference_on_full_images(model, params, ds_warm, str(root / "sr2" / "tmp"), "esrgan", batch_size=8)
    t2 = time.perf_counter()
    setup = t2 - t1
    cold = warmup_months / (t1 - t0)
    warm_short = warmup_months / setup
    print(
        f"# e2e cold (incl compile): {warmup_months} months in {t1 - t0:.1f}s = {cold:.3f} months/s",
        file=out,
    )
    print(
        f"# e2e warm short sweep: {warmup_months} months in {setup:.1f}s = {warm_short:.3f} months/s "
        f"(per-sweep setup dominated)",
        file=out,
    )
    # sweeps 3..: (warm, all months) x repeats: same fixed setup + marginal months
    rates = []
    for r in range(max(1, repeats)):
        out_dir3 = root / f"sr3_{r}" / "tmp"
        tr0 = time.perf_counter()
        inference_on_full_images(model, params, ds, str(out_dir3), "esrgan", batch_size=8)
        tr1 = time.perf_counter()
        n_out = len(list(out_dir3.glob("*.tif")))
        assert n_out == months, (n_out, months)
        marginal = tr1 - tr0 - setup
        # differencing sanity floor: the subtraction assumes the per-sweep
        # setup reproduces. If the residual is under 15% of the full sweep,
        # something perturbed one of them (host contention) and the
        # differenced rate would over-report — fall back to the conservative
        # undifferenced rate for this repeat instead. (At the default 60
        # months the healthy operating point is ~40-60% — a fast tunnel day
        # cannot trip the floor and silently flip the driver metric to the
        # ~3x lower setup-inclusive rate, which a 28-month run could.)
        if marginal < 0.15 * (tr1 - tr0):
            marginal = tr1 - tr0
            print("# differencing unstable (setup did not reproduce); using the "
                  "setup-inclusive rate for this repeat", file=out)
        rate = (months - warmup_months) / marginal
        rates.append(rate)
        print(
            f"# e2e repeat {r + 1}/{repeats}: {months - warmup_months} marginal months in "
            f"{marginal:.1f}s = {rate:.3f} months/s",
            file=out,
        )
    rates_sorted = sorted(rates)
    steady = rates_sorted[len(rates_sorted) // 2]
    eff_mpix_s = steady * hr_h * hr_w / 1e6

    # ---- tunnel-ceiling attribution ----------------------------------------
    # The sweep is bound by the device tunnel: D2H does not overlap compute
    # and does not multiplex (scripts/bench_tunnel.py), so the attainable
    # rate is 1 / (t_compute+uplink + t_readback). Measure both legs in-run
    # so the driver-recorded number carries its own explanation: a low
    # months/s on a bad-weather window shows up as a low ceiling with a high
    # achieved fraction, not as a regression.
    ceiling = frac = float("nan")
    try:
        from climsr_tpu.inference.run import make_generator_fn
        from climsr_tpu.inference.tiled import TiledSR
        from climsr_tpu.ops.pack12 import packed_len

        land_idx = np.flatnonzero(np.asarray(ds.mask_np).ravel()).astype(np.int32)
        k = 8
        gen_fn = make_generator_fn(model, params, "esrgan")
        chunk = min(64, max(1, (8 * 8 * 64 * 64) // (128 * 128)))
        tiler = TiledSR(gen_fn, scale=scale, tile_size=128, overlap=8, batch_size=chunk,
                        output_dtype=jnp.float16, pack_indices=land_idx, pack12=True)
        probe_frames = np.stack([ds[i]["lr"] for i in range(min(months, k))])
        tiler.set_extras((ds.elevation_data, ds.mask_hr))
        if probe_frames.shape[-1] > 1:
            tiler.set_static_lr_channels(probe_frames[0, ..., 1:])
            probe_frames = probe_frames[..., :1]
        if probe_frames.shape[0] < k:
            probe_frames = np.concatenate(
                [probe_frames, np.repeat(probe_frames[-1:], k - probe_frames.shape[0], axis=0)]
            )
        # the axon transport's optimistic async makes block_until_ready
        # unreliable (bench.py's timing note) — a host SCALAR pull is the
        # only honest completion barrier, so each leg below completes via
        # int(out[0, 0]) and the scalar round-trip itself is measured and
        # subtracted from the device leg.
        warm = tiler.device_call_many(probe_frames)
        int(warm[0, 0])  # compile + drain (cache-hot)
        t0 = time.perf_counter()
        int(warm[0, 1])
        t_scalar = time.perf_counter() - t0  # pure scalar round-trip
        t0 = time.perf_counter()
        probe_out = tiler.device_call_many(probe_frames)
        int(probe_out[0, 0])
        t_dev = max(1e-3, time.perf_counter() - t0 - t_scalar)  # uplink + SR + pack
        fresh = jax.jit(
            lambda key: jax.random.randint(
                key, (k, packed_len(land_idx.size)), 0, 2**31 - 1, jnp.uint32
            )
        )(jax.random.PRNGKey(3))
        int(fresh[0, 0])  # ensure computed before timing the full fetch
        t0 = time.perf_counter()
        np.asarray(fresh)
        t_fetch = time.perf_counter() - t0
        mb = fresh.size * 4 / 1e6
        ceiling = k / (t_dev + t_fetch)
        frac = steady / ceiling
        print(
            f"# tunnel ceiling: device leg {t_dev / k * 1e3:.0f} ms/month + readback "
            f"{t_fetch / k * 1e3:.0f} ms/month ({mb / t_fetch:.1f} MB/s D2H) -> "
            f"{ceiling:.2f} months/s attainable; steady state achieved {frac * 100:.0f}%",
            file=out,
        )
    except Exception as e:  # pragma: no cover - diagnostics must never fail the bench
        print(f"# tunnel ceiling probe failed: {e}", file=out)

    print(
        f"# e2e steady state: median {steady:.3f} months/s over {len(rates)} repeats "
        f"(spread {rates_sorted[0]:.3f}-{rates_sorted[-1]:.3f}) = {eff_mpix_s:.1f} Mpix-HR/s "
        f"under {root}",
        file=out,
    )
    return {
        "months_per_s_steady": steady,
        "months_per_s_spread": (rates_sorted[0], rates_sorted[-1]),
        "months_per_s_cold": cold,
        "months_per_s_warm_short": warm_short,
        "eff_mpix_hr_s": eff_mpix_s,
        "months_per_s_ceiling": ceiling,
        "ceiling_fraction": frac,
    }


def main() -> None:
    months = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 60
    run(months)


if __name__ == "__main__":
    main()
