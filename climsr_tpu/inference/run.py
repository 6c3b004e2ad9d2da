# -*- coding: utf-8 -*-
"""Batch inference: checkpoint -> jitted generator -> GeoTIFF per month -> NetCDF.

Parity: reference ``climsr/inference/inference.py``:

- ``run_inference``: per-variable checkpoint load, min-max lookup filter
  (dataset == 'cru-ts'), NetCDF vs GeoTIFF dataset choice, full-image SR,
  denormalize + NaN ocean mask, GeoTIFF written with the land-mask profile,
- ``transform_tiff_files_to_net_cdf``: monthly GeoTIFFs -> CF-1.4 NetCDF named
  ``{prefix}.cru_ts4.05.nn.inference.1901.2020.{var}.dat.nc``.

TPU upgrades over the reference's batch_size=1 python loop: months are
batched to fill the chip, frames can be overlap-tiled (``tile_size``) so any
input size compiles once at a fixed shape, forward runs in bf16.
"""
from __future__ import annotations

import logging
import os
import re
from glob import glob
from pathlib import Path
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

import climsr_tpu.consts as consts
from climsr_tpu.config.schemas import InferenceConfig
from climsr_tpu.data.normalization import MinMaxScaler, StandardScaler
from climsr_tpu.inference.datasets import CRUTSInferenceDataset, GeoTiffInferenceDataset
from climsr_tpu.inference.tiled import TiledSR, whole_frame_sr
from climsr_tpu.io.geotiff import GeoProfile, read_geotiff, write_geotiff
from climsr_tpu.io.netcdf import stack_monthly_rasters, write_climate_series
from climsr_tpu.models import FUSION_GENERATORS, create_generator
from climsr_tpu.training.checkpoint import restore_pytree

B = consts.batch_items
D = consts.datasets_and_preprocessing
logger = logging.getLogger(__name__)


def load_generator(pretrained_model: str, generator_type: str, generator_kwargs: Optional[dict] = None):
    """Load generator params from an orbax checkpoint directory — or directly
    from a reference PyTorch-Lightning ``.ckpt`` (strict=False analogue)."""
    from climsr_tpu.interop.torch_import import is_torch_checkpoint, load_reference_generator_params

    if is_torch_checkpoint(pretrained_model):
        _, params = load_reference_generator_params(pretrained_model, generator_type)
    else:
        from climsr_tpu.training.checkpoint import extract_generator_params

        params = extract_generator_params(restore_pytree(pretrained_model))
    # the generator config group carries its own 'name' key — the positional
    # generator_type governs; passing both would TypeError
    kwargs = {k: v for k, v in (generator_kwargs or {}).items() if k != "name"}
    model = create_generator(generator_type, dtype=jnp.bfloat16, **kwargs)
    return model, params


def make_generator_fn(model, params, generator_type: str):
    """(lr[, elev, mask]) -> sr, matching the task-layer call dispatch."""
    if generator_type in FUSION_GENERATORS:

        def fn(lr, elev, mask):
            return model.apply({"params": params}, lr, elev, mask)

    else:

        def fn(lr, *_):
            return model.apply({"params": params}, lr)

    return fn


def inference_on_full_images(
    model,
    params,
    ds,
    out_dir: str,
    generator_type: str,
    normalization_range=(-1.0, 1.0),
    batch_size: int = 8,
    tile_size: Optional[int] = None,
    tile_overlap: int = 16,
    scaling_factor: int = 4,
    spatial_shard: bool = False,
    spatial_halo: int = 32,
    readback: str = "pack12",
) -> List[str]:
    """SR every frame in ``ds``; write one GeoTIFF per frame. Returns paths.

    ``readback``: transport encoding of the packed land vector on the tiled
    path — ``"pack12"`` (default: 12-bit fixed point, 1.5 B/px, worst-case
    abs error 3.7e-4 on the normalized output — ops/pack12.py) or ``"f16"``
    (2 B/px, ulp 4.9e-4 near |x|=1). The tunnel-bound sweep is D2H-limited
    (scripts/bench_tunnel.py), so fewer bytes is a directly higher e2e rate.
    """
    os.makedirs(out_dir, exist_ok=True)
    # Denormalize with the SAME scaler family the dataset normalized with:
    # in standardize mode the dataset z-scored the inputs, so mapping the SR
    # output through minmax(vmin, vmax) would write silently wrong values.
    scaler = getattr(ds, "scaler", None)
    if scaler is None:
        scaler = MinMaxScaler(feature_range=tuple(normalization_range))
    mask_arr, mask_profile = read_geotiff(ds.land_mask_file)
    mask_np = ds.mask_np

    gen_fn = make_generator_fn(model, params, generator_type)
    n = len(ds)
    written: List[str] = []

    # assemble the whole month stack host-side (1440 frames @ 360x720 ≈ 1.5 GB — fine)
    frames = []
    metas = []
    for i in range(n):
        item = ds[i]
        frames.append(item[B.lr])
        metas.append((item[B.filename], float(item[B.min]), float(item[B.max])))
    frames = np.stack(frames)

    if generator_type in FUSION_GENERATORS:
        extras = (ds.elevation_data, ds.mask_hr)
    else:
        extras = None

    # Multi-chip whole-globe mode: H-shard every frame over the device mesh
    # with one halo exchange (parallel/halo.py) — all chips jointly produce
    # one output frame, the conv-net analogue of sequence parallelism.
    n_dev = len(jax.devices())
    if spatial_shard:
        if n_dev > 1 and frames.shape[1] % n_dev == 0:
            from climsr_tpu.parallel.halo import spatial_sharded_apply_multi
            from climsr_tpu.parallel.mesh import create_mesh

            mesh = create_mesh(axes=("data",))
            # the reflect edge-padding draws from the shard's own rows, so the
            # halo cannot exceed the per-device slice minus one
            spatial_halo = min(spatial_halo, frames.shape[1] // n_dev - 1)
            # pre-upscaled generators consume an HR-sized frame (HR in, HR
            # out) -> output/input row ratio 1; the rest upsample by
            # scaling_factor and take HR-sized elevation/mask extras
            from climsr_tpu.models import PRE_UPSCALED_GENERATORS

            out_scale = 1 if generator_type in PRE_UPSCALED_GENERATORS else scaling_factor
            scales = (1, out_scale, out_scale) if extras is not None else (1,)
            shard_fn = gen_fn
            if hasattr(model, "spatial_axis"):
                # global-pooling models (RCAN channel attention): clone with
                # the mesh axis so the pool psums over the whole frame instead
                # of each shard's local window (see models/rcan.py CALayer)
                shard_fn = make_generator_fn(
                    model.clone(spatial_axis="data", spatial_halo=spatial_halo),
                    params, generator_type,
                )
            sharded_fn = spatial_sharded_apply_multi(
                shard_fn, mesh, halo=spatial_halo, scale=out_scale, input_scales=scales
            )
            logger.info(
                "spatial-sharded whole-frame SR over %d devices (halo=%d LR rows)",
                n_dev, spatial_halo,
            )
            sr_frames = whole_frame_sr(sharded_fn, frames, extras=extras, batch_size=batch_size)
            return _write_outputs(sr_frames, metas, scaler, mask_np, mask_profile, out_dir, written)
        logger.warning(
            "inference.spatial_shard requested but %d device(s) / H=%d not shardable; "
            "falling back to the tiled path", n_dev, frames.shape[1],
        )

    # Auto-tile big frames: whole-frame SR of the 360x720 CRU-TS grid would
    # allocate HR-sized 1-channel activations that XLA lane-pads 128x (63 MB
    # -> 7.9 GB at batch 8, measured OOM). Tile geometry measured on v5e
    # (equal-pixel batches, bf16, nb=11): 32x32 tiles run at 133 Mpix-HR/s,
    # 64x64 at 70.1 (Pallas trunk; 34.2 on the XLA trunk), 128x128 at
    # 63.3 Pallas (the fused-RDB kernel raises its own scoped-VMEM limit, so
    # 16384-px tiles are eligible; 31.3 on the XLA trunk). 128px tiles with
    # 8px overlap carry only (144/128)^2 = 1.27x overlap redundancy vs 1.56x
    # for 64/8, so they give the best *effective* rate: ~49.9 vs 39.4
    # Mpix-HR/s (+27%), and still ~24.7 effective on the XLA trunk
    # (non-ESRGAN generators) vs 22.0 at 64/8.
    lr_pixels = frames.shape[1] * frames.shape[2]
    if tile_size is None and lr_pixels > 160 * 160:
        tile_size = 128
        tile_overlap = min(tile_overlap, 8)
        logger.info("frame %dx%d: using overlap-tiled SR (tile=%d, overlap=%d)",
                    frames.shape[1], frames.shape[2], tile_size, tile_overlap)

    if tile_size and (frames.shape[1] > tile_size or frames.shape[2] > tile_size):
        # srcnn consumes a pre-upscaled frame (HR in, HR out): its tiles come
        # back at input size, so the tiler's scale is 1, not scaling_factor
        from climsr_tpu.models import PRE_UPSCALED_GENERATORS

        out_scale = 1 if generator_type in PRE_UPSCALED_GENERATORS else scaling_factor
        # f16 readback: halves device->host bytes on the thin link (~5e-4
        # relative error on the [-1,1]-normalized output, before denormalize)
        # chunk size scales inversely with tile area (HBM + Mosaic compile
        # time both grow with tiles-in-flight x tile pixels); capped at 64
        # tiles in flight — larger tiled jits measured >28 min remote compile
        chunk = min(64, max(1, (batch_size * 8 * 64 * 64) // (tile_size * tile_size)))
        # Ship only the LAND pixels: the e2e sweep is bound by the
        # device->host link (measured 17 MB/s over the tunnel; an 8.3 MB f16
        # globe frame = ~0.5 s/frame) and by single-core host time for the
        # full-frame denorm + ocean-mask passes (~0.45 s/frame). The static
        # land gather cuts readback 3.4x on real CRU-TS (land fraction ~29%)
        # and shrinks the writer's denorm pass proportionally. The f16
        # readback stays in the NORMALIZED [-1,1] domain (the writer
        # denormalizes the packed vector in f32): casting after a device-side
        # denorm would quantize absolute physical units instead — ~0.125
        # worst-case at Kelvin magnitudes vs ~5e-4-relative here.
        land_idx = np.flatnonzero(np.asarray(mask_np).ravel()).astype(np.int32)
        use_pack = land_idx.size < mask_np.size  # degenerate all-land masks: skip
        use_pack12 = use_pack and readback == "pack12"

        tiler = TiledSR(
            gen_fn, scale=out_scale, tile_size=tile_size, overlap=tile_overlap,
            batch_size=chunk, output_dtype=jnp.float16,
            pack_indices=land_idx if use_pack else None, pack12=use_pack12,
        )
        tiler.set_extras(extras)  # elevation/mask are frame-invariant: upload once
        # The assembled LR frames carry [climate, elevation_lr, mask_lr]
        # channels (inference/datasets.py) — only channel 0 varies by month.
        # Verified invariant across the series, the trailing channels upload
        # ONCE and per-frame host->device traffic drops to the 1-channel
        # climate frame (3x fewer uplink bytes on the tunnel-bound sweep).
        if frames.shape[-1] > 1 and all(
            np.array_equal(frames[0, ..., 1:], frames[i, ..., 1:])
            for i in (frames.shape[0] // 2, frames.shape[0] - 1)
        ):
            tiler.set_static_lr_channels(frames[0, ..., 1:])
            frames = frames[..., :1]
        return _pipelined_tiled_sweep(
            tiler, frames, metas, scaler, mask_np, mask_profile, out_dir, written,
            out_scale, land_idx=land_idx if use_pack else None, pack12=use_pack12,
        )
    sr_frames = whole_frame_sr(gen_fn, frames, extras=extras, batch_size=batch_size)
    return _write_outputs(sr_frames, metas, scaler, mask_np, mask_profile, out_dir, written)


def _denormalize(scaler, arr: np.ndarray, vmin: float, vmax: float) -> np.ndarray:
    """Scaler-family-aware denormalization: z-score needs no per-frame range."""
    if isinstance(scaler, StandardScaler):
        return scaler.denormalize(arr)
    return scaler.denormalize(arr, vmin, vmax)


def _pipelined_tiled_sweep(
    tiler, frames, metas, scaler, mask_np, mask_profile, out_dir, written,
    scaling_factor: int, max_in_flight: int = 3, land_idx: Optional[np.ndarray] = None,
    group_size: int = 8, pack12: bool = False,
) -> List[str]:
    """Overlap the device sweep with host IO (round-2 finding: serial host
    writes left the chip idle at 0.20 months/s).

    Frames go to the device in GROUPS of ``group_size`` (one jit dispatch and
    one device->host readback per group — the per-call round-trip measured
    ~25 ms over the tunnel, as long as one frame's whole transport, so
    grouping amortizes it ~8x). The main thread only *dispatches* (async,
    device array returned immediately); a writer pool pulls each group to
    host (blocking THAT thread on the device->host link, not the dispatch
    loop), denormalizes in f32 and writes the GeoTIFFs. With ``land_idx``
    the readback is the packed land-pixel matrix, so the denorm pass covers
    only land pixels (~29% on real CRU-TS) and the scatter into a NaN canvas
    replaces the full-frame ocean-mask pass. ``max_in_flight`` bounds
    device-resident output groups (~19 MB f16 per packed global group).
    The final short group is padded by repeating the last frame (keeps the
    single compiled shape); its padded outputs are dropped host-side.
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    h, w = frames.shape[1], frames.shape[2]
    hr_h, hr_w = h * scaling_factor, w * scaling_factor
    profile = GeoProfile(
        width=hr_w, height=hr_h,
        origin_x=mask_profile.origin_x, origin_y=mask_profile.origin_y,
        pixel_size_x=mask_profile.pixel_size_x, pixel_size_y=mask_profile.pixel_size_y,
        nodata=np.nan,
    )
    mask_bool = np.asarray(mask_np, bool)
    n = frames.shape[0]
    k = min(group_size, n)

    if pack12:
        from climsr_tpu.ops.pack12 import unpack12

    def write_group(i0, count, dev_out):
        host = np.asarray(dev_out)  # ONE readback per group on this thread
        paths = []
        for j in range(count):
            filename, vmin, vmax = metas[i0 + j]
            # promote the f16 readback to f32 BEFORE denormalizing: the
            # transport dtype quantizes the NORMALIZED [-1,1] values (~5e-4
            # relative); denormalizing first and casting after would quantize
            # absolute physical units instead (ulp 0.25 at Kelvin magnitudes)
            if land_idx is not None:
                if pack12:
                    vals = unpack12(host[j], land_idx.size)
                else:
                    vals = host[j].astype(np.float32)  # packed land pixels
                vals = _denormalize(scaler, vals, vmin, vmax)
                arr = np.full((hr_h, hr_w), np.nan, np.float32)
                arr.ravel()[land_idx] = vals
            else:
                arr = host[j][:hr_h, :hr_w].astype(np.float32)
                arr = _denormalize(scaler, arr, vmin, vmax)
                arr = np.where(mask_bool, arr, np.nan).astype(np.float32)
            out_path = os.path.join(out_dir, filename)
            write_geotiff(out_path, arr, profile)
            paths.append(out_path)
        return paths

    group_paths: List[Optional[List[str]]] = [None] * (-(-n // k))
    pending: "deque" = deque()
    with ThreadPoolExecutor(max_workers=2) as pool:
        for gi, i0 in enumerate(range(0, n, k)):
            chunk = frames[i0 : i0 + k]
            count = chunk.shape[0]
            if count < k:  # pad the tail group to the compiled shape
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], k - count, axis=0)])
            dev_out = tiler.device_call_many(chunk)
            pending.append((gi, pool.submit(write_group, i0, count, dev_out)))
            if len(pending) >= max_in_flight:
                j, fut = pending.popleft()
                group_paths[j] = fut.result()
        while pending:
            j, fut = pending.popleft()
            group_paths[j] = fut.result()
    for paths in group_paths:
        written.extend(paths)
    return written


def _write_outputs(sr_frames, metas, scaler, mask_np, mask_profile, out_dir, written) -> List[str]:
    """Denormalize + ocean-mask each SR frame and write one GeoTIFF per month."""
    profile = GeoProfile(
        width=sr_frames.shape[2],
        height=sr_frames.shape[1],
        origin_x=mask_profile.origin_x,
        origin_y=mask_profile.origin_y,
        pixel_size_x=mask_profile.pixel_size_x,
        pixel_size_y=mask_profile.pixel_size_y,
        nodata=np.nan,
    )
    for i, (filename, vmin, vmax) in enumerate(metas):
        arr = _denormalize(scaler, sr_frames[i][..., 0], vmin, vmax)
        arr = np.where(mask_np, arr, np.nan).astype(np.float32)
        out_path = os.path.join(out_dir, filename)
        write_geotiff(out_path, arr, profile)
        written.append(out_path)
    return written


def run_inference(cfg: InferenceConfig, cruts_variables: List[str], generator_kwargs: Optional[dict] = None) -> None:
    # loop-invariant: one checkpoint load / stats read for all variables
    model, params = load_generator(cfg.pretrained_model, cfg.generator_type, generator_kwargs)
    min_max_all = pd.read_feather(cfg.min_max_lookup)
    for var in cruts_variables:
        out_path = os.path.join(cfg.inference_out_path, var)
        os.makedirs(out_path, exist_ok=True)
        logger.info("Running inference for variable: %s with model: %s", var, cfg.pretrained_model)

        min_max_lookup = min_max_all[
            (min_max_all[D.dataset] == "cru-ts") & (min_max_all[D.variable] == var)
        ]

        if cfg.use_netcdf_datasets:
            ds = CRUTSInferenceDataset(
                ds_path=cfg.ds_path,
                elevation_file=cfg.elevation_file,
                land_mask_file=cfg.land_mask_file,
                generator_type=cfg.generator_type,
                scaling_factor=cfg.scaling_factor,
                normalize=cfg.normalize,
                standardize=not cfg.normalize,
                standardize_stats=pd.read_feather(cfg.zscore_lookup) if not cfg.normalize else None,
                normalize_range=tuple(cfg.normalization_range),
                use_elevation=cfg.use_elevation,
                use_mask=cfg.use_mask,
            )
        else:
            ds = GeoTiffInferenceDataset(
                tiff_dir=os.path.join(cfg.tiff_dir, var),
                tiff_df=min_max_lookup,
                variable=var,
                elevation_file=cfg.elevation_file,
                land_mask_file=cfg.land_mask_file,
                generator_type=cfg.generator_type,
                scaling_factor=cfg.scaling_factor,
                normalize=cfg.normalize,
                standardize=not cfg.normalize,
                standardize_stats=pd.read_feather(cfg.zscore_lookup) if not cfg.normalize else None,
                normalize_range=tuple(cfg.normalization_range),
                use_elevation=cfg.use_elevation,
                use_mask=cfg.use_mask,
                use_global_min_max=cfg.use_global_min_max,
            )

        inference_on_full_images(
            model,
            params,
            ds,
            out_dir=out_path,
            generator_type=cfg.generator_type,
            normalization_range=tuple(cfg.normalization_range),
            batch_size=cfg.batch_size,
            tile_size=cfg.tile_size,
            tile_overlap=cfg.tile_overlap,
            scaling_factor=cfg.scaling_factor,
            spatial_shard=cfg.spatial_shard,
            spatial_halo=cfg.spatial_halo,
            readback=getattr(cfg, "readback", "pack12"),
        )
        logger.info("Inference for variable %s finished.", var)


def transform_tiff_files_to_net_cdf(
    tiff_dir: str,
    nc_out_path: str,
    cruts_variables: List[str],
    prefix: str = "inference",
) -> None:
    os.makedirs(nc_out_path, exist_ok=True)
    for var in cruts_variables:
        fps = sorted(glob(os.path.join(tiff_dir, var, "*.tif")))
        if not fps:
            logger.warning("No GeoTIFFs for %s under %s", var, tiff_dir)
            continue
        timestamps = []
        arrs = []
        profile = None
        for fp in fps:
            name = os.path.basename(fp).replace(".tif", "")
            m = re.search(r"(\d{4}-\d{2}-\d{2})$", name)
            timestamps.append(np.datetime64(m.group(1) if m else "1901-01-01"))
            arr, profile = read_geotiff(fp)
            arrs.append(arr)
        h, w = arrs[0].shape
        # GeoTIFF rasters are north-up (row 0 = origin_y); CRU-TS NetCDF
        # stores lat ASCENDING from the south — flip the rows so the export
        # matches the real CRU-TS convention (and our own reader, which
        # flipud's each frame on load, inference/datasets.py)
        lat = (profile.origin_y - (np.arange(h) + 0.5) * profile.pixel_size_y)[::-1].copy()
        lon = profile.origin_x + (np.arange(w) + 0.5) * profile.pixel_size_x
        arrs = [a[::-1] for a in arrs]
        series = stack_monthly_rasters(arrs, timestamps, lat, lon, var)
        out = os.path.join(nc_out_path, f"{prefix}.cru_ts4.05.nn.inference.1901.2020.{var}.dat.nc")
        write_climate_series(
            out,
            series,
            title=f"CRU TS4.05 {D.var_to_variable.get(var, var)}",
        )
        logger.info("Wrote %s", out)
