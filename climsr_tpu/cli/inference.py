# -*- coding: utf-8 -*-
"""Inference CLI. Parity: reference ``climsr/cli/inference.py`` — per-variable
SR over the CRU-TS series, then GeoTIFF -> NetCDF export."""
from __future__ import annotations

import logging
import sys
from typing import List, Optional

import climsr_tpu.consts as consts
from climsr_tpu.config.compose import compose, default_config_dir
from climsr_tpu.config.schemas import InferenceConfig, from_dict
from climsr_tpu.inference.run import run_inference, transform_tiff_files_to_net_cdf

logger = logging.getLogger(__name__)


def _require(cfg: InferenceConfig, *names: str) -> None:
    """Fail fast on mandatory ('???') values instead of letting the literal
    string propagate into file paths / the generator registry — and instead of
    failing at the to_netcdf step AFTER the expensive inference pass."""
    missing = [n for n in names if getattr(cfg, n, None) in (None, "???")]
    if missing:
        raise ValueError(
            "Missing mandatory inference config value(s): "
            + ", ".join(f"inference.{n}" for n in missing)
        )


def run(cfg: InferenceConfig, generator_kwargs: Optional[dict] = None) -> None:
    # NOTE on reference parity: `temp_only` and `extract_polygon_extent` are
    # declared-but-never-read knobs in the reference too (config.py:199,217 —
    # no consumer anywhere); they are carried for config-surface parity only.
    # Variable selection is cruts_variable (null = all CRU-TS variables),
    # exactly like the reference CLI (cli/inference.py:17).
    variables = [cfg.cruts_variable] if cfg.cruts_variable else consts.cruts.variables_cts
    if cfg.run_inference:
        # the input-source knob depends on the dataset mode: the NetCDF path
        # reads ds_path, the (default) GeoTIFF path reads tiff_dir and never
        # touches ds_path (run_inference branches on use_netcdf_datasets)
        source = "ds_path" if cfg.use_netcdf_datasets else "tiff_dir"
        _require(
            cfg, "pretrained_model", "generator_type", source,
            "elevation_file", "land_mask_file", "min_max_lookup", "inference_out_path",
        )
        if not cfg.normalize:  # z-score mode reads the stats feather up front
            _require(cfg, "zscore_lookup")
    if cfg.to_netcdf:
        _require(cfg, "extent_out_path_sr_nc")
    if cfg.run_inference:
        run_inference(cfg, variables, generator_kwargs)
    if cfg.to_netcdf:
        # Documented deviation: the reference converts GeoTIFFs from
        # `extent_out_path_sr` (cli/inference.py:30) — a directory NO reference
        # code path ever writes (its producer, extract_polygon_extent, is a
        # declared-but-never-read knob there). We convert this run's actual SR
        # output instead, which is the only self-consistent pipeline.
        transform_tiff_files_to_net_cdf(
            cfg.inference_out_path,
            cfg.extent_out_path_sr_nc,
            variables,
            prefix=cfg.generator_type,
        )


def main(argv: Optional[List[str]] = None) -> None:
    logging.basicConfig(level=logging.INFO)
    from climsr_tpu.utils.core import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = compose(default_config_dir(), "inference", overrides)
    inference_cfg = from_dict(InferenceConfig, cfg.get("inference") or cfg)
    run(inference_cfg, generator_kwargs=cfg.get("generator"))


if __name__ == "__main__":
    main()
