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


def run(cfg: InferenceConfig, generator_kwargs: Optional[dict] = None) -> None:
    variables = [cfg.cruts_variable] if cfg.cruts_variable else consts.cruts.variables_cts
    if cfg.run_inference:
        run_inference(cfg, variables, generator_kwargs)
    if cfg.to_netcdf:
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
