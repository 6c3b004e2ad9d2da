# -*- coding: utf-8 -*-
"""Preprocessing CLI: runs the 7 ETL steps in order.

Parity: reference ``climsr/cli/preprocess.py`` (its Dask cluster is replaced
by the process pools inside each step).
"""
from __future__ import annotations

import logging
import sys
import time
from typing import List, Optional

from climsr_tpu.config.compose import compose, default_config_dir
from climsr_tpu.config.schemas import PreProcessingConfig, from_dict
from climsr_tpu.preprocessing import preprocessing

logger = logging.getLogger(__name__)


def run(cfg: PreProcessingConfig) -> None:
    t0 = time.time()
    preprocessing.run_cruts_to_tiff(cfg)
    preprocessing.run_world_clim_resize(cfg)
    preprocessing.run_tavg_rasters_generation(cfg)
    preprocessing.run_world_clim_tiling(cfg)
    preprocessing.run_statistics_computation(cfg)
    preprocessing.run_train_val_test_split(cfg)
    preprocessing.run_extent_extraction(cfg)
    logger.info("Preprocessing finished in %.1fs", time.time() - t0)


def main(argv: Optional[List[str]] = None) -> None:
    logging.basicConfig(level=logging.INFO)
    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = compose(default_config_dir(), "preprocessing", overrides)
    run(from_dict(PreProcessingConfig, cfg.get("preprocessing") or cfg))


if __name__ == "__main__":
    main()
