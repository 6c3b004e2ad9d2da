#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Data-preparation entry point (reference parity: data_preparation.py).

Chains dataset download and preprocessing behind flags whose defaults come
from ``conf/data_preparation.yaml`` (reference parity):
    python data_preparation.py run_download=true run_preprocessing=true [key=value ...]
"""
import sys

import yaml


def main() -> None:
    from climsr_tpu.config.compose import compose, default_config_dir

    argv = sys.argv[1:]
    flags = {}
    passthrough = []
    for item in argv:
        key, _, raw = item.partition("=")
        if key in ("run_download", "run_preprocessing"):
            flags[key] = yaml.safe_load(raw)
        else:
            passthrough.append(item)

    # flag defaults come from conf/data_preparation.yaml; CLI overrides win
    cfg = compose(default_config_dir(), "data_preparation", [])
    run_download = flags.get("run_download", cfg.get("run_download", True))
    run_preprocessing = flags.get("run_preprocessing", cfg.get("run_preprocessing", True))

    if run_download:
        from climsr_tpu.cli.data_download import main as download_main

        download_main(passthrough)
    if run_preprocessing:
        from climsr_tpu.cli.preprocess import main as preprocess_main

        preprocess_main(passthrough)


if __name__ == "__main__":
    main()
