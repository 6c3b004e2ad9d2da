#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Data-preparation entry point (reference parity: data_preparation.py).

Chains dataset download and preprocessing behind flags:
    python data_preparation.py run_download=true run_preprocessing=true [key=value ...]
"""
import sys

import yaml


def main() -> None:
    argv = sys.argv[1:]
    flags = {}
    passthrough = []
    for item in argv:
        key, _, raw = item.partition("=")
        if key in ("run_download", "run_preprocessing"):
            flags[key] = yaml.safe_load(raw)
        else:
            passthrough.append(item)

    if flags.get("run_download", False):
        from climsr_tpu.cli.data_download import main as download_main

        download_main(passthrough)
    if flags.get("run_preprocessing", True):
        from climsr_tpu.cli.preprocess import main as preprocess_main

        preprocess_main(passthrough)


if __name__ == "__main__":
    main()
