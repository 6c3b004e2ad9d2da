#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Training entry point (reference parity: train.py).

    python train.py experiment=esrgan_pre_training [key=value ...]
"""
from climsr_tpu.cli.train import main

if __name__ == "__main__":
    main()
