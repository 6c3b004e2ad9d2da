# -*- coding: utf-8 -*-
"""Data layer: normalization, tile index, datasets, datamodule, device pipeline."""
