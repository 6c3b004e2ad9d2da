# -*- coding: utf-8 -*-
"""Device-side tensor ops: resize, pixel shuffle, padding; Pallas kernels in ``ops.pallas``."""
from climsr_tpu.ops.resize import (  # noqa: F401
    nearest_downsample,
    nearest_upsample,
    resize_bicubic,
    resize_nearest,
)
from climsr_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle  # noqa: F401
