"""climsr_tpu — a TPU-native JAX/Flax framework for neural climate downscaling.

A from-scratch rebuild of the capabilities of ``xultaeculcis/climate-super-resolution``
(single-image super-resolution of monthly climate rasters: WorldClim-trained 4x SR
applied to the CRU-TS 1901-2020 series), designed TPU-first:

- NHWC tensors, bfloat16 compute, float32 params
- models as pure flax.linen modules compiled with ``jax.jit``
- data parallelism + sharded optimizer state over a ``jax.sharding.Mesh``
- host-side raster ETL feeding double-buffered device-resident batches
- overlap-tiled, statically-shaped whole-globe inference

Layer map mirrors the reference (see SURVEY.md §1): consts → config → data →
models/losses/metrics → training tasks → inference/preprocessing CLIs.
"""

__version__ = "0.1.0"
