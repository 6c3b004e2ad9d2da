# -*- coding: utf-8 -*-
"""Test config: run JAX on a virtual 8-device CPU mesh so sharding paths are testable.

NOTE: on this image the axon TPU plugin ignores the JAX_PLATFORMS env var;
the only reliable switch is jax.config, applied before first backend use.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# persistent compilation cache: repeat test runs skip XLA compiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
