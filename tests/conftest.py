# -*- coding: utf-8 -*-
"""Test config: run JAX on a virtual 8-device CPU mesh so sharding paths are testable.

NOTE: on this image the axon TPU plugin ignores the JAX_PLATFORMS env var;
the only reliable switch is jax.config, applied before first backend use.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
