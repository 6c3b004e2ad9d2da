# -*- coding: utf-8 -*-
"""Pallas fused-RDB kernel: exactness vs the pure-JAX reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climsr_tpu.ops.pallas.rdb import fused_rdb, rdb_reference


def _weights(rng, nf=16, gc=8):
    ws = []
    for cin in (nf, nf + gc, nf + 2 * gc, nf + 3 * gc):
        ws.append(jnp.asarray(rng.normal(size=(3, 3, cin, gc)).astype(np.float32) * 0.1))
        ws.append(jnp.asarray(rng.normal(size=(gc,)).astype(np.float32) * 0.1))
    ws.append(jnp.asarray(rng.normal(size=(3, 3, nf + 4 * gc, nf)).astype(np.float32) * 0.1))
    ws.append(jnp.asarray(rng.normal(size=(nf,)).astype(np.float32) * 0.1))
    return ws


def test_fused_rdb_matches_reference(rng):
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 16)).astype(np.float32))
    ws = _weights(rng)
    got = fused_rdb(x, *ws)
    want = rdb_reference(x, *ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_rdb_batch_tile_remainder(rng):
    # batch 6 with batch_tile 8 -> falls back to a divisor tile
    x = jnp.asarray(rng.normal(size=(6, 8, 8, 16)).astype(np.float32))
    ws = _weights(rng)
    got = fused_rdb(x, *ws)
    want = rdb_reference(x, *ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_rdb_gradients_via_reference_bwd(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    ws = _weights(rng)
    g = jax.grad(lambda x, *ws: jnp.sum(fused_rdb(x, *ws) ** 2))(x, *ws)
    gref = jax.grad(lambda x, *ws: jnp.sum(rdb_reference(x, *ws) ** 2))(x, *ws)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref), atol=1e-3)
