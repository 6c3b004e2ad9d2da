# -*- coding: utf-8 -*-
"""Pallas fused kernels: exactness vs the pure-JAX reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climsr_tpu.ops.pallas.rdb import cl_to_nhwc, fused_rdb, fused_rdb_t, nhwc_to_cl, rdb_reference


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


def test_fused_rdb_t_matches_reference(rng):
    # transposed-layout v3 kernel, non-square spatial + remainder batch tile
    n, h, w = 3, 8, 16
    x = jnp.asarray(rng.normal(size=(n, h, w, 16)).astype(np.float32))
    ws = _weights(rng)
    got = cl_to_nhwc(fused_rdb_t(nhwc_to_cl(x), h, w, *ws, 2), n, h, w)
    want = rdb_reference(x, *ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_rdb_t_gradients_via_reference_bwd(rng):
    n, h, w = 2, 8, 8
    x = jnp.asarray(rng.normal(size=(n, h, w, 16)).astype(np.float32))
    ws = _weights(rng)
    xt = nhwc_to_cl(x)
    g = jax.grad(lambda xt, *ws: jnp.sum(fused_rdb_t(xt, h, w, *ws, 1) ** 2))(xt, *ws)
    gref = jax.grad(lambda xt, *ws: jnp.sum(nhwc_to_cl(rdb_reference(cl_to_nhwc(xt, n, h, w), *ws)) ** 2))(
        xt, *ws
    )
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref), atol=1e-3)


def test_fused_rdb_t_weight_gradients(rng):
    """The fused Pallas backward's dW/db path (zbuf @ feat^T) vs autodiff of
    the reference — every weight and bias of all five convs."""
    n, h, w = 2, 8, 8
    x = jnp.asarray(rng.normal(size=(n, h, w, 16)).astype(np.float32))
    ws = _weights(rng)
    xt = nhwc_to_cl(x)
    argnums = tuple(range(len(ws) + 1))
    g = jax.grad(lambda xt, *ws: jnp.sum(fused_rdb_t(xt, h, w, *ws, 1) ** 2), argnums)(xt, *ws)
    gref = jax.grad(
        lambda xt, *ws: jnp.sum(nhwc_to_cl(rdb_reference(cl_to_nhwc(xt, n, h, w), *ws)) ** 2), argnums
    )(xt, *ws)
    for a, b in zip(g, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_fused_rdb_res_t_gradients(rng):
    """Residual-fused variant (x0 + 0.2*rdb(x)): grads wrt x, x0 and all weights."""
    from climsr_tpu.ops.pallas.rdb import fused_rdb_res_t

    n, h, w = 2, 8, 8
    x = jnp.asarray(rng.normal(size=(n, h, w, 16)).astype(np.float32))
    x0 = jnp.asarray(rng.normal(size=(n, h, w, 16)).astype(np.float32))
    ws = _weights(rng)
    xt, x0t = nhwc_to_cl(x), nhwc_to_cl(x0)
    argnums = tuple(range(len(ws) + 2))

    def ref(xt, x0t, *ws):
        return x0t + 0.2 * nhwc_to_cl(rdb_reference(cl_to_nhwc(xt, n, h, w), *ws))

    out = fused_rdb_res_t(xt, x0t, h, w, *ws, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref(xt, x0t, *ws)), atol=1e-4)
    g = jax.grad(lambda *a: jnp.sum(fused_rdb_res_t(a[0], a[1], h, w, *a[2:], 1) ** 2), argnums)(
        xt, x0t, *ws
    )
    gref = jax.grad(lambda *a: jnp.sum(ref(*a) ** 2), argnums)(xt, x0t, *ws)
    for a, b in zip(g, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_esrgan_use_pallas_matches_xla_path(rng):
    """Whole-model parity: the pallas trunk is numerically identical (params,
    forward, gradients) to the XLA path — checkpoints are interchangeable."""
    from climsr_tpu.models import create_generator

    m0 = create_generator("esrgan", nf=16, nb=2, gc=8, out_channels=1)
    m1 = create_generator("esrgan", nf=16, nb=2, gc=8, out_channels=1, use_pallas=True)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 3)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(2, 32, 64, 1)).astype(np.float32))
    mask = jnp.ones((2, 32, 64, 1), jnp.float32)
    v = m0.init(key, x, e, mask)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(m1.init(key, x, e, mask))
    a = m0.apply(v, x, e, mask)
    b = m1.apply(v, x, e, mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    g0 = jax.grad(lambda p: jnp.sum(m0.apply({"params": p}, x, e, mask) ** 2))(v["params"])
    g1 = jax.grad(lambda p: jnp.sum(m1.apply({"params": p}, x, e, mask) ** 2))(v["params"])
    jax.tree_util.tree_map(
        lambda u, z: np.testing.assert_allclose(np.asarray(u), np.asarray(z), atol=1e-4), g0, g1
    )


def test_fused_hr_tail_matches_reference(rng):
    from climsr_tpu.ops.pallas.head import fused_hr_tail, hr_tail_reference

    n, h, w = 2, 16, 24
    x = jnp.asarray(rng.normal(size=(n, h, w, 64)).astype(np.float32))
    whr = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32) * 0.1)
    bhr = jnp.asarray(rng.normal(size=(64,)).astype(np.float32) * 0.1)
    wcl = jnp.asarray(rng.normal(size=(3, 3, 64, 1)).astype(np.float32) * 0.1)
    bcl = jnp.asarray(rng.normal(size=(1,)).astype(np.float32) * 0.1)
    xt = jnp.transpose(x, (3, 0, 1, 2)).reshape(64, n * h * w)
    out_t = fused_hr_tail(xt, h, w, whr, bhr, wcl, bcl, 1)
    got = jnp.transpose(out_t.reshape(1, n, h, w), (1, 2, 3, 0))
    want = hr_tail_reference(x, (whr, bhr, wcl, bcl))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-3)

    g = jax.grad(lambda xt: jnp.sum(fused_hr_tail(xt, h, w, whr, bhr, wcl, bcl, 1) ** 2))(xt)
    gref = jax.grad(
        lambda xt: jnp.sum(
            hr_tail_reference(jnp.transpose(xt.reshape(64, n, h, w), (1, 2, 3, 0)), (whr, bhr, wcl, bcl))
            ** 2
        )
    )(xt)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gref), atol=1e-2)


def test_esrgan_use_pallas_falls_back_on_ineligible_shapes(rng):
    """Shapes the kernel doesn't cover (e.g. europe-extent 113x113) transparently
    use the XLA path — same module, same params."""
    from climsr_tpu.models import create_generator
    from climsr_tpu.models.esrgan import pallas_trunk_eligible

    assert not pallas_trunk_eligible(113, 113)
    m1 = create_generator("esrgan", nf=16, nb=1, gc=8, out_channels=1, use_pallas=True)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.normal(size=(1, 5, 5, 3)).astype(np.float32))
    e = jnp.asarray(rng.normal(size=(1, 20, 20, 1)).astype(np.float32))
    mask = jnp.ones((1, 20, 20, 1), jnp.float32)
    v = m1.init(key, x, e, mask)
    out = m1.apply(v, x, e, mask)
    assert out.shape == (1, 20, 20, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_fusion_conv1_pallas_bwd_matches_autodiff(rng):
    """ops/pallas/head_bwd.py: the fusion head's conv1 custom_vjp — forward
    and dW/db identical to stock autodiff; dX exact on channel 0 and ZERO on
    the conditioning channels (the documented contract); ineligible
    geometries fall back to the stock vjp for ALL channels."""
    from climsr_tpu.ops.pallas.head_bwd import conv9_dx_eligible, fusion_conv1, _conv_ref

    h, w = 8, 16  # h*w = 128: kernel-eligible in interpret mode
    assert conv9_dx_eligible(h, w, (9, 9, 3, 8))
    x = jnp.asarray(rng.normal(size=(2, h, w, 3)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(9, 9, 3, 8)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32) * 0.1)

    np.testing.assert_allclose(
        np.asarray(fusion_conv1(x, k, b)), np.asarray(_conv_ref(x, k, b, 4)), atol=1e-6
    )

    def loss(fn, x, k, b):
        return jnp.sum(jnp.tanh(fn(x, k, b)))

    gx, gk, gb = jax.grad(lambda *a: loss(fusion_conv1, *a), argnums=(0, 1, 2))(x, k, b)
    rx, rk, rb = jax.grad(lambda *a: loss(lambda x, k, b: _conv_ref(x, k, b, 4), *a),
                          argnums=(0, 1, 2))(x, k, b)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(rk), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gx[..., 0]), np.asarray(rx[..., 0]), atol=1e-4)
    assert float(jnp.max(jnp.abs(gx[..., 1:]))) == 0.0  # contract: dead channels

    # ineligible geometry (h*w % 128 != 0): full exact fallback on every channel
    x2 = jnp.asarray(rng.normal(size=(1, 7, 9, 3)).astype(np.float32))
    g2 = jax.grad(lambda v: jnp.sum(jnp.tanh(fusion_conv1(v, k, b))))(x2)
    r2 = jax.grad(lambda v: jnp.sum(jnp.tanh(_conv_ref(v, k, b, 4))))(x2)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(r2), atol=1e-5)


def test_srcnn_pallas_bwd_full_equivalence(rng):
    """SRCNN(pallas_bwd=True): identical param tree, forward, and parameter
    gradients to the stock module (the flagship trainer's fusion head)."""
    import jax.tree_util as jtu

    from climsr_tpu.models.srcnn import SRCNN

    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 3)).astype(np.float32))
    p0 = SRCNN(in_channels=3, out_channels=1).init(key, x)["params"]
    p1 = SRCNN(in_channels=3, out_channels=1, pallas_bwd=True).init(key, x)["params"]
    assert [jtu.keystr(kp) for kp, _ in jtu.tree_leaves_with_path(p0)] == [
        jtu.keystr(kp) for kp, _ in jtu.tree_leaves_with_path(p1)
    ]
    for a, bv in zip(jtu.tree_leaves(p0), jtu.tree_leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bv))

    y0 = SRCNN(in_channels=3, out_channels=1).apply({"params": p0}, x)
    y1 = SRCNN(in_channels=3, out_channels=1, pallas_bwd=True).apply({"params": p0}, x)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    def loss(params, m):
        return jnp.mean(jnp.abs(m.apply({"params": params}, x)))

    g0 = jax.grad(loss)(p0, SRCNN(in_channels=3, out_channels=1))
    g1 = jax.grad(loss)(p0, SRCNN(in_channels=3, out_channels=1, pallas_bwd=True))
    for a, bv in zip(jtu.tree_leaves(g0), jtu.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bv), atol=1e-6)
