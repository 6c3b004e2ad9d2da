# -*- coding: utf-8 -*-
"""Model shape-contract tests, mirroring the reference's tests/models suite
(e.g. ESRGAN: lr(N,32,32,2)+elev/mask(N,128,128,1) -> (N,128,128,1)) but on
synthetic CPU-resident data with small batches."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climsr_tpu.models import (
    DRLN,
    RCAN,
    SRCNN,
    Discriminator,
    ESRGANGenerator,
    RFBESRGANDiscriminator,
    RFBESRGANGenerator,
    apply_generator,
    create_generator,
)

N, LR_SIZE, HR_SIZE = 2, 32, 128


def _rng():
    return jax.random.PRNGKey(0)


def test_srcnn_shapes():
    # srcnn consumes the pre-upscaled input at HR size (3ch: data+elev+mask)
    m = SRCNN(out_channels=1)
    x = jnp.zeros((N, HR_SIZE, HR_SIZE, 3))
    var = m.init(_rng(), x)
    out = m.apply(var, x)
    assert out.shape == (N, HR_SIZE, HR_SIZE, 1)


@pytest.mark.parametrize("use_elev,use_mask", [(True, True), (False, False), (True, False)])
def test_esrgan_shapes(use_elev, use_mask):
    in_ch = 1 + use_elev + use_mask
    m = ESRGANGenerator(out_channels=1, nf=32, nb=2, gc=8)
    x = jnp.zeros((N, LR_SIZE, LR_SIZE, in_ch))
    elev = jnp.zeros((N, HR_SIZE, HR_SIZE, 1))
    mask = jnp.zeros((N, HR_SIZE, HR_SIZE, 1))
    var = m.init(_rng(), x, elev, mask)
    out = m.apply(var, x, elev, mask)
    assert out.shape == (N, HR_SIZE, HR_SIZE, 1)


def test_rcan_shapes():
    m = RCAN(n_resgroups=2, n_resblocks=2, n_feats=16, out_channels=1)
    x = jnp.zeros((N, LR_SIZE, LR_SIZE, 3))
    elev = jnp.zeros((N, HR_SIZE, HR_SIZE, 1))
    mask = jnp.zeros((N, HR_SIZE, HR_SIZE, 1))
    var = m.init(_rng(), x, elev, mask)
    out = m.apply(var, x, elev, mask)
    assert out.shape == (N, HR_SIZE, HR_SIZE, 1)


def test_drln_shapes():
    m = DRLN(out_channels=1, channels=16)
    x = jnp.zeros((1, 8, 8, 1))
    var = m.init(_rng(), x)
    out = m.apply(var, x)
    assert out.shape == (1, 32, 32, 1)


@pytest.mark.e2e
def test_rfb_esrgan_generator_shapes():
    m = RFBESRGANGenerator(out_channels=1, num_rrdb_blocks=1, num_rrfdb_blocks=1)
    # random input — a zeros input makes the tanh bound vacuous (every conv
    # with zero-init bias outputs exactly 0 whether or not tanh exists)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 8, 3)).astype(np.float32)) * 3.0
    var = m.init(_rng(), x)
    out = m.apply(var, x)
    assert out.shape == (1, 32, 32, 1)
    # tanh output bounded, and genuinely exercised (non-degenerate output)
    assert float(jnp.abs(out).max()) <= 1.0
    assert float(jnp.abs(out).max()) > 0.0


def test_discriminator_logits_shape():
    m = Discriminator(in_channels=1)
    x = jnp.zeros((N, HR_SIZE, HR_SIZE, 1))
    var = m.init(_rng(), x, train=False)
    out = m.apply(var, x, train=False)
    assert out.shape == (N, 1)


def test_rfb_discriminator_sigmoid_output(rng):
    # 64x64 input: the adaptive pool to 14x14 makes the FC head size-invariant
    m = RFBESRGANDiscriminator(in_channels=1)
    x = jnp.asarray(rng.normal(size=(N, 64, 64, 1)).astype(np.float32))
    var = m.init(_rng(), x, train=False)
    out = m.apply(var, x, train=False)
    assert out.shape == (N, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_discriminator_batchnorm_mutable_train():
    m = Discriminator(in_channels=1)
    x = jnp.ones((N, HR_SIZE, HR_SIZE, 1))
    var = m.init(_rng(), x, train=True)
    out, updates = m.apply(var, x, train=True, mutable=["batch_stats"])
    assert out.shape == (N, 1)
    assert "batch_stats" in updates


def test_registry_dispatch(rng):
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    elev = jnp.zeros((1, 64, 64, 1))
    mask = jnp.ones((1, 64, 64, 1))
    m = create_generator("esrgan", nf=16, nb=1, gc=8, out_channels=1)
    var = m.init(_rng(), x, elev, mask)
    out = apply_generator("esrgan", m, var, x, elev, mask)
    assert out.shape == (1, 64, 64, 1)

    m2 = create_generator("srcnn", out_channels=1)
    xs = jnp.zeros((1, 64, 64, 3))
    var2 = m2.init(_rng(), xs)
    out2 = apply_generator("srcnn", m2, var2, xs)
    assert out2.shape == (1, 64, 64, 1)


def test_create_generator_unknown_name():
    with pytest.raises(KeyError):
        create_generator("nope")


def test_esrgan_bf16_compute_f32_params():
    m = ESRGANGenerator(out_channels=1, nf=16, nb=1, gc=8, dtype=jnp.bfloat16)
    x = jnp.zeros((1, 8, 8, 3), jnp.bfloat16)
    elev = jnp.zeros((1, 32, 32, 1), jnp.bfloat16)
    mask = jnp.zeros((1, 32, 32, 1), jnp.bfloat16)
    var = m.init(_rng(), x, elev, mask)
    leaves = jax.tree_util.tree_leaves(var["params"])
    assert all(p.dtype == jnp.float32 for p in leaves)
    out = m.apply(var, x, elev, mask)
    assert out.dtype == jnp.bfloat16


def test_esrgan_concat_free_matches_naive(rng):
    """SplitConcatConv RDB == naive concat RDB: same param tree, same numbers."""
    import jax
    import jax.numpy as jnp

    from climsr_tpu.models import create_generator

    kw = dict(nf=16, nb=2, gc=8, out_channels=1)
    fast = create_generator("esrgan", concat_free=True, **kw)
    naive = create_generator("esrgan", concat_free=False, **kw)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    elev = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    mask = jnp.ones((2, 32, 32, 1), np.float32)
    params = fast.init(jax.random.PRNGKey(0), x, elev, mask)["params"]
    p2 = naive.init(jax.random.PRNGKey(0), x, elev, mask)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    a = fast.apply({"params": params}, x, elev, mask)
    b = naive.apply({"params": params}, x, elev, mask)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
