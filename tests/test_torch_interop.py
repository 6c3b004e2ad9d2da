# -*- coding: utf-8 -*-
"""PyTorch checkpoint import: key mapping, layout transforms, numerics.

The SRCNN test checks *numerics* against a real torch forward (plain
``torch.nn.functional`` calls — validates the OIHW->HWIO transpose and the
padding semantics). The ESRGAN/RCAN/discriminator tests fabricate
reference-named state_dicts and require an exact structural match against the
flax models' ``init`` trees, then run a forward pass.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climsr_tpu.interop.torch_import import (
    _discriminator_spec,
    _esrgan_spec,
    _rcan_spec,
    import_discriminator_params,
    import_generator_params,
    split_pl_state_dict,
)
from climsr_tpu.models import create_discriminator, create_generator

torch = pytest.importorskip("torch")


def _flax_shapes(model, example_inputs):
    tree = jax.eval_shape(model.init, jax.random.PRNGKey(0), *example_inputs)
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, leaf in flat:
        keys = [str(p.key) for p in path]
        out["/".join(keys)] = leaf.shape
    return out


def _fabricate_sd(spec, shapes, rng):
    """Build a torch-layout state_dict matching the flax shapes via the spec."""
    sd = {}
    for tk, fp, kind in spec:
        if kind == "ignore":
            continue  # exercised separately (dead weights added by hand)
        if kind == "conv":
            kh, kw, i, o = shapes[f"params/{fp}/Conv_0/kernel"]
            sd[f"{tk}.weight"] = rng.normal(size=(o, i, kh, kw)).astype(np.float32)
            if f"params/{fp}/Conv_0/bias" in shapes:  # bias-free convs in RFB-ESRGAN
                sd[f"{tk}.bias"] = rng.normal(size=(o,)).astype(np.float32)
        elif kind == "dense":
            i, o = shapes[f"params/{fp}/Dense_0/kernel"]
            sd[f"{tk}.weight"] = rng.normal(size=(o, i)).astype(np.float32)
            sd[f"{tk}.bias"] = rng.normal(size=(o,)).astype(np.float32)
        elif kind == "bn":
            (c,) = shapes[f"params/{fp}/scale"]
            sd[f"{tk}.weight"] = rng.normal(size=(c,)).astype(np.float32)
            sd[f"{tk}.bias"] = rng.normal(size=(c,)).astype(np.float32)
            sd[f"{tk}.running_mean"] = rng.normal(size=(c,)).astype(np.float32)
            sd[f"{tk}.running_var"] = rng.uniform(0.5, 2.0, size=(c,)).astype(np.float32)
            sd[f"{tk}.num_batches_tracked"] = np.asarray(7, np.int64)
    return sd


def test_srcnn_import_numerics(rng):
    import torch.nn.functional as F

    model = create_generator("srcnn", in_channels=3, out_channels=1)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    sd = {
        "conv1.weight": rng.normal(size=(64, 3, 9, 9)).astype(np.float32) * 0.05,
        "conv1.bias": rng.normal(size=(64,)).astype(np.float32),
        "conv2.weight": rng.normal(size=(32, 64, 1, 1)).astype(np.float32) * 0.05,
        "conv2.bias": rng.normal(size=(32,)).astype(np.float32),
        "conv3.weight": rng.normal(size=(1, 32, 5, 5)).astype(np.float32) * 0.05,
        "conv3.bias": rng.normal(size=(1,)).astype(np.float32),
    }
    params = import_generator_params("srcnn", sd, model=model, example_inputs=(jnp.zeros((1, 16, 16, 3)),))
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    with torch.no_grad():
        y = F.relu(F.conv2d(xt, torch.from_numpy(sd["conv1.weight"]), torch.from_numpy(sd["conv1.bias"]), padding=4))
        y = F.relu(F.conv2d(y, torch.from_numpy(sd["conv2.weight"]), torch.from_numpy(sd["conv2.bias"]), padding=0))
        y = F.conv2d(y, torch.from_numpy(sd["conv3.weight"]), torch.from_numpy(sd["conv3.bias"]), padding=2)
    want = y.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_esrgan_import_structure_and_forward(rng):
    model = create_generator("esrgan", nf=16, nb=2, gc=8, out_channels=1)
    inputs = (jnp.zeros((1, 8, 8, 3)), jnp.zeros((1, 32, 32, 1)), jnp.zeros((1, 32, 32, 1)))
    shapes = _flax_shapes(model, inputs)
    probe = {"RRDB_trunk.1.RDB1.conv1.weight": None, "upconv2.weight": None}
    spec = _esrgan_spec(probe)
    sd = _fabricate_sd(spec, shapes, rng)
    params = import_generator_params("esrgan", sd, model=model, example_inputs=inputs)
    out = model.apply({"params": params}, *(jnp.asarray(np.ones(a.shape, np.float32)) for a in inputs))
    assert out.shape == (1, 32, 32, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_rcan_import_structure_and_forward(rng):
    model = create_generator("rcan", n_resgroups=2, n_resblocks=2, n_feats=16, reduction=4, out_channels=1)
    inputs = (jnp.zeros((1, 8, 8, 3)), jnp.zeros((1, 32, 32, 1)), jnp.zeros((1, 32, 32, 1)))
    shapes = _flax_shapes(model, inputs)
    probe = {
        "body.0.body.0.body.0.weight": None,
        "body.0.body.1.body.0.weight": None,
        "body.1.body.1.body.0.weight": None,
        "tail.0.0.weight": "x",
        "tail.0.2.weight": "x",
    }
    spec = _rcan_spec(probe)
    sd = _fabricate_sd(spec, shapes, rng)
    params = import_generator_params("rcan", sd, model=model, example_inputs=inputs)
    out = model.apply({"params": params}, *(jnp.asarray(np.ones(a.shape, np.float32)) for a in inputs))
    assert out.shape == (1, 32, 32, 1)


def test_drln_import_structure_and_forward(rng):
    from climsr_tpu.interop.torch_import import _drln_spec, detect_generator_type

    model = create_generator("drln", channels=16, out_channels=1)
    inputs = (jnp.zeros((1, 8, 8, 1)),)
    shapes = _flax_shapes(model, inputs)
    probe = {"upsample.up.body.0.weight": None, "upsample.up.body.3.weight": None}
    spec = _drln_spec(probe)
    sd = _fabricate_sd(spec, shapes, rng)
    # the dead c4 compressor exists in reference state_dicts; must be consumed silently
    sd["c4.body.0.weight"] = rng.normal(size=(16, 32, 3, 3)).astype(np.float32)
    sd["c4.body.0.bias"] = rng.normal(size=(16,)).astype(np.float32)
    assert detect_generator_type(sd) == "drln"
    params = import_generator_params("drln", sd, model=model, example_inputs=inputs)
    out = model.apply({"params": params}, jnp.ones((1, 8, 8, 1)))
    assert out.shape == (1, 32, 32, 1)


def test_discriminator_import_with_batch_stats(rng):
    model = create_discriminator("esrgan")
    inputs = (jnp.zeros((1, 128, 128, 1)),)
    shapes = _flax_shapes(model, inputs)
    probe = {f"feature_extraction.{7 * i + 3}.running_mean": None for i in range(4)}
    spec = _discriminator_spec(probe)
    sd = _fabricate_sd(spec, shapes, rng)
    params, batch_stats = import_discriminator_params(sd, model=model, example_inputs=inputs)
    out = model.apply(
        {"params": params, "batch_stats": batch_stats}, jnp.zeros((2, 128, 128, 1)), train=False
    )
    assert out.shape == (2, 1)


def test_rfb_esrgan_import_structure_and_forward(rng):
    from climsr_tpu.interop.torch_import import _rfb_esrgan_spec, detect_generator_type

    model = create_generator("rfb_esrgan", num_rrdb_blocks=1, num_rrfdb_blocks=1, out_channels=1)
    inputs = (jnp.zeros((1, 8, 8, 3)),)
    shapes = _flax_shapes(model, inputs)
    probe = {"Trunk_A.0.RDB1.conv1.0.weight": None, "Trunk_RFB.0.RFDB1.RFB1.shortcut.weight": None,
             "upsampling.5.weight": None}
    spec = _rfb_esrgan_spec(probe)
    sd = _fabricate_sd(spec, shapes, rng)
    assert detect_generator_type(sd) == "rfb_esrgan"
    params = import_generator_params("rfb_esrgan", sd, model=model, example_inputs=inputs)
    out = model.apply({"params": params}, jnp.ones((1, 8, 8, 3)))
    assert out.shape == (1, 32, 32, 1)


def test_rfb_discriminator_import(rng):
    model = create_discriminator("rfb_esrgan")
    inputs = (jnp.zeros((1, 64, 64, 1)),)
    shapes = _flax_shapes(model, inputs)
    probe = {"features.0.weight": None}
    from climsr_tpu.interop.torch_import import _rfb_discriminator_spec

    spec = _rfb_discriminator_spec(probe)
    sd = _fabricate_sd(spec, shapes, rng)
    params, batch_stats = import_discriminator_params(sd, model=model, example_inputs=inputs)
    out = model.apply({"params": params, "batch_stats": batch_stats}, jnp.zeros((2, 64, 64, 1)), train=False)
    assert out.shape == (2, 1)


def test_split_pl_state_dict():
    sd = {"generator.conv1.weight": 1, "discriminator.fc1.weight": 2, "generator.conv1.bias": 3}
    gen, disc = split_pl_state_dict(sd)
    assert set(gen) == {"conv1.weight", "conv1.bias"}
    assert set(disc) == {"fc1.weight"}
    bare = {"conv1.weight": 1}
    gen2, disc2 = split_pl_state_dict(bare)
    assert gen2 == bare and disc2 == {}


def test_pl_ckpt_file_roundtrip_into_framework(rng, tmp_path):
    """A PL-style .ckpt file loads through both entry points (inference + fine-tune graft)."""
    from climsr_tpu.inference.run import load_generator
    from climsr_tpu.training.checkpoint import restore_generator_params

    sd = {
        "generator.conv1.weight": torch.randn(64, 3, 9, 9),
        "generator.conv1.bias": torch.randn(64),
        "generator.conv2.weight": torch.randn(32, 64, 1, 1),
        "generator.conv2.bias": torch.randn(32),
        "generator.conv3.weight": torch.randn(1, 32, 5, 5),
        "generator.conv3.bias": torch.randn(1),
    }
    path = tmp_path / "epoch=29-step=82708.ckpt"
    torch.save({"state_dict": sd, "hyper_parameters": {"lr": 3e-4}}, path)

    model, params = load_generator(str(path), "srcnn")
    out = model.apply({"params": params}, jnp.zeros((1, 16, 16, 3)))
    assert out.shape == (1, 16, 16, 1)
    np.testing.assert_allclose(
        np.asarray(params["conv1"]["Conv_0"]["kernel"]),
        sd["generator.conv1.weight"].numpy().transpose(2, 3, 1, 0),
    )

    fresh = create_generator("srcnn").init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
    grafted = restore_generator_params(str(path), fresh)
    np.testing.assert_allclose(
        np.asarray(grafted["conv2"]["Conv_0"]["bias"]), sd["generator.conv2.bias"].numpy(), atol=1e-6
    )


def test_import_strict_errors(rng):
    sd = {"conv1.weight": rng.normal(size=(64, 3, 9, 9)).astype(np.float32)}
    with pytest.raises(KeyError):
        import_generator_params("srcnn", sd, strict=True)
    params = import_generator_params("srcnn", sd, strict=False)
    assert "conv1" in params


@pytest.mark.parametrize("gtype,kwargs,inputs_shape", [
    ("srcnn", dict(in_channels=3, out_channels=1), [(1, 16, 16, 3)]),
    ("esrgan", dict(nf=16, nb=2, gc=8, out_channels=1), [(1, 8, 8, 3), (1, 32, 32, 1), (1, 32, 32, 1)]),
    ("rcan", dict(n_resgroups=2, n_resblocks=2, n_feats=16, reduction=4, out_channels=1),
     [(1, 8, 8, 3), (1, 32, 32, 1), (1, 32, 32, 1)]),
    ("drln", dict(channels=16, out_channels=1), [(1, 8, 8, 1)]),
    ("rfb_esrgan", dict(num_rrdb_blocks=1, num_rrfdb_blocks=1, out_channels=1), [(1, 8, 8, 3)]),
])
def test_export_import_roundtrip(rng, gtype, kwargs, inputs_shape):
    from climsr_tpu.interop.torch_import import export_generator_params

    model = create_generator(gtype, **kwargs)
    inputs = tuple(jnp.zeros(s) for s in inputs_shape)
    params = model.init(jax.random.PRNGKey(1), *inputs)["params"]
    sd = export_generator_params(gtype, params)
    # drln's dead c4 is import-ignored, so strict import tolerates its absence on export
    back = import_generator_params(gtype, sd, model=model, example_inputs=inputs, strict=True)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
