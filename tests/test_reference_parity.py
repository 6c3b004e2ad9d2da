# -*- coding: utf-8 -*-
"""Golden-value numeric parity against the ACTUAL reference torch models.

Each test instantiates the reference ``nn.Module`` from ``/root/reference``
(torch CPU), exports its natural-init ``state_dict`` through
``climsr_tpu.interop.torch_import``, and asserts the flax forward matches the
torch forward at f32 — validating every architectural detail (RRDB trunk
wiring, LeakyReLU slopes, pixel-shuffle channel order, fusion heads,
reflection padding, BN train/eval semantics) numerically, not structurally.

Reference anchors: climsr/models/esrgan.py:17-102, rcan.py:138-193,
drln.py:278-372, rfb_esrgan.py:23-438, discriminator.py:5-46, srcnn.py:6-19.
"""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climsr_tpu.interop.torch_import import (
    import_discriminator_params,
    import_generator_params,
)
from climsr_tpu.models import create_discriminator, create_generator

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"
if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

ref_models = pytest.importorskip("climsr.models", reason="reference repo not mounted")
for _sub in ("srcnn", "esrgan", "rcan", "drln", "rfb_esrgan", "discriminator"):
    __import__(f"climsr.models.{_sub}")


def _sd_numpy(module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def _nchw(a: np.ndarray):
    return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy())


def _torch_out_nhwc(t) -> np.ndarray:
    return np.transpose(t.detach().cpu().numpy(), (0, 2, 3, 1))


def _assert_match(flax_out, torch_out_nhwc: np.ndarray, atol: float = 1e-4):
    got = np.asarray(flax_out, np.float32)
    assert got.shape == torch_out_nhwc.shape, (got.shape, torch_out_nhwc.shape)
    np.testing.assert_allclose(got, torch_out_nhwc, atol=atol, rtol=1e-4)


def _rand(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


# ---------------------------------------------------------------------------
# Generators
# ---------------------------------------------------------------------------


def test_srcnn_numeric_parity(rng):
    torch.manual_seed(0)
    ref = ref_models.srcnn.SRCNN(in_channels=3, out_channels=1).eval()
    x = _rand(rng, 2, 64, 64, 3)

    params = import_generator_params("srcnn", _sd_numpy(ref))
    model = create_generator("srcnn", out_channels=1, dtype=jnp.float32)
    got = model.apply({"params": params}, jnp.asarray(x))

    with torch.no_grad():
        want = _torch_out_nhwc(ref(_nchw(x)))
    _assert_match(got, want, atol=1e-5)


def test_esrgan_numeric_parity_trained_config(rng):
    """The actual trained config (conf/generator/esrgan.yaml: nf=64, nb=11,
    gc=16) incl. the concat(out, elev, mask) -> SRCNN fusion head."""
    torch.manual_seed(1)
    ref = ref_models.esrgan.ESRGANGenerator(
        in_channels=3, out_channels=1, nf=64, nb=11, gc=16, scaling_factor=4
    ).eval()
    x = _rand(rng, 2, 32, 32, 3)
    elev = _rand(rng, 2, 128, 128, 1)
    mask = (rng.uniform(size=(2, 128, 128, 1)) > 0.2).astype(np.float32)

    model = create_generator("esrgan", out_channels=1, nf=64, nb=11, gc=16, dtype=jnp.float32)
    params = import_generator_params(
        "esrgan", _sd_numpy(ref), model=model,
        example_inputs=(jnp.asarray(x), jnp.asarray(elev), jnp.asarray(mask)),
    )
    got = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(elev), jnp.asarray(mask))

    with torch.no_grad():
        want = _torch_out_nhwc(ref(_nchw(x), _nchw(elev), _nchw(mask)))
    _assert_match(got, want)


def test_rcan_numeric_parity_full_depth(rng):
    """Reference defaults: 10 residual groups x 20 RCABs + channel attention +
    pixel-shuffle tail + fusion head (rcan.py:138-193)."""
    torch.manual_seed(2)
    ref = ref_models.rcan.RCAN(
        n_resgroups=10, n_resblocks=20, n_feats=64, reduction=16,
        scaling_factor=4, in_channels=3, out_channels=1,
    ).eval()
    x = _rand(rng, 1, 16, 16, 3)
    elev = _rand(rng, 1, 64, 64, 1)
    mask = (rng.uniform(size=(1, 64, 64, 1)) > 0.2).astype(np.float32)

    model = create_generator(
        "rcan", n_resgroups=10, n_resblocks=20, n_feats=64, reduction=16,
        in_channels=3, out_channels=1, dtype=jnp.float32,
    )
    params = import_generator_params(
        "rcan", _sd_numpy(ref), model=model,
        example_inputs=(jnp.asarray(x), jnp.asarray(elev), jnp.asarray(mask)),
    )
    got = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(elev), jnp.asarray(mask))

    with torch.no_grad():
        want = _torch_out_nhwc(ref(_nchw(x), _nchw(elev), _nchw(mask)))
    _assert_match(got, want)


def test_drln_numeric_parity_full_depth(rng):
    """All 20 densely-wired blocks with the explicit cat/compress chain
    (drln.py:278-372) — the wiring most prone to silent divergence."""
    torch.manual_seed(3)
    ref = ref_models.drln.DRLN(in_channels=1, out_channels=1, scaling_factor=4).eval()
    x = _rand(rng, 1, 16, 16, 1)

    model = create_generator("drln", in_channels=1, out_channels=1, dtype=jnp.float32)
    params = import_generator_params(
        "drln", _sd_numpy(ref), model=model, example_inputs=(jnp.asarray(x),)
    )
    got = model.apply({"params": params}, jnp.asarray(x))

    with torch.no_grad():
        want = _torch_out_nhwc(ref(_nchw(x)))
    _assert_match(got, want)


def test_rfb_esrgan_numeric_parity_full_depth(rng):
    """16 RRDB + 8 RRFDB trunks, dilated RFB branches, pixel-shuffle
    upsampling, tanh output (rfb_esrgan.py:72-438)."""
    torch.manual_seed(4)
    ref = ref_models.rfb_esrgan.RFBESRGANGenerator(
        in_channels=3, out_channels=1, scaling_factor=4,
        num_rrdb_blocks=16, num_rrfdb_blocks=8,
    ).eval()
    x = _rand(rng, 1, 16, 16, 3)

    model = create_generator(
        "rfb_esrgan", in_channels=3, out_channels=1,
        num_rrdb_blocks=16, num_rrfdb_blocks=8, dtype=jnp.float32,
    )
    params = import_generator_params(
        "rfb_esrgan", _sd_numpy(ref), model=model, example_inputs=(jnp.asarray(x),)
    )
    got = model.apply({"params": params}, jnp.asarray(x))

    with torch.no_grad():
        want = _torch_out_nhwc(ref(_nchw(x)))
    _assert_match(got, want)


@pytest.mark.e2e
def test_esrgan_numeric_parity_europe_extent(rng):
    """Europe-extent shapes: 113x113 LR -> 452x452 HR, the reference's
    whole-image fine-tune/inference path (climate_dataset.py:53)."""
    torch.manual_seed(5)
    ref = ref_models.esrgan.ESRGANGenerator(
        in_channels=3, out_channels=1, nf=64, nb=11, gc=16, scaling_factor=4
    ).eval()
    x = _rand(rng, 1, 113, 113, 3)
    elev = _rand(rng, 1, 452, 452, 1)
    mask = (rng.uniform(size=(1, 452, 452, 1)) > 0.2).astype(np.float32)

    model = create_generator("esrgan", out_channels=1, nf=64, nb=11, gc=16, dtype=jnp.float32)
    params = import_generator_params("esrgan", _sd_numpy(ref))
    got = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(elev), jnp.asarray(mask))

    with torch.no_grad():
        want = _torch_out_nhwc(ref(_nchw(x), _nchw(elev), _nchw(mask)))
    _assert_match(got, want)


# ---------------------------------------------------------------------------
# Discriminators (BN train/eval modes)
# ---------------------------------------------------------------------------


def _perturb_bn_stats(ref) -> None:
    """Natural init has running_mean=0/var=1, which would make eval-mode BN an
    affine no-op; perturb so eval parity actually exercises the running stats."""
    with torch.no_grad():
        for name, buf in ref.named_buffers():
            if name.endswith("running_mean"):
                buf.add_(torch.randn_like(buf) * 0.1)
            elif name.endswith("running_var"):
                buf.mul_(torch.rand_like(buf) * 0.5 + 0.75)


def test_discriminator_numeric_parity_eval_and_train(rng):
    torch.manual_seed(6)
    ref = ref_models.discriminator.Discriminator(in_channels=1)
    _perturb_bn_stats(ref)
    x = _rand(rng, 2, 128, 128, 1)

    model = create_discriminator("esrgan", in_channels=1, dtype=jnp.float32)
    params, batch_stats = import_discriminator_params(
        _sd_numpy(ref), model=model, example_inputs=(jnp.asarray(x),)
    )
    variables = {"params": params, "batch_stats": batch_stats}

    # eval mode: BN uses the (perturbed) running statistics
    ref.eval()
    with torch.no_grad():
        want_eval = ref(_nchw(x)).numpy()
    got_eval = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got_eval), want_eval, atol=1e-4, rtol=1e-4)

    # train mode: BN normalizes with the batch statistics
    ref.train()
    with torch.no_grad():
        want_train = ref(_nchw(x)).numpy()
    got_train, _ = model.apply(variables, jnp.asarray(x), train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got_train), want_train, atol=1e-4, rtol=1e-4)


def test_rfb_discriminator_numeric_parity_eval_and_train(rng):
    torch.manual_seed(7)
    ref = ref_models.rfb_esrgan.RFBESRGANDiscriminator(in_channels=1)
    _perturb_bn_stats(ref)
    x = _rand(rng, 2, 128, 128, 1)

    model = create_discriminator("rfb_esrgan", in_channels=1, dtype=jnp.float32)
    params, batch_stats = import_discriminator_params(
        _sd_numpy(ref), model=model, example_inputs=(jnp.asarray(x),)
    )
    variables = {"params": params, "batch_stats": batch_stats}

    ref.eval()
    with torch.no_grad():
        want_eval = ref(_nchw(x)).numpy()
    got_eval = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got_eval), want_eval, atol=1e-4, rtol=1e-4)

    ref.train()
    with torch.no_grad():
        want_train = ref(_nchw(x)).numpy()
    got_train, _ = model.apply(variables, jnp.asarray(x), train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got_train), want_train, atol=1e-4, rtol=1e-4)
