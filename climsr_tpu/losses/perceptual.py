# -*- coding: utf-8 -*-
"""VGG19 perceptual loss for single-channel rasters.

Parity: reference ``climsr/losses/perceptual.py``:

- grayscale input repeated to 3 channels (``:26-30``),
- L1 between truncated-VGG19 feature maps (``features[:35]`` = through
  conv5_4 pre-ReLU),
- **the whole forward runs under ``torch.no_grad()``** (``:23``) — a reference
  quirk meaning the perceptual term is a constant w.r.t. the generator: it
  shapes the logged loss value but contributes zero gradient. We reproduce
  that with ``jax.lax.stop_gradient`` by default; set
  ``differentiable=True`` (task config ``differentiable_perceptual``) to make
  it a real loss term.

Because the default is gradient-free, GAN training is numerically faithful to
the reference even when no pretrained VGG weights are on disk: the loss then
runs on the deterministic seeded stand-in features
(``models.vgg.seeded_vgg19_variables`` — fixed-PRNG init, bit-identical on
every machine, pinned by committed goldens), which shifts only the *logged*
perceptual value. Fetch real ImageNet weights once with
``scripts/fetch_vgg19.py`` to make logged values reference-faithful;
``differentiable=True`` on seeded features is the one combination that warns
loudly, because there the substitution changes training dynamics.
"""
from __future__ import annotations

import logging
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from climsr_tpu.models.vgg import VGG19Features, load_feature_weights

logger = logging.getLogger(__name__)


def build_perceptual_loss(
    differentiable: bool = False,
    compute_dtype=jnp.bfloat16,
    variables: Optional[dict] = None,
    cutoff: str = "conv5_4",
) -> Callable[[jax.Array, jax.Array], jax.Array]:
    """Returns perceptual_fn(hr, sr) -> scalar L1 feature distance.

    The returned callable closes over the VGG parameters (they are constants,
    never trained — matching ``requires_grad=False`` in the reference).
    ``cutoff`` selects the truncation depth: the reference uses conv5_4
    (``features[:35]``); shallower cuts (e.g. conv2_2) make cheap test/CI
    variants of the same graph.
    """
    model = VGG19Features(cutoff=cutoff, dtype=compute_dtype)
    if variables is None:
        variables, provenance = load_feature_weights(cutoff=cutoff)
        if provenance == "seeded":
            if differentiable:
                logger.warning(
                    "differentiable_perceptual=true with no pretrained VGG19 weights on "
                    "disk: backpropagating through the deterministic SEEDED stand-in "
                    "features — generator gradients will differ materially from a "
                    "pretrained-VGG run. Fetch real weights once with "
                    "scripts/fetch_vgg19.py."
                )
            else:
                logger.info(
                    "Perceptual loss running on the deterministic seeded VGG19 stand-in "
                    "(no weights/vgg19_features.npz or torch-hub checkpoint found). "
                    "Reproducible across machines; under the reference's no-grad "
                    "semantics only the logged value differs from an ImageNet-weights "
                    "run. scripts/fetch_vgg19.py upgrades it."
                )

    # the L1 reduction runs at (at least) f32 regardless of the bf16 compute
    # dtype; a true f64 run (the parity goldens) keeps f64 end to end
    acc_dtype = jnp.promote_types(jnp.float32, compute_dtype)

    def perceptual_fn(fake_high_resolution: jax.Array, high_resolution: jax.Array) -> jax.Array:
        def compute(fake, real):
            fake3 = jnp.concatenate([fake] * 3, axis=-1).astype(compute_dtype)
            real3 = jnp.concatenate([real] * 3, axis=-1).astype(compute_dtype)
            f_fake = model.apply(variables, fake3).astype(acc_dtype)
            f_real = model.apply(variables, real3).astype(acc_dtype)
            # reference arg order: l1(net(high_resolution), net(fake)) — symmetric anyway
            return jnp.mean(jnp.abs(f_real - f_fake))

        value = compute(fake_high_resolution, high_resolution)
        if not differentiable:
            value = jax.lax.stop_gradient(value)
        return value

    return perceptual_fn
