# -*- coding: utf-8 -*-
"""Device-side train-time augmentation + LR synthesis (jit-safe, batched).

TPU-first replacement for the reference's per-sample host augmentation
(``climate_dataset.py:144-189``: albumentations flips/rot90 + cv2 nearest
decimation in DataLoader workers). Moving this into the jitted train step:

- same distribution: v-flip w.p. 0.5, h-flip w.p. 0.5, then with p=0.5 a
  uniform 0-3x 90° rotation; the *same* transform applies to HR/elev/mask,
- LR = top-left decimation of the augmented HR (exactly cv2.INTER_NEAREST for
  integer factors, see ops/resize.py),
- per-generator channel assembly (srcnn gets the nearest-upscaled LR at HR
  size; others get the true LR with LR-decimated elev/mask channels),

so the host only ships raw normalized tiles, and the VPU does the flips as
fused reverses — effectively free next to the conv FLOPs.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

import climsr_tpu.consts as consts
from climsr_tpu.ops.resize import nearest_downsample, nearest_upsample

B = consts.batch_items


def _apply_flips_rot(img: jax.Array, vflip: jax.Array, hflip: jax.Array, rot_k: jax.Array) -> jax.Array:
    """One (H, W, C) square image; traced flags. rot90 k = transpose/flip composition."""
    img = jnp.where(vflip, img[::-1, :, :], img)
    img = jnp.where(hflip, img[:, ::-1, :], img)

    # np.rot90(k): 1 = transpose then flip rows; build k via switch
    def rot0(x):
        return x

    def rot1(x):
        return jnp.transpose(x, (1, 0, 2))[::-1, :, :]

    def rot2(x):
        return x[::-1, ::-1, :]

    def rot3(x):
        return jnp.transpose(x, (1, 0, 2))[:, ::-1, :]

    return jax.lax.switch(rot_k, [rot0, rot1, rot2, rot3], img)


def random_augment(
    hr: jax.Array,
    elev: jax.Array,
    mask: jax.Array,
    rng: jax.Array,
    v_flip: bool = True,
    h_flip: bool = True,
    random_90_rotation: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Batched random flips/rot90, identical transform per sample across rasters."""
    n = hr.shape[0]
    k_v, k_h, k_r, k_k = jax.random.split(rng, 4)
    vflips = jax.random.bernoulli(k_v, 0.5, (n,)) if v_flip else jnp.zeros((n,), bool)
    hflips = jax.random.bernoulli(k_h, 0.5, (n,)) if h_flip else jnp.zeros((n,), bool)
    do_rot = jax.random.bernoulli(k_r, 0.5, (n,)) if random_90_rotation else jnp.zeros((n,), bool)
    # reference: random.randint(0, 3) inclusive
    ks = jnp.where(do_rot, jax.random.randint(k_k, (n,), 0, 4), 0)

    def per_sample(h, e, m, v, f, k):
        return (
            _apply_flips_rot(h, v, f, k),
            _apply_flips_rot(e, v, f, k),
            _apply_flips_rot(m, v, f, k),
        )

    return jax.vmap(per_sample)(hr, elev, mask, vflips, hflips, ks)


def assemble_train_inputs(
    hr: jax.Array,
    elev: jax.Array,
    mask: jax.Array,
    generator_type: str,
    scale: int = 4,
    use_elevation: bool = True,
    use_mask: bool = True,
) -> jax.Array:
    """LR-input channel stack from augmented HR rasters (climate_dataset.py:94-120)."""
    lr = nearest_downsample(hr, scale)
    if generator_type == consts.models.srcnn:
        out = nearest_upsample(lr, scale)
        if use_elevation:
            out = jnp.concatenate([out, elev], axis=-1)
        if use_mask:
            out = jnp.concatenate([out, mask], axis=-1)
        return out
    out = lr
    if use_elevation:
        out = jnp.concatenate([out, nearest_downsample(elev, scale)], axis=-1)
    if use_mask:
        out = jnp.concatenate([out, nearest_downsample(mask, scale)], axis=-1)
    return out


def augment_and_assemble(
    batch: Dict[str, jax.Array],
    rng: jax.Array,
    generator_type: str,
    scale: int = 4,
    use_elevation: bool = True,
    use_mask: bool = True,
    v_flip: bool = True,
    h_flip: bool = True,
    random_90_rotation: bool = True,
) -> Dict[str, jax.Array]:
    """Raw {hr, elevation, mask} tiles -> full train batch {lr, hr, elevation, mask}."""
    hr, elev, mask = random_augment(
        batch[B.hr], batch[B.elevation], batch[B.mask], rng, v_flip, h_flip, random_90_rotation
    )
    lr = assemble_train_inputs(hr, elev, mask, generator_type, scale, use_elevation, use_mask)
    return {B.lr: lr, B.hr: hr, B.elevation: elev, B.mask: mask}
