# -*- coding: utf-8 -*-
"""Model zoo registry: name -> flax module, plus generator-call dispatch.

Call-signature parity (reference ``climsr/core/task.py:235-239``): the task
calls ``generator(x)`` for srcnn and ``generator(x, elev, mask)`` otherwise.
In the reference, DRLN and RFB-ESRGAN ``forward`` take a single input, so the
3-arg call would TypeError — they are zoo-only there. Here
``generator_call_signature`` routes them as single-input generators so all
five families actually train.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax

import climsr_tpu.consts as consts
from climsr_tpu.models.discriminator import Discriminator  # noqa: F401
from climsr_tpu.models.drln import DRLN  # noqa: F401
from climsr_tpu.models.esrgan import ESRGANGenerator  # noqa: F401
from climsr_tpu.models.rcan import RCAN  # noqa: F401
from climsr_tpu.models.rfb_esrgan import RFBESRGANDiscriminator, RFBESRGANGenerator  # noqa: F401
from climsr_tpu.models.srcnn import SRCNN  # noqa: F401

GENERATORS = {
    consts.models.srcnn: SRCNN,
    consts.models.esrgan: ESRGANGenerator,
    consts.models.rfb_esrgan: RFBESRGANGenerator,
    consts.models.rcan: RCAN,
    consts.models.drln: DRLN,
}

DISCRIMINATORS = {
    consts.models.esrgan: Discriminator,
    consts.models.rfb_esrgan: RFBESRGANDiscriminator,
    "default": Discriminator,
}

# Generators whose __call__ takes (x, elev, mask); the rest take (x,).
FUSION_GENERATORS = {consts.models.esrgan, consts.models.rcan}

# Generators that consume the nearest-pre-upscaled input at HR size.
PRE_UPSCALED_GENERATORS = {consts.models.srcnn}


def create_generator(name: str, dtype: Optional[Any] = None, **kwargs) -> Any:
    """Instantiate a generator module by registry name with config kwargs.

    ``use_pallas=None`` (or absent) means *auto*: the fused Pallas trunk
    kernels are enabled on the TPU backend for families that support them —
    for inference AND training (the kernels carry a fused Pallas backward,
    see ops/pallas/rdb.py). This is the single resolution point for every
    construction path (CLIs, instantiator, trainer, library use); pass an
    explicit True/False to override.
    """
    if name not in GENERATORS:
        raise KeyError(f"Unknown generator '{name}'. Available: {sorted(GENERATORS)}")
    cls = GENERATORS[name]
    field_names = {f.name for f in cls.__dataclass_fields__.values()}
    kwargs = {k: v for k, v in kwargs.items() if k in field_names}
    if "use_pallas" in field_names and kwargs.get("use_pallas", None) is None:
        kwargs["use_pallas"] = jax.default_backend() == "tpu"
    return cls(dtype=dtype, **kwargs)


def create_discriminator(name: str = "default", dtype: Optional[Any] = None, **kwargs) -> Any:
    if name not in DISCRIMINATORS:
        raise KeyError(f"Unknown discriminator '{name}'. Available: {sorted(DISCRIMINATORS)}")
    cls = DISCRIMINATORS[name]
    field_names = {f.name for f in cls.__dataclass_fields__.values()}
    kwargs = {k: v for k, v in kwargs.items() if k in field_names}
    return cls(dtype=dtype, **kwargs)


def apply_generator(
    name: str,
    module: Any,
    variables: Dict,
    x: jax.Array,
    elevation: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Dispatch matching the reference task-layer forward (task.py:235-239)."""
    if name in FUSION_GENERATORS:
        return module.apply(variables, x, elevation, mask)
    return module.apply(variables, x)


def apply_generator_batch(name: str, module: Any, params: Dict, batch: Dict, compute_dtype) -> jax.Array:
    """:func:`apply_generator` from a batch dict — the ONE place the training
    tasks' (lr [+ elevation/mask]) unpacking-and-cast contract lives."""
    B = consts.batch_items
    x = batch[B.lr].astype(compute_dtype)
    if name in FUSION_GENERATORS:
        return module.apply(
            {"params": params}, x,
            batch[B.elevation].astype(compute_dtype), batch[B.mask].astype(compute_dtype),
        )
    return module.apply({"params": params}, x)
