# -*- coding: utf-8 -*-
"""VGG19 feature extractor for the perceptual loss (NHWC, flax).

Parity: reference ``climsr/losses/perceptual.py:15-19`` uses torchvision
``vgg19(pretrained=True).features[:35]`` — i.e. everything through conv5_4
*without* its ReLU. This module reproduces exactly that truncation.

Weights: :func:`load_torchvision_weights` converts a torchvision VGG19 state
dict (torch tensors OIHW) to this module's HWIO params; use
:func:`save_npz`/:func:`load_npz` to cache them as a portable npz. With no
weights available, the loss can run with random features (flagged) — note the
reference computes this loss under ``no_grad`` so it contributes **no
gradients**, only a logged constant (see losses/perceptual.py).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (name, out_channels); 'M' = maxpool. Torchvision vgg19.features layout.
_VGG19_CFG = [
    ("conv1_1", 64), ("conv1_2", 64), "M",
    ("conv2_1", 128), ("conv2_2", 128), "M",
    ("conv3_1", 256), ("conv3_2", 256), ("conv3_3", 256), ("conv3_4", 256), "M",
    ("conv4_1", 512), ("conv4_2", 512), ("conv4_3", 512), ("conv4_4", 512), "M",
    ("conv5_1", 512), ("conv5_2", 512), ("conv5_3", 512), ("conv5_4", 512), "M",
]

# torchvision features module index per conv (for state-dict key mapping)
_TORCH_INDICES = [0, 2, 5, 7, 10, 12, 14, 16, 19, 21, 23, 25, 28, 30, 32, 34]

# NOTE: no ImageNet mean/std normalization anywhere — the reference perceptual
# loss feeds raw repeated-grayscale tensors straight into vgg19.features
# (climsr/losses/perceptual.py:26-33), and parity requires doing the same.


class VGG19Features(nn.Module):
    """Truncated VGG19: features through ``cutoff`` conv (inclusive, pre-ReLU)."""

    cutoff: str = "conv5_4"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for item in _VGG19_CFG:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            name, ch = item
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, param_dtype=jnp.float32, name=name)(x)
            if name == self.cutoff:
                return x
            x = nn.relu(x)
        raise ValueError(f"cutoff {self.cutoff!r} not in VGG19 config")


def load_torchvision_weights(state_dict) -> Dict:
    """Convert torchvision vgg19 ``features`` state dict (OIHW) to flax params (HWIO).

    Truncated state dicts (only the layers up to some depth, e.g. the
    committed conv2_2 golden weights) convert to a correspondingly truncated
    param tree; a hole in the middle of the stack is still an error.
    """
    params = {}
    conv_names = [item[0] for item in _VGG19_CFG if item != "M"]
    for name, idx in zip(conv_names, _TORCH_INDICES):
        if f"features.{idx}.weight" not in state_dict:
            break  # truncated stack: everything deeper is absent too
        w = np.asarray(state_dict[f"features.{idx}.weight"])  # (O, I, H, W)
        b = np.asarray(state_dict[f"features.{idx}.bias"])
        params[name] = {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)), "bias": jnp.asarray(b)}
    missing = [
        f"features.{idx}" for name, idx in zip(conv_names, _TORCH_INDICES)
        if name not in params and f"features.{idx}.weight" in state_dict
    ]
    if missing:
        raise KeyError(f"non-contiguous VGG19 state dict, stray layers: {missing}")
    return {"params": params}


def save_npz(variables: Dict, path) -> None:
    flat = {}
    for name, p in variables["params"].items():
        flat[f"{name}.kernel"] = np.asarray(p["kernel"])
        flat[f"{name}.bias"] = np.asarray(p["bias"])
    np.savez_compressed(path, **flat)


def load_npz(path) -> Dict:
    data = np.load(path)
    params = {}
    for key in data.files:
        name, kind = key.rsplit(".", 1)
        params.setdefault(name, {})[kind] = jnp.asarray(data[key])
    return {"params": params}


def default_weights_path() -> Path:
    return Path(__file__).resolve().parents[2] / "weights" / "vgg19_features.npz"


def layers_through(cutoff: str) -> list:
    """Conv names at or before ``cutoff`` in the VGG19 feature stack."""
    names = []
    for item in _VGG19_CFG:
        if item == "M":
            continue
        names.append(item[0])
        if item[0] == cutoff:
            return names
    raise ValueError(f"cutoff {cutoff!r} not in VGG19 config")


def _truncate(variables: Dict, cutoff: str) -> Dict:
    keep = set(layers_through(cutoff))
    return {"params": {k: v for k, v in variables["params"].items() if k in keep}}


def _covering(variables: Dict, cutoff: str, source) -> Optional[Dict]:
    """Truncate to ``cutoff``; None (with a loud warning) if the source is
    SHALLOWER than the cutoff — an incomplete tree would otherwise surface as
    a cryptic flax missing-param error inside the first jitted GAN step."""
    import logging

    out = _truncate(variables, cutoff)
    missing = [n for n in layers_through(cutoff) if n not in out["params"]]
    if missing:
        logging.getLogger(__name__).warning(
            "VGG19 weights at %s stop before the requested cutoff %s (missing %s); "
            "falling back as if no pretrained weights were available",
            source, cutoff, ", ".join(missing),
        )
        return None
    return out


def try_load_pretrained(cutoff: str = "conv5_4") -> Optional[Dict]:
    """Best effort: cached npz, then a locally-cached torchvision checkpoint.

    Only the layers at or before ``cutoff`` are returned — a shallow
    perceptual cutoff neither loads nor carries the deeper conv params. A
    cached weight set shallower than ``cutoff`` is treated as unavailable
    (warned), not returned incomplete.
    """
    npz = default_weights_path()
    if npz.exists():
        return _covering(load_npz(npz), cutoff, npz)
    try:
        import torch
        from torch.hub import get_dir

        hub = Path(get_dir()) / "checkpoints"
        candidates = sorted(hub.glob("vgg19-*.pth"))
        if candidates:
            sd = torch.load(candidates[0], map_location="cpu", weights_only=True)
            return _covering(load_torchvision_weights(sd), cutoff, candidates[0])
    except Exception:
        pass
    return None


def seeded_vgg19_variables(cutoff: str = "conv5_4", seed: int = 0) -> Dict:
    """Deterministic stand-in feature weights (flax default init, fixed seed).

    NOT ImageNet weights — a reproducible substitute for environments where
    ``scripts/fetch_vgg19.py`` has never been able to reach the network. Every
    machine/backend derives bit-identical params from the JAX PRNG, so logged
    perceptual values are comparable across runs and pinned by the committed
    goldens (``tests/fixtures/vgg19_goldens.npz``). Under the reference's
    no-grad perceptual semantics (``climsr/losses/perceptual.py:23``) the
    substitution affects only the logged value, never training dynamics.
    """
    model = VGG19Features(cutoff=cutoff)
    return model.init(jax.random.PRNGKey(seed), jnp.zeros((1, 32, 32, 3), jnp.float32))


def load_feature_weights(cutoff: str = "conv5_4") -> tuple:
    """Resolve perceptual-loss feature weights: ``(variables, provenance)``.

    Provenance is ``"pretrained"`` (npz artifact or torch-hub checkpoint —
    reference-faithful ImageNet features) or ``"seeded"`` (the deterministic
    stand-in from :func:`seeded_vgg19_variables`).
    """
    variables = try_load_pretrained(cutoff=cutoff)
    if variables is not None:
        return variables, "pretrained"
    return seeded_vgg19_variables(cutoff=cutoff), "seeded"
