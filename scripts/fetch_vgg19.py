#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Fetch torchvision's ImageNet VGG19 weights and cache them for the
perceptual loss (reference: ``climsr/losses/perceptual.py:15-19`` uses
``torchvision.models.vgg19(pretrained=True).features[:35]``).

Requires network access once; afterwards the framework loads
``weights/vgg19_features.npz`` offline. Only ``torch`` is needed (the
checkpoint is a plain state dict — torchvision itself is not required).

Usage:
    python scripts/fetch_vgg19.py [--out weights/vgg19_features.npz]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

# torchvision's published VGG19 ImageNet checkpoint
VGG19_URL = "https://download.pytorch.org/models/vgg19-dcbb9e9d.pth"


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--out",
        default=str(Path(__file__).resolve().parents[1] / "weights" / "vgg19_features.npz"),
    )
    args = parser.parse_args()

    import torch

    try:
        state_dict = torch.hub.load_state_dict_from_url(VGG19_URL, map_location="cpu", progress=True)
    except Exception as e:  # no network / blocked egress
        print(
            f"Could not download VGG19 weights ({e}).\n"
            "Run this script once in a connected environment, or copy an existing\n"
            "torchvision vgg19 checkpoint into ~/.cache/torch/hub/checkpoints/ and retry.",
            file=sys.stderr,
        )
        return 1

    import jax.numpy as jnp
    import numpy as np

    from climsr_tpu.models.vgg import VGG19Features, load_torchvision_weights, save_npz

    variables = load_torchvision_weights(state_dict)
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_npz(variables, out)

    # sanity: a forward pass through the full truncation produces finite maps
    model = VGG19Features(cutoff="conv5_4")
    feats = model.apply(variables, jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert np.isfinite(np.asarray(feats)).all()
    print(f"Saved VGG19 feature weights to {out} ({out.stat().st_size / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
