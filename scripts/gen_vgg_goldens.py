#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Generate the committed VGG19 feature goldens (tests/fixtures/vgg19_goldens.npz).

ImageNet VGG19 weights cannot be fetched in the build environment (zero
egress), so the committed golden pins the perceptual-loss *numerics* — conv
stack layout, state-dict conversion, truncation, ImageNet normalization-free
L1 distance — against a torch oracle with deterministic seeded weights:

- weights: torch-default-initialized (seed 0) conv params through conv2_2,
- activations: the torch replica of ``torchvision.models.vgg19().features``
  evaluated pre-ReLU at conv1_2 and conv2_2 on a fixed input,
- the perceptual L1 feature distance at the conv2_2 cutoff.

The in-env test (tests/test_vgg_golden.py) then asserts the flax port against
this file without needing torch at all. True ImageNet weights remain pure
data, provisioned by scripts/fetch_vgg19.py on a connected machine
(reference: climsr/losses/perceptual.py:15-19).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np
import torch

_CFG = [64, 64, "M", 128, 128]  # through conv2_2 (torchvision indices 0..7)


def torch_vgg19_head() -> torch.nn.Sequential:
    layers, in_c = [], 3
    for v in _CFG:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_c, v, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=True))
            in_c = v
    return torch.nn.Sequential(*layers)


def main() -> None:
    torch.manual_seed(0)
    features = torch_vgg19_head()

    rng = np.random.default_rng(7)
    x = (rng.normal(size=(2, 3, 32, 32)) * 0.5).astype(np.float32)
    y = (rng.normal(size=(2, 3, 32, 32)) * 0.5).astype(np.float32)

    with torch.no_grad():
        # pre-ReLU cuts: conv1_2 is features[:3] (conv,relu,conv),
        # conv2_2 is features[:8]
        act_conv1_2 = features[:3](torch.from_numpy(x)).numpy()
        act_conv2_2 = features[:8](torch.from_numpy(x)).numpy()
        fx = features[:8](torch.from_numpy(x))
        fy = features[:8](torch.from_numpy(y))
        l1 = float(torch.mean(torch.abs(fx - fy)))

    out = {
        "input_x": x,
        "input_y": y,
        "act_conv1_2": act_conv1_2.astype(np.float32),
        "act_conv2_2": act_conv2_2.astype(np.float32),
        "perceptual_l1_conv2_2": np.float64(l1),
    }
    # torchvision state-dict layout: features.<idx>.{weight,bias}
    for k, v in features.state_dict().items():
        out[f"features.{k}"] = v.numpy()

    dst = Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "vgg19_goldens.npz"
    np.savez_compressed(dst, **out)
    print(f"wrote {dst} ({dst.stat().st_size / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
