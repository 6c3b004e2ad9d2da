# -*- coding: utf-8 -*-
"""Migrate a reference (PyTorch-Lightning) checkpoint into climsr_tpu.

Usage:
    python examples/migrate_from_reference.py path/to/epoch=29-step=82708.ckpt \
        [--generator esrgan] [--out converted_ckpt/]

Loads the torch ``.ckpt``, translates the generator weights into the flax
parameter tree (see ``climsr_tpu/interop/torch_import.py``), verifies them by
running a forward pass, and optionally writes an orbax checkpoint directory
usable with ``inference.pretrained_model=`` / ``training.model_weights=``.

Note the CLIs also accept the ``.ckpt`` path directly — this script is for
one-time conversion and inspection.
"""
from __future__ import annotations

import argparse
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt", help="reference .ckpt/.pth file")
    ap.add_argument("--generator", default=None, help="generator type (auto-detected if omitted)")
    ap.add_argument("--out", default=None, help="write an orbax checkpoint directory here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from climsr_tpu.interop.torch_import import load_reference_generator_params
    from climsr_tpu.models import FUSION_GENERATORS, PRE_UPSCALED_GENERATORS, create_generator

    gtype, params = load_reference_generator_params(args.ckpt, args.generator)
    n_params = sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
    print(f"generator: {gtype}, {n_params / 1e6:.2f}M parameters imported")

    first = {"srcnn": "conv1", "esrgan": "conv_first", "rcan": "head", "drln": "head", "rfb_esrgan": "conv1"}
    in_ch = int(params[first[gtype]]["Conv_0"]["kernel"].shape[2])
    model = create_generator(gtype, dtype=jnp.bfloat16, in_channels=in_ch)
    lr_size = 128 if gtype in PRE_UPSCALED_GENERATORS else 32
    lr = jnp.zeros((1, lr_size, lr_size, in_ch), jnp.bfloat16)
    if gtype in FUSION_GENERATORS:
        hr = jnp.zeros((1, lr_size * 4, lr_size * 4, 1), jnp.bfloat16)
        out = model.apply({"params": params}, lr, hr, hr)
    else:
        out = model.apply({"params": params}, lr)
    print(f"forward OK: output {out.shape} {out.dtype}")

    if args.out:
        import orbax.checkpoint as ocp

        path = Path(args.out).absolute()
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path / "0" / "default", {"params": params})
        print(f"orbax checkpoint written to {path}")


if __name__ == "__main__":
    main()
