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
import sys
from pathlib import Path

# runnable as `python examples/migrate_from_reference.py` without installing
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt", help="reference .ckpt/.pth file")
    ap.add_argument("--generator", default=None, help="generator type (auto-detected if omitted)")
    ap.add_argument("--out", default=None, help="write an orbax checkpoint directory here")
    args = ap.parse_args()

    import jax

    # checkpoint conversion is host-side work (tree surgery + one tiny forward
    # for verification) — pin to CPU so it runs without touching the TPU
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from climsr_tpu.interop.torch_import import load_reference_generator_params
    from climsr_tpu.models import FUSION_GENERATORS, PRE_UPSCALED_GENERATORS, create_generator

    gtype, params = load_reference_generator_params(args.ckpt, args.generator)
    n_params = sum(int(p.size) for p in jax.tree_util.tree_leaves(params))
    print(f"generator: {gtype}, {n_params / 1e6:.2f}M parameters imported")

    first = {"srcnn": "conv1", "esrgan": "conv_first", "rcan": "head", "drln": "head", "rfb_esrgan": "conv1"}
    in_ch = int(params[first[gtype]]["Conv_0"]["kernel"].shape[2])
    # Build the model at the CHECKPOINT's architecture, not class defaults —
    # flax apply silently ignores extra params, so a default-sized model would
    # print "forward OK" for an oversized checkpoint while using only part of
    # it. For ESRGAN the trunk hyper-parameters are inferable from the tree.
    kwargs = {"in_channels": in_ch}
    if gtype == "esrgan":
        kwargs["nb"] = sum(1 for k in params if k.startswith("RRDB_trunk_"))
        kwargs["nf"] = int(params["conv_first"]["Conv_0"]["kernel"].shape[3])
        kwargs["gc"] = int(params["RRDB_trunk_0"]["RDB1"]["conv1"]["Conv_0"]["kernel"].shape[3])
        kwargs["out_channels"] = int(params["srcnn"]["conv3"]["Conv_0"]["kernel"].shape[3])
    model = create_generator(gtype, dtype=jnp.bfloat16, **kwargs)
    lr_size = 128 if gtype in PRE_UPSCALED_GENERATORS else 32
    lr = jnp.zeros((1, lr_size, lr_size, in_ch), jnp.bfloat16)
    inputs = (lr,)
    if gtype in FUSION_GENERATORS:
        hr = jnp.zeros((1, lr_size * 4, lr_size * 4, 1), jnp.bfloat16)
        inputs = (lr, hr, hr)
    # exact structure + shape verification (every imported leaf must have a
    # home and every model leaf must be covered) BEFORE the forward pass
    from climsr_tpu.interop.torch_import import _verify_against_model

    try:
        _verify_against_model(params, model, inputs, gtype)
    except ValueError as e:
        raise SystemExit(
            f"{e}\n(The checkpoint was trained at a non-default architecture — "
            f"for non-esrgan families pass the matching sizes via the generator "
            f"config when using the CLIs.)"
        )
    out = model.apply({"params": params}, *inputs)
    print(f"verified: all {len(jax.tree_util.tree_leaves(params))} leaves map 1:1; "
          f"forward OK: output {out.shape} {out.dtype}")

    if args.out:
        import orbax.checkpoint as ocp

        path = Path(args.out).absolute()
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(path / "0" / "default", {"params": params})
        print(f"orbax checkpoint written to {path}")


if __name__ == "__main__":
    main()
