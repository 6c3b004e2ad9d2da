#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Dump the compiled HLO of the flagship train step and summarize named fusions.

Companion to profile_train_step.py: the per-op xplane table names ops like
``fusion.328`` — this prints each big fusion's root expression + operand
shapes so the table rows can be attributed to model segments.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/dump_train_hlo.py [names...]
"""
from __future__ import annotations

import re
import sys

import jax
import jax.numpy as jnp

from climsr_tpu.config.schemas import OptimizerConfig
from climsr_tpu.models import create_generator
from climsr_tpu.training.optimizers import build_optimizer
from climsr_tpu.training.tasks.pretrain import make_pretrain_step
from climsr_tpu.training.train_state import TrainState


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    bs, lr_hw = 192, 32
    model = create_generator(
        "esrgan", nf=64, nb=11, gc=16, out_channels=1, dtype=jnp.bfloat16,
        use_pallas="--xla-trunk" not in sys.argv,
    )
    r = jax.random.PRNGKey(0)
    batch = {
        "lr": jax.random.normal(r, (bs, lr_hw, lr_hw, 3), jnp.bfloat16),
        "hr": jax.random.normal(r, (bs, lr_hw * 4, lr_hw * 4, 1), jnp.bfloat16),
        "elevation": jax.random.normal(r, (bs, lr_hw * 4, lr_hw * 4, 1), jnp.bfloat16),
        "mask": jnp.ones((bs, lr_hw * 4, lr_hw * 4, 1), jnp.bfloat16),
    }
    params = model.init(r, batch["lr"][:1], batch["elevation"][:1], batch["mask"][:1])["params"]
    tx = build_optimizer(OptimizerConfig(name="adam", lr=1e-4, weight_decay=1e-4), lambda s: 1e-4)
    step = make_pretrain_step(model, "esrgan", tx, compute_dtype=jnp.bfloat16, donate=True)
    state = TrainState.create(params, tx)
    txt = jax.jit(step.__wrapped__ if hasattr(step, "__wrapped__") else step, donate_argnums=(0,)) \
        .lower(state, batch).compile().as_text()
    with open("/tmp/train_step_hlo.txt", "w") as f:
        f.write(txt)
    print(f"# HLO dumped: /tmp/train_step_hlo.txt ({len(txt)} bytes)", file=sys.stderr)

    if not names:
        return
    # print the computation each requested fusion calls, compactly
    for name in names:
        m = re.search(rf"^\s*(?:ROOT )?%?{re.escape(name)} = .*$", txt, re.M)
        if not m:
            print(f"== {name}: NOT FOUND")
            continue
        line = m.group(0)
        print(f"== {name}:\n{line.strip()[:2000]}\n")
        cm = re.search(r"calls=%?([\w.\-]+)", line)
        if cm:
            comp = cm.group(1)
            cmatch = re.search(rf"^%?{re.escape(comp)} [^\n]*\{{(.*?)^\}}", txt, re.M | re.S)
            if cmatch:
                body = cmatch.group(1)
                lines = [ln.strip() for ln in body.strip().splitlines()]
                print(f"   ({len(lines)} instructions)")
                for ln in lines:
                    if re.search(r"convolution|dot|reduce|custom-call", ln) or "ROOT" in ln:
                        print("   " + ln[:300])
        print()


if __name__ == "__main__":
    main()
