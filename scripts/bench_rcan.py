#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""RCAN inference throughput on the europe-extent production geometry.

The reference's shipped inference model (conf/inference/inference_rcan.yaml:4
points at the europe-extent RCAN checkpoint, val RMSE 0.09036) runs 113x113
LR GeoTIFF frames -> 452x452 SR (climsr/inference/inference.py, batch_size=1
fp32). This bench measures the same geometry on the TPU chip: reference
defaults (rcan.py:138-193: 10 resgroups x 20 RCABs, n_feats=64, reduction=16,
fusion head), bf16, frames batched to fill the MXU, chained inside one jit
with a loop-carried data dependency (same honesty methodology as bench.py).

Analytic FLOP model (per LR pixel, 4x scale): the trunk is 10x20 RCABs of
two 3x3 64->64 convs (the CA pool/FC work is O(C^2) per FRAME — negligible
per pixel), plus 11 trunk/tail 3x3 64->64 convs, the head conv 3->64, two
pixel-shuffle convs 64->256 (one at 1x, one at 2x resolution = 1+4 pixel
units), and the 9x9 SRCNN-style fusion head at HR (3ch -> 64 -> 32 -> 1).
That totals ~32.4 MFLOP per LR pixel — ~2.8x ESRGAN nb=11's 11.55.

Round-5 measurement and the Pallas-kernel decision (VERDICT item 3)
-------------------------------------------------------------------
Measured: **154 ms/iter at bs=16 = 21.2 Mpix-HR/s/chip (~43 TF/s, 21.8% of
v5e bf16 peak)**. Per-op attribution (xplane + HLO dump):

- ~45% is the 420 trunk convs, running near the K=64 emitter rate,
- ~19% is 44 `slice` copies at 665 us each — XLA's spatially-partitioned
  conv plumbing at the odd 113x113 geometry (layouts like
  bf16[16,29,113,64]{3,0,2,1}),
- ~200 conv-epilogue fusions at 567 us each that carry the CA pool PLUS the
  neighboring conv's bias/convert traffic. The pool itself is NOT the cost:
  standalone, `jnp.mean` over [16,113,113,64] is 20 us, and re-emitting it
  as a ones-vector matmul is canonicalized straight back to the same
  multiply+reduce HLO (measured no-op, round 5).

DECISION: no Pallas RCAB kernel. A transposed-layout fused RCAB chain
(tap-row matmuls + in-kernel CA lane-reduce, the rdb.py machinery) models
at ~1.9x via MXU pass counting (~80 ms/iter) — real but pointless for the
shipped workload: the europe-extent production sweep is 1440 months x
0.204 Mpix-HR = 294 Mpix-HR TOTAL, i.e. ~14 s of device time at today's
rate; the sweep's wall clock is entirely host IO/transport. The kernel
would optimize 14 seconds per century of data. Recorded here so the
trade-off is auditable; the pass model above is the starting point if a
future workload (e.g. global-extent RCAN) changes the calculus.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_rcan.py [bs]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from climsr_tpu.models import create_generator
from climsr_tpu.ops.resize import nearest_downsample


def rcan_flops_per_lr_pixel(n_resgroups=10, n_resblocks=20, n_feats=64, scale=4) -> float:
    """Executed conv FLOPs per LR pixel (multiply+add = 2 FLOPs/MAC)."""
    c2 = n_feats * n_feats
    f = 0.0
    f += n_resgroups * n_resblocks * 2 * (2 * 9 * c2)  # RCAB convs
    f += (n_resgroups + 1) * (2 * 9 * c2)  # per-group tail convs + body tail
    f += 2 * 9 * 3 * n_feats  # head conv 3->64
    # pixel-shuffle tail (scale=4 = two x2 stages): conv 64->256 at 1x and 2x
    f += 2 * 9 * n_feats * (n_feats * 4) * (1 + 4)
    f += 2 * 9 * n_feats * 1 * scale * scale  # final conv 64->1 at HR
    # fusion head at HR (models/rcan.py parity with the reference's SRCNN
    # fusion: 9x9 3->64, 1x1 64->32, 5x5 32->1)
    hr = scale * scale
    f += hr * (2 * 81 * 3 * 64 + 2 * 1 * 64 * 32 + 2 * 25 * 32 * 1)
    return f


def run(bs: int = 16) -> float:
    """Measure and report; returns Mpix-HR/s/chip for bench.py."""
    lr_hw, scale = 113, 4
    model = create_generator(
        "rcan", n_resgroups=10, n_resblocks=20, n_feats=64, reduction=16,
        in_channels=3, out_channels=1, dtype=jnp.bfloat16,
    )
    r = jax.random.PRNGKey(0)
    x = jax.random.normal(r, (bs, lr_hw, lr_hw, 3), jnp.bfloat16)
    e = jax.random.normal(r, (bs, lr_hw * scale, lr_hw * scale, 1), jnp.bfloat16)
    m = jnp.ones((bs, lr_hw * scale, lr_hw * scale, 1), jnp.bfloat16)
    params = model.init(r, x[:1], e[:1], m[:1])["params"]

    def chained(p, x, e, m, n):
        def body(i, x):
            out = model.apply({"params": p}, x, e, m)
            feed = nearest_downsample(out, scale)
            return (x * 0.999 + jnp.concatenate([feed] * 3, axis=-1) * 0.001).astype(x.dtype)

        x = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(x.astype(jnp.float32))

    f = jax.jit(chained, static_argnames="n")
    iters = 8
    t0 = time.perf_counter()
    float(f(params, x, e, m, 1))
    print(f"# compile+first: {time.perf_counter() - t0:.0f}s", file=sys.stderr)
    float(f(params, x, e, m, iters + 1))

    def timed(n):
        t0 = time.perf_counter()
        float(f(params, x, e, m, n))
        return time.perf_counter() - t0

    samples = []
    for _ in range(3):
        t1 = timed(1)
        tn = timed(iters + 1)
        samples.append((tn - t1) / iters)
    dt = sorted(samples)[1]
    hr_pixels = bs * (lr_hw * scale) ** 2
    mpix_s = hr_pixels / dt / 1e6
    fl = rcan_flops_per_lr_pixel()
    tflops = bs * lr_hw * lr_hw * fl / dt / 1e12
    print(
        f"# RCAN 113->452 europe geometry, bs={bs} bf16: {dt * 1e3:.1f} ms/iter = "
        f"{mpix_s:.1f} Mpix-HR/s/chip, ~{tflops:.1f} TFLOP/s "
        f"({tflops / 197 * 100:.1f}% of v5e bf16 peak; analytic {fl / 1e6:.1f} MFLOP/LR px)",
        file=sys.stderr,
    )
    return mpix_s


def main() -> None:
    bs = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 16
    run(bs)


if __name__ == "__main__":
    from climsr_tpu.utils.core import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    main()
