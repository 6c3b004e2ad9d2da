#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Measure whether a Pallas head-backward kernel can beat XLA's emitters.

Round-5 profile (scripts/profile_train_step.py + dump_train_hlo.py) localizes
~28 ms of the 99 ms flagship train step in the HR fusion-head backward, led by
``fusion.328``: the dX of srcnn/conv1 (9x9) restricted to the concat's channel
0 — a bf16[192,128,128,1]-output conv the TPU backend emits via
``EmitInputBatchInLanes`` at ~3.6 TF/s (32.6 GFLOP in 9.1 ms, ~2% MFU).

This probe times candidate replacements STANDALONE before any model wiring:

1. ``dc0_kernel``: transposed layout (64, L). One matmul
   V = Wpack(81->88, 64) @ dA1 (1 M-tile) + 81 masked lane-rolls reduced to
   (1, L). At h*w = 128*128 the dy-taps shift by dy*128 lanes — whole lane
   tiles — so only the dx in {-4..4} rolls are sub-tile rotates.
2. ``dc0_kernel_dyfac``: dy-factored v2 — rows packed (16*dy + dx), 9
   aligned 16-row roll-adds + 9 sub-tile single-row rolls.
3. The NHWC->(C, L) transpose XLA inserts around any transposed-layout
   kernel, timed separately (the relayout tax the kernel must amortize).
4. ``chain_kernel``: the full dX/dW chain bwd mock (loss -> conv3 -> conv2 ->
   conv1 -> conv_last -> dH1) to estimate a whole-span kernel's per-tile cost.

Usage: PYTHONPATH=/root/.axon_site:. python scripts/bench_head_bwd_probe.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, W, C = 192, 128, 128, 64
L = H * W  # one image per grid step


def _masks(h, w, L):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    q = lane % (h * w)
    yy, xx = q // w, q % w
    return yy, xx


def _dc0_kernel(h, w, da1_ref, wp_ref, o_ref, v):
    """V = Wpack(88, 64) @ dA1(64, L); out = sum_t mask_t * roll(V[t], -delta_t)."""
    Lk = da1_ref.shape[1]
    yy, xx = _masks(h, w, Lk)
    v[...] = jnp.dot(wp_ref[...], da1_ref[...].astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    acc = jnp.zeros((1, Lk), jnp.float32)
    for t in range(81):
        dy, dx = divmod(t, 9)
        dy -= 4
        dx -= 4
        delta = dy * w + dx
        ok = (yy + dy >= 0) & (yy + dy < h) & (xx + dx >= 0) & (xx + dx < w)
        blk = v[t : t + 1, :]
        if delta:
            blk = pltpu.roll(blk, shift=(-delta) % Lk, axis=1)
        acc = acc + jnp.where(ok, blk, 0.0)
    o_ref[...] = acc.astype(o_ref.dtype)


def _dc0_kernel_dyfac(h, w, da1_ref, wp_ref, o_ref, v):
    """dy-factored: rows at 16*dyi + dxi; 9 aligned 16-row rolls, 9 sub-tile rolls."""
    Lk = da1_ref.shape[1]
    yy, xx = _masks(h, w, Lk)
    v[...] = jnp.dot(wp_ref[...], da1_ref[...].astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    acc9 = jnp.zeros((16, Lk), jnp.float32)
    for dyi in range(9):
        dy = dyi - 4
        # mask at the DESTINATION lane (validity of source pixel p + dy rows)
        rowok = (yy + dy >= 0) & (yy + dy < h)
        blk = v[16 * dyi : 16 * dyi + 16, :]
        if dy:
            blk = pltpu.roll(blk, shift=(-dy * w) % Lk, axis=1)  # tile-aligned
        acc9 = acc9 + jnp.where(rowok, blk, 0.0)
    acc = jnp.zeros((1, Lk), jnp.float32)
    for dxi in range(9):
        dx = dxi - 4
        colok = (xx + dx >= 0) & (xx + dx < w)
        blk = acc9[dxi : dxi + 1, :]
        if dx:
            blk = pltpu.roll(blk, shift=(-dx) % Lk, axis=1)
        acc = acc + jnp.where(colok, blk, 0.0)
    o_ref[...] = acc.astype(o_ref.dtype)


def dc0_pallas(da1_t, w1c0, variant="flat"):
    """da1_t: (C, B*H*W); w1c0: (9, 9, C) — conv1 weights for concat ch 0."""
    c = da1_t.shape[0]
    b = da1_t.shape[1] // (H * W)
    lanes = H * W
    # dX pairs tap (u, v) of W with dA1[p - u, q - v]; the kernel shifts dA1
    # by +delta(t), so row t must hold the spatially REVERSED weight tap.
    wrows = w1c0[::-1, ::-1].reshape(81, c)
    if variant == "flat":
        wp = jnp.zeros((88, c), jnp.float32).at[:81].set(wrows)
        kern = functools.partial(_dc0_kernel, H, W)
        vrows = 88
    else:
        wp = jnp.zeros((144, c), jnp.float32)
        wp = wp.at[(16 * (jnp.arange(81) // 9) + jnp.arange(81) % 9)].set(wrows)
        kern = functools.partial(_dc0_kernel_dyfac, H, W)
        vrows = 144
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((c, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(wp.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lanes), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, b * lanes), da1_t.dtype),
        scratch_shapes=[pltpu.VMEM((vrows, lanes), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(da1_t, wp)


def dc0_reference(da1, w1c0):
    """XLA oracle: conv(dA1, reversed W) -> [B, H, W, 1] (what fusion.328 does)."""
    wt = w1c0[::-1, ::-1, :, None]  # (9, 9, 64, 1) 'HWIO' with spatial reversal
    dn = jax.lax.conv_dimension_numbers(da1.shape, wt.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(da1, wt.astype(da1.dtype), (1, 1),
                                        [(4, 4), (4, 4)], dimension_numbers=dn)


def timeit(fn, *args, iters=10, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    # chain through a tiny data dependency to defeat async overlap illusions
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"  {label}: {dt * 1e3:.2f} ms")
    return dt


def main() -> None:
    r = jax.random.PRNGKey(0)
    da1 = jax.random.normal(r, (B, H, W, C), jnp.bfloat16)
    w1c0 = jax.random.normal(jax.random.PRNGKey(1), (9, 9, C), jnp.float32) * 0.05

    print(f"# probe at [{B},{H},{W},{C}] bf16 on {jax.devices()[0]}")

    # 0) correctness first (small shape, CPU-friendly shapes still fine on TPU)
    da1_t = jnp.transpose(da1, (3, 0, 1, 2)).reshape(C, B * L)
    ref = dc0_reference(da1, w1c0)
    for variant in ("flat", "dyfac"):
        got = dc0_pallas(da1_t, w1c0, variant).reshape(B, H, W, 1)
        err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
        print(f"  {variant}: max rel err vs XLA conv = {err / scale:.2e}")

    # 1) the XLA op being replaced, standalone
    f_ref = jax.jit(lambda x: dc0_reference(x, w1c0))
    timeit(f_ref, da1, label="XLA conv dX->1ch (fusion.328 standalone)")

    # 2) the relayout tax
    f_tr = jax.jit(lambda x: jnp.transpose(x, (3, 0, 1, 2)).reshape(C, B * L))
    timeit(f_tr, da1, label="NHWC -> (C, L) transpose")

    # 3) kernels (transposed operand already resident)
    da1_t = jax.device_put(da1_t)
    f_flat = jax.jit(lambda x: dc0_pallas(x, w1c0, "flat"))
    timeit(f_flat, da1_t, label="pallas dc0 flat (81 rolls)")
    f_dyf = jax.jit(lambda x: dc0_pallas(x, w1c0, "dyfac"))
    timeit(f_dyf, da1_t, label="pallas dc0 dy-factored")

    # 4) fused: transpose + kernel in one jit (what the model would pay if the
    #    operand arrives NHWC)
    f_both = jax.jit(lambda x: dc0_pallas(jnp.transpose(x, (3, 0, 1, 2)).reshape(C, B * L), w1c0, "dyfac"))
    timeit(f_both, da1, label="transpose + pallas dc0")


if __name__ == "__main__":
    from climsr_tpu.utils.core import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    main()
