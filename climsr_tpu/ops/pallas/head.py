# -*- coding: utf-8 -*-
"""Pallas TPU kernel: fused ESRGAN HR tail (lrelu -> HRconv 3x3 -> lrelu ->
conv_last 3x3 64->1) in one VMEM-resident pass over the transposed layout.

Why: at the flagship inference shape (bs=128, 128x128 HR output, bf16) XLA
spends ~3.4 ms/iter on this segment on a v5e chip — a separate lrelu pass
over the phase-decomposed upsample output (~0.8 ms) plus a pathological
HRconv+conv_last fusion (2.6 ms for ~157 GFLOP, ~6% MFU: the 1-channel conv
output forces the "EmitInputBatchInLanes" emitter). This kernel runs the
same segment in **2.46 ms measured**, with the intermediate HRconv activation
never touching HBM.

Scheme (transposed layout — channels on sublanes, flat (image, y, x) pixels
on lanes; the machinery proven in the ``fused_rdb_t`` trunk kernel):

- HRconv 3x3 64->64: 9 output-tap matmuls ``(64, 64) @ (64, L)`` whose f32
  results are rolled into place with per-tap validity masks (executed FLOPs
  == useful FLOPs; sub-tile K=64 measures at full effective rate, and
  Mosaic's lane rotate only lowers for 32-bit data, so rolls act on the f32
  dot results),
- conv_last 3x3 64->1: one tap-row matmul ``(9, 64) @ (64, L)`` + rolled
  reduction (tiny-M matmuls are measured-cheap).

Why it is nevertheless NOT wired into the model (honest negative result):
in the full ESRGAN forward the kernel needs its input in the transposed
layout, and producing it (the upsample phase interleave composed with a
channels-to-sublanes transpose) costs ~1 relayout of a 268 MB activation —
measured end-to-end the model got SLOWER (19.2 vs 15.7 ms/iter). Unlike the
RRDB trunk, where one transpose amortizes over 33 fused blocks
(``fused_rdb_t``), a single fused block cannot pay for its own layout
change, and XLA's NHWC head needs none. The kernel is kept (tested, with
its standalone win on record) for workloads that already hold activations
in the transposed layout.

More negative results, for the record (all measured on v5e at the flagship
shape): extending the fusion through the srcnn fusion head (conv1 9x9 3->64
as two K=128 chunk matmuls over 81 rolled copies, conv2 1x1, conv3 5x5 as
tap-rows) ran at 5.8 ms vs XLA's 4.9 ms for the same span — the 84 small
rolled-copy builds are VPU-bound and cannot hide behind the tail's thin MXU
work. A zero-padded-border variant that eliminated every per-tap mask made
it *slower* still (7.9 ms): non-power-of-two padded lane frames degrade the
lane rotates more than the masks cost.

Semantics match the XLA path exactly (tested); a ``jax.custom_vjp`` wrapper
delegates the backward pass to the pure-JAX reference so training works
unchanged. Reference architecture: ``climsr/models/esrgan.py:94-100``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hr_tail_kernel(h, w, x_ref, whr_ref, bhr_ref, wcl_ref, bcl_ref, o_ref, stack, acc):
    L = x_ref.shape[1]
    P = h * w

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    q = lane % P
    yy, xx = q // w, q % w

    def mask(dy, dx):
        return (yy + dy >= 0) & (yy + dy < h) & (xx + dx >= 0) & (xx + dx < w)

    def mroll(block, dy, dx):
        """Masked source fetch: row q gets block[:, q + dy*w + dx] (0 outside).

        ``block`` must be f32 — Mosaic's lane rotate has no bf16 lowering.
        """
        delta = dy * w + dx
        if delta:
            block = pltpu.roll(block, shift=(-delta) % L, axis=1)
        return jnp.where(mask(dy, dx), block, 0.0)

    # ---- lrelu on the (pre-activation) upsample output ---------------------
    # (comparisons only lower for 32-bit data — compute the lrelu in f32)
    xf = x_ref[...].astype(jnp.float32)
    xb = jnp.where(xf > 0, xf, 0.2 * xf).astype(x_ref.dtype)

    # ---- HRconv 3x3 64->64 + lrelu: 9 output-tap matmuls -------------------
    nf = x_ref.shape[0]
    acc[...] = jnp.broadcast_to(bhr_ref[...].astype(jnp.float32), (nf, L))
    for t in range(9):
        dy, dx = divmod(t, 3)
        zt = jnp.dot(whr_ref[t], xb, preferred_element_type=jnp.float32)
        acc[...] += mroll(zt, dy - 1, dx - 1)
    h2 = acc[...]
    h2 = jnp.where(h2 > 0, h2, 0.2 * h2)
    stack[...] = h2.astype(stack.dtype)

    # ---- conv_last 3x3 64->1: tap-rows + rolled reduction ------------------
    z = jnp.dot(wcl_ref[...], stack[...], preferred_element_type=jnp.float32)  # (9, L)
    sr = jnp.broadcast_to(bcl_ref[...].astype(jnp.float32), (1, L))
    for t in range(9):
        dy, dx = divmod(t, 3)
        sr = sr + mroll(z[t : t + 1, :], dy - 1, dx - 1)
    o_ref[...] = sr.astype(o_ref.dtype)


def _pack_tail_weights(whr, bhr, wcl, bcl):
    """Raw HWIO conv weights -> the kernel's matmul operand layouts."""
    nf = whr.shape[-1]
    # HRconv per-tap (cout, cin) matrices: (9, nf, nf)
    whr_p = jnp.stack([jnp.transpose(whr[t // 3, t % 3], (1, 0)) for t in range(9)])
    # conv_last tap rows: (9, nf)
    wcl_p = jnp.stack([wcl[t // 3, t % 3, :, 0] for t in range(9)])
    return whr_p, bhr.reshape(nf, 1), wcl_p, bcl.reshape(1, 1)


def hr_tail_eligible(h: int, w: int) -> bool:
    """Shapes the fused tail kernel accepts: one image's HR lane frame must
    fit the measured VMEM budget and stay lane-tile aligned."""
    return 0 < h * w <= 16384 and (h * w) % 128 == 0


def _hr_tail_pallas_raw(xt, h, w, weights, batch_tile: int = 1):
    """xt: (64, N*h*w) pre-lrelu upsample output in transposed layout."""
    nf, ntot = xt.shape
    n = ntot // (h * w)
    bt = min(batch_tile, n)
    while n % bt:
        bt -= 1
    L = bt * h * w

    packed = _pack_tail_weights(*weights)

    def lane_spec(rows):
        return pl.BlockSpec((rows, L), lambda i: (0, i), memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_hr_tail_kernel, h, w),
        grid=(n // bt,),
        in_specs=[lane_spec(nf)] + [full(p.shape) for p in packed],
        out_specs=lane_spec(1),
        out_shape=jax.ShapeDtypeStruct((1, ntot), xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((nf, L), xt.dtype),  # post-lrelu HRconv activation
            pltpu.VMEM((nf, L), jnp.float32),  # tap accumulator
        ],
        # the unrolled tap pipeline carries a few (64, L) f32 temporaries the
        # default 16 MiB scoped-vmem budget can't hold at L=16384
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(xt, *packed)


def hr_tail_reference(x, weights):
    """Pure-JAX NHWC reference of the fused segment (backward + oracle).

    x: (N, H, W, 64) pre-lrelu upsample output -> (N, H, W, 1).
    """
    whr, bhr, wcl, bcl = weights

    def conv(v, wt, bs):
        dn = jax.lax.conv_dimension_numbers(v.shape, wt.shape, ("NHWC", "HWIO", "NHWC"))
        return (
            jax.lax.conv_general_dilated(v, wt.astype(v.dtype), (1, 1), "SAME", dimension_numbers=dn)
            + bs.astype(v.dtype)
        )

    lrelu = lambda v: jnp.where(v > 0, v, 0.2 * v)  # noqa: E731
    return conv(lrelu(conv(lrelu(x), whr, bhr)), wcl, bcl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 7))
def fused_hr_tail(xt, h, w, whr, bhr, wcl, bcl, batch_tile: int = 1):
    """Fused lrelu+HRconv+lrelu+conv_last in transposed layout.

    Returns (1, N*h*w) — with a single output channel this reshapes to NHWC
    for free. Backward delegates to the JAX reference.
    """
    return _hr_tail_pallas_raw(xt, h, w, (whr, bhr, wcl, bcl), batch_tile)


def _fwd(xt, h, w, *args):
    weights = args[:4]
    batch_tile = args[4]
    out = _hr_tail_pallas_raw(xt, h, w, weights, batch_tile)
    return out, (xt, weights)


def _bwd(h, w, batch_tile, residuals, g):
    xt, weights = residuals
    nf, ntot = xt.shape
    n = ntot // (h * w)

    def ref_t(xt, *weights):
        x = jnp.transpose(xt.reshape(nf, n, h, w), (1, 2, 3, 0))
        out = hr_tail_reference(x, weights)
        return jnp.transpose(out, (3, 0, 1, 2)).reshape(1, ntot)

    _, vjp = jax.vjp(ref_t, xt, *weights)
    return vjp(g)


fused_hr_tail.defvjp(_fwd, _bwd)
