# -*- coding: utf-8 -*-
"""Pallas TPU kernel: the fusion head's 9x9 input-gradient to ONE channel.

Round-5 profile of the flagship train step (scripts/profile_train_step.py +
scripts/dump_train_hlo.py): the single worst op is the backward of the
SRCNN fusion head's conv1 (9x9, 3->64) restricted to the concat's channel 0
— the gradient flowing from the pixel loss back into ``conv_last``. XLA
emits this bf16[192,128,128,1]-output conv via ``EmitInputBatchInLanes`` at
~3.6 TF/s (32.6 GFLOP in 9.1 ms/step, ~2% MFU). The elevation/mask channels
are dead (their cotangents are data-input gradients XLA DCEs), so only one
output channel survives — exactly the shape TPU conv emitters handle worst.

Scheme (transposed layout — upstream gradient as (64, L), flat (image, y, x)
pixels on lanes):

1. ONE matmul ``V = Wpack(144, 64) @ dA1(64, L)`` — rows packed at
   ``16*dyi + dxi`` so each 16-row band holds one row-tap's 9 column-taps
   (2 M-tiles, full-K MXU work).
2. 9 row-tap reductions: band ``dyi`` is rolled by ``dy*w`` lanes — at the
   training geometry w == 128, a whole-lane-tile (cheap) rotate — and
   accumulated under the row-validity mask.
3. 9 column-tap reductions: single-row sub-tile rolls by ``dx`` with the
   column-validity mask.

Measured on v5e at the flagship [192,128,128,64] bf16 shape
(scripts/bench_head_bwd_probe.py): 4.25 ms kernel, 5.60 ms including the
NHWC -> (C, L) relayout jitted alongside — vs 9.1 ms for the XLA op it
replaces (max rel deviation 3.4e-3, bf16 accumulation-order noise).

Wired into :class:`climsr_tpu.models.srcnn.SRCNN` via ``pallas_bwd=True``
(the ESRGAN fusion head under ``use_pallas``): a ``jax.custom_vjp`` around
conv1 keeps the forward and the dW/db backward on XLA's well-emitted paths
and swaps ONLY this dX op. Reference architecture:
``/root/reference/climsr/models/srcnn.py:8-18`` (conv1 9x9),
``/root/reference/climsr/models/esrgan.py:100`` (fusion concat).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def conv9_dx_eligible(h: int, w: int, kernel_shape) -> bool:
    """Shapes the kernel covers: 9x9 taps, one image's lane frame in VMEM."""
    kh, kw = kernel_shape[0], kernel_shape[1]
    return kh == 9 and kw == 9 and 0 < h * w <= 16384 and (h * w) % 128 == 0


def _dx_c0_kernel(h, w, g_ref, wp_ref, o_ref, v):
    """See module docstring. ``g_ref``: (cout, L); ``wp_ref``: (144, cout)."""
    L = g_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    q = lane % (h * w)
    yy, xx = q // w, q % w

    v[...] = jnp.dot(wp_ref[...], g_ref[...].astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    acc9 = jnp.zeros((16, L), jnp.float32)
    for dyi in range(9):
        dy = dyi - 4
        # validity masked at the DESTINATION lane (source pixel p + dy rows)
        rowok = (yy + dy >= 0) & (yy + dy < h)
        blk = v[16 * dyi : 16 * dyi + 16, :]
        if dy:
            blk = pltpu.roll(blk, shift=(-dy * w) % L, axis=1)
        acc9 = acc9 + jnp.where(rowok, blk, 0.0)
    acc = jnp.zeros((1, L), jnp.float32)
    for dxi in range(9):
        dx = dxi - 4
        colok = (xx + dx >= 0) & (xx + dx < w)
        blk = acc9[dxi : dxi + 1, :]
        if dx:
            blk = pltpu.roll(blk, shift=(-dx) % L, axis=1)
        acc = acc + jnp.where(colok, blk, 0.0)
    o_ref[...] = acc.astype(o_ref.dtype)


def conv9_dx_c0(g: jax.Array, kernel: jax.Array) -> jax.Array:
    """dX of a SAME-padded 9x9 conv w.r.t. input channel 0 only.

    ``g``: (B, H, W, cout) upstream gradient; ``kernel``: (9, 9, cin, cout)
    HWIO. Returns (B, H, W, 1) — the cotangent of input channel 0. The
    NHWC -> (C, L) relayout runs as a plain XLA transpose feeding the
    kernel (fused into the surrounding jit).
    """
    b, h, w, cout = g.shape
    # dX pairs tap (u, v) with g[p - u, q - v]; the kernel shifts g by
    # +delta, so rows hold the spatially REVERSED taps of channel 0.
    wrows = kernel[::-1, ::-1, 0, :].reshape(81, cout).astype(jnp.float32)
    wp = jnp.zeros((144, cout), jnp.float32)
    wp = wp.at[16 * (jnp.arange(81) // 9) + jnp.arange(81) % 9].set(wrows)

    g_t = jnp.transpose(g, (3, 0, 1, 2)).reshape(cout, b * h * w)
    out = pl.pallas_call(
        functools.partial(_dx_c0_kernel, h, w),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((cout, h * w), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(wp.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, b * h * w), g.dtype),
        scratch_shapes=[pltpu.VMEM((144, h * w), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(g_t, wp)
    return out.reshape(b, h, w, 1)


def _conv_ref(x, kernel, bias, pad):
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), [(pad, pad), (pad, pad)], dimension_numbers=dn
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fusion_conv1(x, kernel, bias, pad: int = 4):
    """9x9 fusion-head conv whose backward uses the Pallas dX-to-channel-0.

    SEMANTIC CONTRACT: the returned input cotangent is exact for channel 0
    and ZERO for channels 1+. Valid ONLY where those channels' gradients are
    structurally discarded — the fusion head's elevation/mask conditioning
    channels, which are always jit data inputs (reference
    ``climsr/models/esrgan.py:100``: concat(out, elev, mask)). Gated by
    ``SRCNN(pallas_bwd=True)``; every other path uses the stock autodiff.
    """
    return _conv_ref(x, kernel, bias, pad)


def _fwd(x, kernel, bias, pad):
    return _conv_ref(x, kernel, bias, pad), (x, kernel, bias)


def _bwd(pad, res, g):
    x, kernel, bias = res
    # dW/db: XLA's emitters are already at this op's architecture floor
    # (round-5 HLO study) — delegate to the stock vjp.
    _, wvjp = jax.vjp(lambda k, b: _conv_ref(x, k, b, pad), kernel, bias)
    dk, db = wvjp(g)
    h, w = x.shape[1], x.shape[2]
    if x.dtype == jnp.float64 or not conv9_dx_eligible(h, w, kernel.shape):
        # exact fallback (x64 gradient goldens; ineligible geometries)
        _, xvjp = jax.vjp(lambda v: _conv_ref(v, kernel, bias, pad), x)
        return xvjp(g)[0], dk, db
    dx0 = conv9_dx_c0(g, kernel)
    dx = jnp.concatenate(
        [dx0] + [jnp.zeros_like(dx0)] * (x.shape[-1] - 1), axis=-1
    ).astype(x.dtype)
    return dx, dk, db


fusion_conv1.defvjp(_fwd, _bwd)
