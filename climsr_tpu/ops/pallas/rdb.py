# -*- coding: utf-8 -*-
"""Pallas TPU kernels: fused ResidualDenseBlock (5 convs + concat growth in VMEM).

Measured on a v5e chip (bf16, nf=64 gc=16, batch 128, 32x32 — the flagship
training shape):

- XLA, standalone dependency-chained RDB: 686 us/RDB.
- XLA, inside the full ESRGAN model: **313 us/RDB** (XLA fuses the concat
  pattern across blocks far better in context than standalone).
- v2 kernel below (NHWC layout, tap-column matmuls): 1675 us — VPU-bound on
  gc=16-lane slice reductions; kept for reference/tests.
- v3 kernel (``fused_rdb_t``, transposed layout): **312 us/RDB at bt=2
  (53% MFU)** — matches the MXU tile-pass model exactly (each (M,K)x(K,L)
  matmul costs ceil(M/128)*ceil(K/128)*L/128 passes at ~21 ns), i.e. the
  kernel was at its layout-imposed floor and equaled in-model XLA; packing
  conv5 as a single (9*nf, 128) matmul (5 M-tiles instead of 3x2) brought it
  to **288 us/RDB — 8% faster than XLA**. Large tiles are faster still: at
  128x128/bt=1 (allowed by the kernel raising its own scoped-VMEM limit via
  ``compiler_params`` — XLA's 16 MiB default capped lanes at 4096 px) the
  equal-pixel rate is **217 us/RDB vs 334 at 32x32/bt=2** (same-day slope
  timing; whole-model 128px: 63.3 vs 31.3 XLA Mpix-HR/s). Raising L via
  ``bt`` alone does NOT help (32x32/bt=8 = 332 us, 64x64/bt=4 = 317 us) —
  the win is the single-image-per-program geometry, so ``bt`` still targets
  ~2048 lanes and large tiles run bt=1. A whole-RRDB fused variant was
  tried and measured SLOWER (1137 us vs 3x288=865 us per RRDB): the trunk is
  MXU-pass-bound, the inter-block HBM transfers are already hidden behind
  compute, and the triple-size weight/scratch footprint hurts Mosaic's grid
  pipelining — so the model chains per-RDB kernels.

Kernel design (v2, "tap-column" scheme):

- grid over the batch; each program owns ``BT`` images entirely in VMEM,
- one zero-padded scratch ``feat`` of (BT, H+2, W+2, nf + 4*gc) channels.
  For the reference config nf=64, gc=16 this is exactly 128 = one lane tile:
  the concat never exists anywhere — growth convs just fill lane sub-ranges,
- every conv is ONE matmul ``X(M,128) @ Wcat(128, 9*cout)`` where X is the
  padded feature map flattened over (batch, y, x) and Wcat packs all nine
  3x3 taps as column blocks. K is always 128 (full MXU K-utilization; rows
  beyond the conv's true cin are zeroed host-side so garbage lanes in
  ``feat`` are masked by construction),
- the 3x3 spatial structure is recovered with nine shifted VMEM slice-adds
  of the tap-column result (VPU work, no HBM traffic),
- conv5 (cout=nf=64) runs as five N=128 tap-pair matmuls (taps padded 9->10),
- LeakyReLU(0.2) fused on the growth outputs, residual ``x + 0.2 * conv5``
  fused into the single HBM write.

MXU pass accounting per RDB (bs=128, 32x32): 4 growth convs x ceil(144/128)=2
column passes + 5 conv5 pair passes = 13 passes x ~25 us = ~320 us floor vs
XLA's 686 us.

Semantics match ``climsr_tpu.models.esrgan.ResidualDenseBlock`` exactly
(tested). Backward passes: the v2 NHWC ``fused_rdb`` delegates its vjp to the
pure-JAX reference; the v3 transposed ``fused_rdb_t``/``fused_rdb_res_t``
carry a fused Pallas BACKWARD kernel (saved-feature custom_vjp — see the
"Training path" section below) so the trunk wins under autodiff too:
measured 98.4 vs 129.2 ms/train-step (+31%) at the flagship bs=192 config.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tap_cat(w: jax.Array, k_pad: int) -> jax.Array:
    """(3, 3, cin, cout) conv weight -> (k_pad, 9*cout) tap-column matrix.

    Column block t = 3*dy + dx holds tap (dy, dx); rows >= cin are zero so the
    matmul can always consume the full 128-channel feature buffer.
    """
    kh, kw, cin, cout = w.shape
    cols = jnp.transpose(w, (2, 0, 1, 3)).reshape(cin, kh * kw * cout)
    return jnp.zeros((k_pad, kh * kw * cout), w.dtype).at[:cin].set(cols)


def _pad8(v: int) -> int:
    return (v + 7) & ~7


def _rdb_kernel(nf, gc, x_ref, wg_ref, bg_ref, w5_ref, b5_ref, o_ref, feat, z, y5):
    bt, h, w, _ = x_ref.shape
    total = nf + 4 * gc
    # scratch width is padded to a sublane multiple so the 4D<->2D reshape
    # around each matmul is layout-free (a 34-row sublane dim would force a
    # full relayout, which blows up Mosaic compilation)
    wp = feat.shape[2]
    m = bt * (h + 2) * wp

    feat[...] = jnp.zeros_like(feat)
    feat[:, 1 : h + 1, 1 : w + 1, :nf] = x_ref[...].astype(feat.dtype)

    # --- growth convs: one (M, 128) @ (128, 9*gc) matmul each ---------------
    for k in range(4):
        xmat = feat[...].reshape(m, total)
        z[...] = jnp.dot(
            xmat, wg_ref[k], preferred_element_type=jnp.float32
        ).reshape(bt, h + 2, wp, 9 * gc)
        acc = bg_ref[k].astype(jnp.float32)  # (1, gc) broadcast
        for t in range(9):
            dy, dx = divmod(t, 3)
            acc = acc + z[:, dy : dy + h, dx : dx + w, t * gc : (t + 1) * gc]
        acc = jnp.where(acc > 0, acc, 0.2 * acc)  # LeakyReLU(0.2)
        off = nf + k * gc
        feat[:, 1 : h + 1, 1 : w + 1, off : off + gc] = acc.astype(feat.dtype)

    # --- conv5: five (M, 128) @ (128, 2*nf) tap-pair matmuls ----------------
    y5[...] = jnp.zeros_like(y5) + b5_ref[...].astype(jnp.float32)
    for p in range(5):
        xmat = feat[...].reshape(m, total)
        zp = jnp.dot(xmat, w5_ref[p], preferred_element_type=jnp.float32).reshape(
            bt, h + 2, wp, 2 * nf
        )
        for j in range(2):
            t = 2 * p + j
            if t > 8:
                break  # tap 9 is zero padding
            dy, dx = divmod(t, 3)
            y5[...] += zp[:, dy : dy + h, dx : dx + w, j * nf : (j + 1) * nf]

    o_ref[...] = (x_ref[...].astype(jnp.float32) + 0.2 * y5[...]).astype(o_ref.dtype)


def _rdb_pallas_raw(x, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, batch_tile: int = 4):
    n, h, w, nf = x.shape
    gc = w1.shape[-1]
    total = nf + 4 * gc
    bt = min(batch_tile, n)
    while n % bt:
        bt -= 1

    # host/trace-side weight packing (constant-folded under jit)
    wg = jnp.stack([_tap_cat(wt, total) for wt in (w1, w2, w3, w4)])  # (4, total, 9*gc)
    bg = jnp.stack([b.reshape(1, gc) for b in (b1, b2, b3, b4)])  # (4, 1, gc)
    w5cat = _tap_cat(w5, total)  # (total, 9*nf)
    w5p = jnp.concatenate([w5cat, jnp.zeros((total, nf), w5cat.dtype)], axis=1)
    w5p = w5p.reshape(total, 5, 2 * nf).transpose(1, 0, 2)  # (5, total, 2*nf) tap pairs
    b5r = b5.reshape(1, nf)

    def batch_spec():
        return pl.BlockSpec((bt, h, w, nf), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_rdb_kernel, nf, gc),
        grid=(n // bt,),
        in_specs=[batch_spec(), full(wg.shape), full(bg.shape), full(w5p.shape), full(b5r.shape)],
        out_specs=batch_spec(),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt, h + 2, _pad8(w + 2), total), x.dtype),  # feat
            pltpu.VMEM((bt, h + 2, _pad8(w + 2), 9 * gc), jnp.float32),  # tap columns
            pltpu.VMEM((bt, h, w, nf), jnp.float32),  # conv5 accumulator
        ],
        interpret=jax.default_backend() == "cpu",  # CPU tests run interpreted
    )(x, wg, bg, w5p, b5r)


# ---------------------------------------------------------------------------
# v3: transposed layout — channels on sublanes, (image, y, x) flat on lanes.
#
# The v2 kernel above is VPU-bound: its tap reduction reads gc=16-lane slices
# (1/8 vector utilization) and the feature writes are partial-lane stores. In
# the transposed layout every vector op is full-width:
#
# - X lives as (C, L) with L = bt*h*w lanes (no spatial padding at all;
#   'SAME' zero-padding becomes 9 precomputed per-tap lane masks),
# - each conv is ONE matmul (9*cout, 128) @ (128, L) — K always 128, M = 144
#   (growth) / 192*3 (conv5 tap-triples), N = thousands of lanes,
# - tap reduction = sublane-slice (aligned, cout rows) + pltpu.roll on lanes
#   (full-width) + masked add,
# - growth outputs are sublane-aligned 16-row stores into the shared buffer.
#
# The layout transpose is done once per TRUNK (33 RDBs amortize it), not per
# RDB — see models/esrgan.py.
# ---------------------------------------------------------------------------


def _tap_rows(w: jax.Array, k_pad: int) -> jax.Array:
    """(3, 3, cin, cout) -> (9*cout, k_pad): row t*cout+c is tap t's weights."""
    kh, kw, cin, cout = w.shape
    rows = jnp.transpose(w, (0, 1, 3, 2)).reshape(kh * kw * cout, cin)
    return jnp.zeros((kh * kw * cout, k_pad), w.dtype).at[:, :cin].set(rows)


def _rdb_t_kernel(nf, gc, h, w, with_res, *refs):
    # growth convs: one (9*gc, 128) @ (128, L) matmul each; conv5: one
    # (9*nf, 128) @ (128, L) matmul (a single 576-row matmul beats three
    # 192-row ones: M-tiles round up to 5 instead of 6, ~7% fewer MXU passes
    # per RDB). With ``with_res`` the enclosing RRDB's 0.2-residual is folded
    # into this block's single HBM write (saves an elementwise pass per RRDB).
    if with_res:
        x_ref, x0_ref, wg_ref, bg_ref, w5_ref, b5_ref, o_ref, feat, z, y5 = refs
    else:
        x_ref, wg_ref, bg_ref, w5_ref, b5_ref, o_ref, feat, z, y5 = refs
        x0_ref = None
    _rdb_t_forward_body(nf, gc, h, w, x_ref, x0_ref, wg_ref, bg_ref, w5_ref, b5_ref, o_ref, feat, z, y5)


def nhwc_to_cl(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (C, N*H*W) — the trunk's transposed device layout."""
    n, h, w, c = x.shape
    return jnp.transpose(x, (3, 0, 1, 2)).reshape(c, n * h * w)


def cl_to_nhwc(x: jax.Array, n: int, h: int, w: int) -> jax.Array:
    c = x.shape[0]
    return jnp.transpose(x.reshape(c, n, h, w), (1, 2, 3, 0))


def _rdb_t_pallas_raw(xt, h, w, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, batch_tile: int = 4, x0t=None):
    """xt: (nf, N*h*w) transposed layout. Returns the same layout.

    With ``x0t`` the kernel emits ``x0 + 0.2 * rdb(xt)`` — the enclosing
    RRDB's residual fused into the block's single HBM write."""
    nf, ntot = xt.shape
    gc = w1.shape[-1]
    total = nf + 4 * gc
    n = ntot // (h * w)
    bt = min(batch_tile, n)
    while n % bt:
        bt -= 1
    L = bt * h * w

    wg = jnp.stack([_tap_rows(wt, total) for wt in (w1, w2, w3, w4)])  # (4, 9*gc, total)
    bg = jnp.stack([b.reshape(gc, 1) for b in (b1, b2, b3, b4)])  # (4, gc, 1)
    w5rows = _tap_rows(w5, total)  # (9*nf, total)
    b5r = b5.reshape(nf, 1)

    def lane_spec():
        return pl.BlockSpec((nf, L), lambda i: (0, i), memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    zrows = max(9 * gc, 9 * nf)
    with_res = x0t is not None
    data_in = [xt] + ([x0t] if with_res else [])
    # XLA's default scoped-VMEM budget is 16 MiB, which caps the kernel at
    # ~4096 lane-pixels; the kernel's true footprint is known exactly, so
    # raise its own limit (and only its own — surrounding XLA ops keep the
    # default) to cover up to 16384-px tiles. Measured at 128x128/bt=1:
    # 224 us/RDB per 131072 px — 19% faster per pixel than the 32x32
    # geometry (larger L amortizes the rolls/masks better).
    itemsize = jnp.dtype(xt.dtype).itemsize
    vmem_bytes = L * (
        total * itemsize  # feat
        + zrows * 4  # z (f32)
        + nf * 4  # y5 (f32)
        + nf * itemsize * (2 + len(data_in))  # in/out blocks (double-buffered)
    ) + 2 * (wg.size + w5rows.size) * itemsize
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=min(100 * 1024 * 1024, max(16 * 1024 * 1024, int(vmem_bytes * 1.25)))
    )
    return pl.pallas_call(
        functools.partial(_rdb_t_kernel, nf, gc, h, w, with_res),
        grid=(n // bt,),
        in_specs=[lane_spec() for _ in data_in]
        + [full(wg.shape), full(bg.shape), full(w5rows.shape), full(b5r.shape)],
        out_specs=lane_spec(),
        out_shape=jax.ShapeDtypeStruct(xt.shape, xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((total, L), xt.dtype),  # feature buffer (the "concat")
            pltpu.VMEM((zrows, L), jnp.float32),  # tap-row matmul result
            pltpu.VMEM((nf, L), jnp.float32),  # conv5 accumulator
        ],
        compiler_params=compiler_params,
        interpret=jax.default_backend() == "cpu",  # CPU tests run interpreted
    )(*data_in, wg, bg, w5rows, b5r)


# ---------------------------------------------------------------------------
# Training path: forward-with-saved-features + a fused Pallas BACKWARD kernel.
#
# The v3 kernels above are forward-only wins: their original custom_vjp
# recomputed the forward through the XLA reference, so training resolved
# use_pallas OFF (a rematerialized forward per step cost more than the 8%
# forward win). The pair below closes that:
#
# - the differentiated forward streams its VMEM feature buffer ``feat``
#   (total = nf + 4*gc rows: x plus every growth activation) to HBM as a
#   second output — the complete residual set. LeakyReLU slopes come from
#   ``sign(h_k)`` (lrelu preserves sign), so no pre-activation save is needed.
# - the backward kernel reuses the forward's masked-roll tap algebra: for each
#   conv, a stack ``zbuf`` of 9 masked+rolled upstream-gradient blocks
#   (zbuf_t[m] = mask_t[m-Δt] * dy[m-Δt]) serves BOTH gradients as single
#   MXU matmuls:
#       dX     = W_colsᵀ (total, 9*cout) @ zbuf (9*cout, L)
#       dW_all = zbuf (9*cout, L) @ featᵀ (L, total)   [accumulated over grid]
#   Growth convs run in reverse order, accumulating into a (total, L) f32
#   ``dfeat``; zero-padded weight rows ≥ cin keep padding garbage out of
#   dfeat by construction, and dW columns ≥ cin are sliced off host-side.
#
# MXU pass model (nf=64, gc=16, per L lanes): dX = 5 (conv5) + 4*2 (growth)
# = 13 passes, dW the same ⇒ backward = 26 vs forward 13 — the canonical
# conv fwd:bwd = 1:2 ratio, with no recompute.
#
# Weight-packing cost: MEASURED DEAD END (round 4). The per-call packings
# (_tap_rows / jnp.stack, rebuilt from live params every step) show up in
# xplane profiles as ~68 `slice` events/step (~10% of profiled compute
# time), which suggests an optimization. It is not one: timing the chained
# flagship forward (bench.py methodology, loop-carried dependency) with the
# weights as closure CONSTANTS — where XLA constant-folds every packing op —
# gives 15.76 ms/iter vs 15.68 ms traced, i.e. zero wall-clock difference.
# The packing dispatches overlap kernel compute entirely; the profiler's
# per-op table double-counts them against the async spans. Do not spend
# time batching the packings across RDBs.
# ---------------------------------------------------------------------------


def _rdb_t_fwd_save_kernel(nf, gc, h, w, with_res, *refs):
    """Forward identical to ``_rdb_t_kernel`` but the feature buffer is an
    OUTPUT ref (streamed to HBM for the backward) instead of scratch."""
    if with_res:
        x_ref, x0_ref, wg_ref, bg_ref, w5_ref, b5_ref, o_ref, feat, z, y5 = refs
    else:
        x_ref, wg_ref, bg_ref, w5_ref, b5_ref, o_ref, feat, z, y5 = refs
        x0_ref = None
    _rdb_t_forward_body(nf, gc, h, w, x_ref, x0_ref, wg_ref, bg_ref, w5_ref, b5_ref, o_ref, feat, z, y5)


def _rdb_t_forward_body(nf, gc, h, w, x_ref, x0_ref, wg_ref, bg_ref, w5_ref, b5_ref, o_ref, feat, z, y5):
    total = nf + 4 * gc
    L = x_ref.shape[1]
    masks = _tap_masks(h, w, L)

    feat[...] = jnp.zeros_like(feat)
    feat[:nf, :] = x_ref[...].astype(feat.dtype)

    for k in range(4):
        z[: 9 * gc, :] = jnp.dot(wg_ref[k], feat[...], preferred_element_type=jnp.float32)
        acc = _tap_reduce(z[: 9 * gc, :], gc, range(9), bg_ref[k], masks, w, L)
        acc = jnp.where(acc > 0, acc, 0.2 * acc)
        off = nf + k * gc
        feat[off : off + gc, :] = acc.astype(feat.dtype)

    z[: 9 * nf, :] = jnp.dot(w5_ref[...], feat[...], preferred_element_type=jnp.float32)
    y5[...] = jnp.broadcast_to(b5_ref[...].astype(jnp.float32), (nf, L))
    y5[...] += _tap_reduce(z[: 9 * nf, :], nf, range(9), jnp.zeros((nf, 1), jnp.float32), masks, w, L)

    rdb_out = x_ref[...].astype(jnp.float32) + 0.2 * y5[...]
    if x0_ref is None:
        o_ref[...] = rdb_out.astype(o_ref.dtype)
    else:
        o_ref[...] = (x0_ref[...].astype(jnp.float32) + 0.2 * rdb_out).astype(o_ref.dtype)


def _tap_masks(h, w, L):
    """Per-tap 'SAME'-padding validity masks over the flat lane axis."""
    P = h * w
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    q = lane % P
    yy, xx = q // w, q % w
    masks = []
    for t in range(9):
        dy, dx = divmod(t, 3)
        ok = (yy + dy - 1 >= 0) & (yy + dy - 1 < h) & (xx + dx - 1 >= 0) & (xx + dx - 1 < w)
        masks.append(ok)
    return masks


def _tap_reduce(zval, cout, taps, bias, masks, w, L):
    acc = jnp.broadcast_to(bias.astype(jnp.float32), (cout, L))
    for j, t in enumerate(taps):
        dy, dx = divmod(t, 3)
        delta = (dy - 1) * w + (dx - 1)
        block = zval[j * cout : (j + 1) * cout, :]
        if delta:
            block = pltpu.roll(block, shift=(-delta) % L, axis=1)
        acc = acc + jnp.where(masks[t], block, 0.0)
    return acc


def _rdb_t_fwd_save_raw(xt, h, w, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, batch_tile, x0t=None):
    """Forward in the transposed layout, returning ``(out, feat)``."""
    nf, ntot = xt.shape
    gc = w1.shape[-1]
    total = nf + 4 * gc
    n = ntot // (h * w)
    bt = min(batch_tile, n)
    while n % bt:
        bt -= 1
    L = bt * h * w

    wg = jnp.stack([_tap_rows(wt, total) for wt in (w1, w2, w3, w4)])
    bg = jnp.stack([b.reshape(gc, 1) for b in (b1, b2, b3, b4)])
    w5rows = _tap_rows(w5, total)
    b5r = b5.reshape(nf, 1)

    def lane_spec(rows):
        return pl.BlockSpec((rows, L), lambda i: (0, i), memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    zrows = max(9 * gc, 9 * nf)
    with_res = x0t is not None
    data_in = [xt] + ([x0t] if with_res else [])
    itemsize = jnp.dtype(xt.dtype).itemsize
    vmem_bytes = L * (
        total * itemsize * 2  # feat output block (double-buffered)
        + zrows * 4
        + nf * 4
        + nf * itemsize * (2 + len(data_in))
    ) + 2 * (wg.size + w5rows.size) * itemsize
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=min(100 * 1024 * 1024, max(16 * 1024 * 1024, int(vmem_bytes * 1.25)))
    )
    return pl.pallas_call(
        functools.partial(_rdb_t_fwd_save_kernel, nf, gc, h, w, with_res),
        grid=(n // bt,),
        in_specs=[lane_spec(nf) for _ in data_in]
        + [full(wg.shape), full(bg.shape), full(w5rows.shape), full(b5r.shape)],
        out_specs=(lane_spec(nf), lane_spec(total)),
        out_shape=(
            jax.ShapeDtypeStruct(xt.shape, xt.dtype),
            jax.ShapeDtypeStruct((total, ntot), xt.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((zrows, L), jnp.float32),  # tap-row matmul result
            pltpu.VMEM((nf, L), jnp.float32),  # conv5 accumulator
        ],
        compiler_params=compiler_params,
        interpret=jax.default_backend() == "cpu",
    )(*data_in, wg, bg, w5rows, b5r)


def _rdb_t_bwd_kernel(nf, gc, h, w, gy_scale, gx_scale, feat_ref, g_ref, wgc_ref, w5c_ref,
                      o_dx, o_dwg, o_dw5, o_dbg, dfeat, zbuf):
    """Fused RDB backward: dX, dW, db for all five convs from saved ``feat``.

    ``zbuf`` block t holds ``roll(mask_t * dy, +Δt)``: lane m of that block is
    the gradient flowing from output lane l = m − Δt, which in the forward
    consumed feat lane l + Δt = m — so ``Wᵀ @ zbuf`` lands input grads on the
    right lanes and ``zbuf @ featᵀ`` is exactly each tap's weight grad. The
    forward's masks make both correct across image boundaries for free.
    """
    total = nf + 4 * gc
    L = g_ref.shape[1]
    first = pl.program_id(0) == 0
    masks = _tap_masks(h, w, L)

    def stack_rolled(val, cout):
        # val: (cout, L) f32. Mask BEFORE rolling (mask belongs to lane l);
        # roll in f32 (Mosaic's rotate needs 32-bit data), cast on store.
        for t in range(9):
            dy, dx = divmod(t, 3)
            delta = (dy - 1) * w + (dx - 1)
            blk = jnp.where(masks[t], val, 0.0)
            if delta:
                blk = pltpu.roll(blk, shift=delta % L, axis=1)
            zbuf[t * cout : (t + 1) * cout, :] = blk.astype(zbuf.dtype)

    def accumulate(ref, value):
        @pl.when(first)
        def _():
            ref[...] = value

        @pl.when(jnp.logical_not(first))
        def _():
            ref[...] += value

    lanes_dot = (((1,), (1,)), ((), ()))  # contract the lane axis of both

    # --- conv5 backward -----------------------------------------------------
    dy5 = g_ref[...].astype(jnp.float32) * gy_scale
    stack_rolled(dy5, nf)
    dfeat[...] = jnp.dot(w5c_ref[...], zbuf[...], preferred_element_type=jnp.float32)
    accumulate(
        o_dw5,
        jax.lax.dot_general(
            zbuf[...], feat_ref[...], dimension_numbers=lanes_dot, preferred_element_type=jnp.float32
        ),
    )

    # --- growth convs, reverse order -----------------------------------------
    for k in (3, 2, 1, 0):
        off = nf + k * gc
        hk = feat_ref[off : off + gc, :].astype(jnp.float32)
        da = dfeat[off : off + gc, :] * jnp.where(hk > 0, 1.0, 0.2)
        accumulate(
            o_dbg.at[k * gc : (k + 1) * gc, :],
            jnp.broadcast_to(jnp.sum(da, axis=1, keepdims=True), (gc, o_dbg.shape[1])),
        )
        stack_rolled(da, gc)
        # zero-padded weight rows >= cin keep later feature rows untouched
        dfeat[...] += jnp.dot(wgc_ref[k], zbuf[: 9 * gc, :], preferred_element_type=jnp.float32)
        accumulate(
            o_dwg.at[k],
            jax.lax.dot_general(
                zbuf[: 9 * gc, :], feat_ref[...], dimension_numbers=lanes_dot,
                preferred_element_type=jnp.float32,
            ),
        )

    o_dx[...] = (g_ref[...].astype(jnp.float32) * gx_scale + dfeat[:nf, :]).astype(o_dx.dtype)


def _untap_rows(rows: jax.Array, cin: int, cout: int, dtype) -> jax.Array:
    """Inverse of ``_tap_rows``: (9*cout, total) grads -> (3, 3, cin, cout)."""
    return rows[:, :cin].reshape(3, 3, cout, cin).transpose(0, 1, 3, 2).astype(dtype)


def _rdb_t_bwd_raw(feat, g, wargs, h, w, batch_tile, gy_scale, gx_scale):
    """Run the backward kernel; return (dx, dw1, db1, ..., dw5, db5)."""
    w1, b1, w2, b2, w3, b3, w4, b4, w5, b5 = wargs
    nf, ntot = g.shape
    gc = w1.shape[-1]
    total = nf + 4 * gc
    n = ntot // (h * w)
    bt = min(batch_tile, n)
    while n % bt:
        bt -= 1
    L = bt * h * w

    # transposed weight packings for the dX matmuls (constant-folded under jit)
    wgc = jnp.stack([_tap_rows(wt, total).T for wt in (w1, w2, w3, w4)])  # (4, total, 9*gc)
    w5c = _tap_rows(w5, total).T  # (total, 9*nf)

    def lane_spec(rows):
        return pl.BlockSpec((rows, L), lambda i: (0, i), memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)

    zrows = max(9 * gc, 9 * nf)
    itemsize = jnp.dtype(g.dtype).itemsize
    vmem_bytes = L * (
        total * itemsize * 2  # feat in (double-buffered)
        + nf * itemsize * 4  # g in + dx out (double-buffered)
        + total * 4  # dfeat f32 scratch
        + zrows * itemsize  # zbuf
    ) + 8 * (wgc.size + w5c.size) * itemsize
    compiler_params = pltpu.CompilerParams(
        vmem_limit_bytes=min(100 * 1024 * 1024, max(16 * 1024 * 1024, int(vmem_bytes * 1.25)))
    )
    dx, dwg, dw5, dbg = pl.pallas_call(
        functools.partial(_rdb_t_bwd_kernel, nf, gc, h, w, gy_scale, gx_scale),
        grid=(n // bt,),
        in_specs=[lane_spec(total), lane_spec(nf), full(wgc.shape), full(w5c.shape)],
        out_specs=(lane_spec(nf), full((4, 9 * gc, total)), full((9 * nf, total)), full((4 * gc, 128))),
        out_shape=(
            jax.ShapeDtypeStruct(g.shape, g.dtype),
            jax.ShapeDtypeStruct((4, 9 * gc, total), jnp.float32),
            jax.ShapeDtypeStruct((9 * nf, total), jnp.float32),
            jax.ShapeDtypeStruct((4 * gc, 128), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((total, L), jnp.float32),  # dfeat accumulator
            pltpu.VMEM((zrows, L), g.dtype),  # masked+rolled grad stack
        ],
        compiler_params=compiler_params,
        interpret=jax.default_backend() == "cpu",
    )(feat, g, wgc, w5c)

    grads = [dx]
    for k, (wt, b) in enumerate(((w1, b1), (w2, b2), (w3, b3), (w4, b4))):
        cin = nf + k * gc
        grads.append(_untap_rows(dwg[k], cin, gc, wt.dtype))
        grads.append(dbg[k * gc : (k + 1) * gc, 0].astype(b.dtype))
    grads.append(_untap_rows(dw5, total, nf, w5.dtype))
    grads.append((gy_scale * jnp.sum(g.astype(jnp.float32), axis=1)).astype(b5.dtype))
    return tuple(grads)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 13))
def fused_rdb_t(xt, h, w, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, batch_tile: int = 4):
    """Transposed-layout fused RDB; fused Pallas forward AND backward."""
    return _rdb_t_pallas_raw(xt, h, w, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, batch_tile)


def _fwd_t(xt, h, w, *args):
    wargs = args[:10]
    batch_tile = args[10]
    out, feat = _rdb_t_fwd_save_raw(xt, h, w, *wargs, batch_tile)
    return out, (feat, wargs)


def _bwd_t(h, w, batch_tile, residuals, g):
    feat, wargs = residuals
    return _rdb_t_bwd_raw(feat, g, wargs, h, w, batch_tile, gy_scale=0.2, gx_scale=1.0)


fused_rdb_t.defvjp(_fwd_t, _bwd_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 14))
def fused_rdb_res_t(xt, x0t, h, w, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, batch_tile: int = 4):
    """``x0 + 0.2 * rdb(xt)`` fused into one kernel (transposed layout) —
    the last dense block of an RRDB with the enclosing residual folded in."""
    return _rdb_t_pallas_raw(xt, h, w, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, batch_tile, x0t=x0t)


def _fwd_res_t(xt, x0t, h, w, *args):
    wargs = args[:10]
    batch_tile = args[10]
    out, feat = _rdb_t_fwd_save_raw(xt, h, w, *wargs, batch_tile, x0t=x0t)
    return out, (feat, wargs)


def _bwd_res_t(h, w, batch_tile, residuals, g):
    feat, wargs = residuals
    # out = x0 + 0.2*(x + 0.2*y5): dx0 = g, inner grads scale by 0.2
    grads = _rdb_t_bwd_raw(feat, g, wargs, h, w, batch_tile, gy_scale=0.04, gx_scale=0.2)
    return (grads[0], g) + grads[1:]


fused_rdb_res_t.defvjp(_fwd_res_t, _bwd_res_t)


def rdb_reference(x, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5):
    """Pure-JAX RDB with identical semantics (backward path + correctness oracle)."""

    def conv(v, wt, bs):
        dn = jax.lax.conv_dimension_numbers(v.shape, wt.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(v, wt.astype(v.dtype), (1, 1), "SAME", dimension_numbers=dn) + bs.astype(
            v.dtype
        )

    lrelu = lambda v: jnp.where(v > 0, v, 0.2 * v)  # noqa: E731
    x1 = lrelu(conv(x, w1, b1))
    x2 = lrelu(conv(jnp.concatenate([x, x1], -1), w2, b2))
    x3 = lrelu(conv(jnp.concatenate([x, x1, x2], -1), w3, b3))
    x4 = lrelu(conv(jnp.concatenate([x, x1, x2, x3], -1), w4, b4))
    x5 = conv(jnp.concatenate([x, x1, x2, x3, x4], -1), w5, b5)
    return x5 * 0.2 + x


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def fused_rdb(x, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, batch_tile: int = 4):
    """VMEM-fused RDB forward; backward delegates to the pure-JAX reference."""
    return _rdb_pallas_raw(x, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, batch_tile)


def _fwd(x, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, batch_tile):
    out = _rdb_pallas_raw(x, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5, batch_tile)
    return out, (x, w1, b1, w2, b2, w3, b3, w4, b4, w5, b5)


def _bwd(batch_tile, residuals, g):
    _, vjp = jax.vjp(rdb_reference, *residuals)
    return vjp(g)


fused_rdb.defvjp(_fwd, _bwd)
