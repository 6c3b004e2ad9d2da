# -*- coding: utf-8 -*-
"""ESRGAN generator — RRDB trunk + nearest-upsample head + elev/mask fusion SRCNN.

Parity: reference ``climsr/models/esrgan.py``:

- ``ResidualDenseBlock`` (5 convs, growth gc, LeakyReLU 0.2, out*0.2 + x),
- ``ResidualInResidualDenseBlock`` = 3 RDBs, out*0.2 + x,
- generator: conv_first -> nb RRDBs -> trunk_conv + global skip ->
  [nearest x2 upsample + conv + lrelu] x2 (scale 4) -> HRconv -> conv_last ->
  fusion head ``SRCNN(concat(out, elev_hr, mask_hr))`` (``esrgan.py:100``).

Config defaults follow ``conf/generator/esrgan.yaml`` (nf=64, nb=11, gc=16 in
experiments; class defaults mirror the reference class: nb=23, gc=32).

TPU notes: channel-concat dense blocks are memory-bandwidth heavy; blocks are
wrapped with ``nn.remat`` when ``remat=True`` to trade FLOPs for HBM during
training. All convs run in the module compute dtype (bf16 under training).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from climsr_tpu.models.common import Dtype, TorchConv, leaky_relu
from climsr_tpu.models.srcnn import SRCNN
from climsr_tpu.ops.resize import nearest_upsample


def pallas_trunk_eligible(h: int, w: int) -> bool:
    """Shapes the fused Pallas RDB kernel accepts (see ops/pallas/rdb.py).

    The transposed-layout kernel keeps ``batch_tile * h * w`` lanes of every
    channel in VMEM. The kernel raises its own scoped-VMEM limit to its
    computed footprint (``compiler_params`` in rdb.py — XLA's 16 MiB default
    capped it at 4096 px), which covers tiles up to 16384 px (~52 MiB of the
    128 MiB v5e VMEM at bt=1); 128x128 measured 19% faster per pixel than
    32x32. A 128-multiple keeps the lane axis tile-aligned (no partial-lane
    rolls). Whole-frame inference (360x720 = 259200 px) still falls back to
    the XLA path.
    """
    return 0 < h * w <= 16384 and (h * w) % 128 == 0


class SplitConcatConv(nn.Module):
    """conv3x3 over an implicit concat, computed as a sum of per-part convs.

    ``conv(concat(parts), W) == sum_i conv(parts[i], W[:, :, off_i:off_i+c_i])``
    — mathematically identical (verified to 5e-6 in f32), skipping the concat
    materialization and keeping each conv's contracting dimension MXU-aligned.

    Honest benchmark note (v5e, nf=64, gc=16, bs=128 @ 32x32): at the whole-
    model level this is perf-neutral — 16.0 ms/iter vs 15.8 ms/iter naive —
    XLA already handles the concat+conv pattern well at these shapes. Kept as
    an option (``concat_free=True``) because parameters are byte-identical
    either way and the formulation can win at other channel configurations.
    """

    features: int
    use_bias: bool = True
    kernel_init: Optional[Any] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, parts) -> jax.Array:
        cin = sum(p.shape[-1] for p in parts)
        kernel, bias = _Conv3Params(self.features, self.use_bias, self.kernel_init, name="Conv_0")(cin)
        dtype = self.dtype or parts[0].dtype
        kernel = kernel.astype(dtype)
        dn = jax.lax.conv_dimension_numbers(parts[0].shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        out = None
        off = 0
        for p in parts:
            c = p.shape[-1]
            y = jax.lax.conv_general_dilated(
                p.astype(dtype), kernel[:, :, off : off + c], (1, 1), "SAME", dimension_numbers=dn
            )
            out = y if out is None else out + y
            off += c
        return out if bias is None else out + bias.astype(dtype)


class ResidualDenseBlock(nn.Module):
    nf: int = 64
    gc: int = 32
    dtype: Optional[Dtype] = None
    # concat-free formulation (see SplitConcatConv); identical params either way
    concat_free: bool = False
    # Fused Pallas kernel path (ops/pallas/rdb.py): when set to the spatial
    # (h, w), ``__call__`` takes/returns the transposed (C, N*H*W) layout and
    # runs the whole block as one VMEM-resident kernel. Parameters live at the
    # same paths (convi/Conv_0/{kernel,bias}) — checkpoints interchangeable.
    pallas_hw: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x: jax.Array, outer_residual: Optional[jax.Array] = None) -> jax.Array:
        if self.pallas_hw is not None:
            from climsr_tpu.ops.pallas.rdb import fused_rdb_res_t, fused_rdb_t

            h, w = self.pallas_hw
            dtype = self.dtype or x.dtype
            cins = [self.nf + k * self.gc for k in range(5)]
            couts = [self.gc] * 4 + [self.nf]
            wb = []
            for i, (ci, co) in enumerate(zip(cins, couts), start=1):
                kernel, bias = _NamedConv3(co, name=f"conv{i}")(ci)
                wb += [kernel.astype(dtype), bias.astype(dtype)]
            bt = max(1, 2048 // (h * w))
            if outer_residual is not None:
                # last block of an RRDB: emit outer_residual + 0.2*rdb(x) in
                # the kernel's single HBM write instead of a separate
                # elementwise pass (measured perf-neutral at the flagship
                # shape — the pass hides behind kernel compute — but it
                # strictly removes an op and its memory round trip)
                return fused_rdb_res_t(x.astype(dtype), outer_residual.astype(dtype), h, w, *wb, bt)
            return fused_rdb_t(x.astype(dtype), h, w, *wb, bt)
        assert outer_residual is None, "outer_residual folding is a pallas-path feature"
        if not self.concat_free:
            conv = partial(TorchConv, kernel_size=3, dtype=self.dtype)
            x1 = leaky_relu(conv(self.gc, name="conv1")(x))
            x2 = leaky_relu(conv(self.gc, name="conv2")(jnp.concatenate([x, x1], axis=-1)))
            x3 = leaky_relu(conv(self.gc, name="conv3")(jnp.concatenate([x, x1, x2], axis=-1)))
            x4 = leaky_relu(conv(self.gc, name="conv4")(jnp.concatenate([x, x1, x2, x3], axis=-1)))
            x5 = conv(self.nf, name="conv5")(jnp.concatenate([x, x1, x2, x3, x4], axis=-1))
            return x5 * 0.2 + x
        # keep x (nf channels, MXU-aligned) out of the growth concats; only the
        # gc-sized growth slices are concatenated (16/32/48/64 channels)
        scc = partial(SplitConcatConv, dtype=self.dtype)
        x1 = leaky_relu(scc(self.gc, name="conv1")([x]))
        g = x1
        x2 = leaky_relu(scc(self.gc, name="conv2")([x, g]))
        g = jnp.concatenate([g, x2], axis=-1)
        x3 = leaky_relu(scc(self.gc, name="conv3")([x, g]))
        g = jnp.concatenate([g, x3], axis=-1)
        x4 = leaky_relu(scc(self.gc, name="conv4")([x, g]))
        g = jnp.concatenate([g, x4], axis=-1)
        x5 = scc(self.nf, name="conv5")([x, g])
        return x5 * 0.2 + x


class _NamedConv3(nn.Module):
    """3x3 conv parameters at TorchConv-compatible paths (``Conv_0/{kernel,bias}``)."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        return _Conv3Params(self.features, name="Conv_0")(in_features)


class ResidualInResidualDenseBlock(nn.Module):
    nf: int = 64
    gc: int = 32
    dtype: Optional[Dtype] = None
    concat_free: bool = False
    pallas_hw: Optional[Tuple[int, int]] = None  # transposed-layout fused kernel

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # A whole-RRDB fused kernel was measured SLOWER than three per-RDB
        # kernels (1137 vs 865 us/RRDB on v5e): the trunk is MXU-pass-bound,
        # inter-block HBM transfers are already hidden behind compute, and the
        # triple-size weight/scratch footprint hurts grid pipelining. So the
        # pallas path chains three fused_rdb_t calls.
        rdb = partial(
            ResidualDenseBlock, self.nf, self.gc, self.dtype, self.concat_free, pallas_hw=self.pallas_hw
        )
        out = rdb(name="RDB1")(x)
        out = rdb(name="RDB2")(out)
        if self.pallas_hw is not None:
            return rdb(name="RDB3")(out, outer_residual=x)
        out = rdb(name="RDB3")(out)
        return out * 0.2 + x


class _Conv3Params(nn.Module):
    """Parameter container matching nn.Conv's {kernel, bias} layout."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[Any] = None

    @nn.compact
    def __call__(self, in_features: int):
        from climsr_tpu.models.common import make_torch_bias_init, torch_conv_kernel_init

        kernel = self.param(
            "kernel", self.kernel_init or torch_conv_kernel_init, (3, 3, in_features, self.features)
        )
        if not self.use_bias:
            return kernel, None
        bias = self.param("bias", make_torch_bias_init(9 * in_features), (self.features,))
        return kernel, bias


class FusedUpConv(nn.Module):
    """nearest-2x-upsample + conv3x3 via exact phase decomposition.

    Parameters live under ``<name>/Conv_0/{kernel,bias}`` — the same paths as
    the naive ``TorchConv`` variant, so checkpoints are interchangeable
    between ``fused_upsample`` settings.
    """

    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from climsr_tpu.ops.fused_upsample_conv import nearest_up2_conv3

        kernel, bias = _Conv3Params(self.features, name="Conv_0")(x.shape[-1])
        dtype = self.dtype or x.dtype
        return nearest_up2_conv3(x.astype(dtype), kernel.astype(dtype), bias.astype(dtype))


class ESRGANGenerator(nn.Module):
    in_channels: int = 3  # config parity; flax infers from input
    out_channels: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    scaling_factor: int = 4
    remat: bool = False
    # compute upsample convs via exact phase decomposition on the LR grid
    # (ops/fused_upsample_conv.py: 2.25x fewer MACs, no 4x intermediates);
    # parameters and checkpoints are identical either way
    fused_upsample: bool = True
    # concat-free RDB convs (SplitConcatConv): identical params/checkpoints,
    # measured perf-neutral on v5e at the flagship config (see SplitConcatConv)
    concat_free: bool = False
    # Fused Pallas RDB trunk (ops/pallas/rdb.py): the whole RRDB trunk runs in
    # a transposed (C, N*H*W) layout with each dense block as one VMEM-resident
    # kernel (measured 2.2x the XLA dense-block time on v5e). Transparently
    # falls back to the XLA path for shapes the kernel doesn't cover
    # (pallas_trunk_eligible); parameters/checkpoints identical either way.
    use_pallas: bool = False
    dtype: Optional[Dtype] = None

    def _up_conv(self, fea: jax.Array, name: str) -> jax.Array:
        if not self.fused_upsample:
            return TorchConv(self.nf, kernel_size=3, dtype=self.dtype, name=name)(nearest_upsample(fea, 2))
        return FusedUpConv(self.nf, dtype=self.dtype, name=name)(fea)

    @nn.compact
    def __call__(self, x: jax.Array, elev: jax.Array, mask: jax.Array) -> jax.Array:
        conv = partial(TorchConv, kernel_size=3, dtype=self.dtype)
        block_cls = ResidualInResidualDenseBlock
        if self.remat:
            block_cls = nn.remat(block_cls)

        fea = conv(self.nf, name="conv_first")(x)
        n, h, w, _ = fea.shape
        pallas_hw = (h, w) if self.use_pallas and pallas_trunk_eligible(h, w) else None
        if pallas_hw is not None:
            from climsr_tpu.ops.pallas.rdb import cl_to_nhwc, nhwc_to_cl

            # one layout transpose per trunk; 3*nb fused kernels amortize it
            trunk_t = nhwc_to_cl(fea)
            for i in range(self.nb):
                trunk_t = block_cls(
                    self.nf, self.gc, self.dtype, self.concat_free, pallas_hw=pallas_hw,
                    name=f"RRDB_trunk_{i}",
                )(trunk_t)
            trunk = cl_to_nhwc(trunk_t, n, h, w)
        else:
            trunk = fea
            for i in range(self.nb):
                trunk = block_cls(self.nf, self.gc, self.dtype, self.concat_free, name=f"RRDB_trunk_{i}")(trunk)
        trunk = conv(self.nf, name="trunk_conv")(trunk)
        fea = fea + trunk

        fea = leaky_relu(self._up_conv(fea, "upconv1"))
        if self.scaling_factor == 4:
            fea = leaky_relu(self._up_conv(fea, "upconv2"))

        # NOTE: a fused Pallas HR-tail kernel (lrelu+HRconv+lrelu+conv_last,
        # ops/pallas/head.py) beats XLA standalone (2.46 vs 3.42 ms at the
        # flagship shape) but was measured SLOWER end-to-end (19.2 vs 15.7
        # ms/iter): unlike the trunk, a single block cannot amortize the
        # channels-to-sublanes layout transpose its input needs. So the HR
        # head stays on XLA's NHWC path.
        out = conv(self.out_channels, name="conv_last")(leaky_relu(conv(self.nf, name="HRconv")(fea)))
        # pallas_bwd: under use_pallas the fusion head's conv1 backward uses
        # the Pallas dX-to-channel-0 kernel (ops/pallas/head_bwd.py) — exact
        # for this concat, whose elev/mask channels are data inputs.
        out = SRCNN(
            in_channels=3, out_channels=self.out_channels, dtype=self.dtype,
            pallas_bwd=self.use_pallas, name="srcnn",
        )(jnp.concatenate([out, elev.astype(out.dtype), mask.astype(out.dtype)], axis=-1))
        return out
