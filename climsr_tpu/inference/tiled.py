# -*- coding: utf-8 -*-
"""Statically-shaped whole-frame and overlap-tiled sliding-window SR.

The reference feeds entire frames (360x720 CRU-TS, 113x113 europe extent)
through the generator one at a time (``inference/inference.py:56-70``,
batch_size=1). XLA wants static shapes and the MXU wants large batches, so
this module provides:

- :func:`pad_to_multiple` — reflect-pad a frame so H/W divide the tile grid,
- :class:`TiledSR` — cut fixed-size LR tiles with overlap, run them through a
  jitted generator in large batches, and blend the SR tiles back with a
  separable feathering window (linear ramp over the overlap — weights sum to
  1 everywhere, removing seam artifacts),
- whole-frame mode (tile_size=None) that jits one fixed frame shape —
  reference behavior, but batched over months instead of one-by-one.

Tiling runs **on device**: the LR frame is uploaded once (~3 MB for the
360x720 globe) and HR conditioning rasters once per series; tile extraction
(static strided slices), the generator forward, feather-blending and the
overlap-normalization all happen inside one jit. Host traffic per frame is
just frame-in + blended-SR-out, ~6-30x less than shipping overlapping tiles
plus per-tile elevation/mask copies — the difference between minutes and
hours over a thin host<->TPU link for the 1440-month CRU-TS sweep. The
blended HR accumulator is kept 2-D (H, W): a trailing unit channel would be
lane-padded 128x by XLA (measured 2 GB for the 1440x2880 globe).

Compiled shapes are cached per frame shape so the sweep compiles exactly once.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def pad_to_multiple(frame: np.ndarray, multiple: int) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Reflect-pad (H, W, C) on bottom/right so H, W divide ``multiple``."""
    h, w = frame.shape[:2]
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph or pw:
        pad = [(0, ph), (0, pw)] + [(0, 0)] * (frame.ndim - 2)
        frame = np.pad(frame, pad, mode="reflect")
    return frame, (h, w)


def _feather_window(tile: int, overlap: int) -> np.ndarray:
    """Separable blending weights: linear ramps across the overlap region."""
    w1d = np.ones(tile, np.float32)
    if overlap > 0:
        ramp = (np.arange(1, overlap + 1, dtype=np.float32)) / (overlap + 1)
        w1d[:overlap] = ramp
        w1d[-overlap:] = ramp[::-1]
    return np.outer(w1d, w1d)


class TiledSR:
    """Overlap-tiled SR runner around a jitted generator forward.

    generator_fn(lr_batch) -> sr_batch must be shape-polymorphic in batch
    count only; tile shapes are fixed at construction.
    """

    def __init__(
        self,
        generator_fn: Callable[[jax.Array], jax.Array],
        scale: int,
        tile_size: int = 128,
        overlap: int = 16,
        batch_size: int = 64,
        compute_dtype=jnp.bfloat16,
        output_dtype=jnp.float32,
        post_fn: Optional[Callable[[jax.Array, jax.Array], jax.Array]] = None,
        pack_indices: Optional[np.ndarray] = None,
        pack12: bool = False,
    ):
        """``post_fn(out_hw_f32, post_args) -> out_hw``: optional device-side
        postprocessing of the blended full-resolution canvas inside the same
        jit (e.g. denormalization with per-frame min/max passed via
        ``device_call(post_args=...)``) — host work that would otherwise cost
        a single-core pass per frame runs free on the accelerator.

        ``pack_indices``: optional flat int32 indices into the (H*s * W*s)
        output; when set, :meth:`device_call` returns ``out.ravel()[idx]``
        (1-D) instead of the full frame. For ocean-masked climate rasters the
        land fraction is ~29%, so shipping only land pixels cuts device->host
        bytes 3.4x on the thin tunnel the e2e sweep is bound by; the caller
        scatters into a NaN canvas (np.full + flat[idx] = vals, ~ms).

        ``pack12`` (requires ``pack_indices``): quantize the packed land
        vector to 12-bit fixed point on device (ops/pack12.py) — uint32
        words at 1.5 bytes/px, 25% fewer D2H bytes than f16 at a better
        worst-case absolute error (3.7e-4 vs f16's 4.9e-4 ulp near |x|=1,
        both on the normalized [-1, 1] output). The caller unpacks with
        :func:`climsr_tpu.ops.pack12.unpack12`.
        """
        if overlap >= tile_size // 2:
            raise ValueError(f"overlap {overlap} must be < tile_size/2 ({tile_size // 2})")
        self.scale = scale
        self.tile = tile_size
        self.overlap = overlap
        self.stride = tile_size - 2 * overlap
        self.batch_size = batch_size
        self.compute_dtype = compute_dtype
        # float16 halves the HBM->host readback (the e2e bottleneck on thin
        # links) at ~5e-4 relative error on the [-1, 1] normalized output
        self.output_dtype = output_dtype
        self._gen = generator_fn
        self._post_fn = post_fn
        self._pack_idx = None if pack_indices is None else np.asarray(pack_indices, np.int32)
        if pack12 and self._pack_idx is None:
            raise ValueError("pack12 packs the gathered land vector; it requires pack_indices")
        self._pack12 = pack12
        hr_tile = tile_size * scale
        self._weights = _feather_window(hr_tile, overlap * scale)
        self._extras_dev: Optional[Tuple[jax.Array, ...]] = None
        self._static_lr_dev: Optional[jax.Array] = None
        self._compiled = {}

    def _regular_grid(self, size: int):
        """(padded_size, origins) for a UNIFORM stride grid covering ``size``.

        Instead of snapping the last tile back (which makes the grid
        irregular), the frame is reflect-padded device-side so origins are an
        exact arithmetic sequence — the uniform grid is what lets the blend
        run as 4 dense parity-group adds instead of one update-slice per tile
        (120 tiles/global frame at the 64/8 default: measured compile- and
        runtime-dominant).
        """
        if size <= self.tile:
            return self.tile, [0]
        n_steps = -(-(size - self.tile) // self.stride)  # ceil
        padded = self.tile + n_steps * self.stride
        return padded, list(range(0, padded - self.tile + 1, self.stride))

    def set_extras(self, extras: Optional[Tuple[np.ndarray, ...]]) -> None:
        """Upload frame-invariant HR conditioning rasters (elevation, mask) once."""
        self._extras_dev = (
            None if extras is None else tuple(jnp.asarray(e, self.compute_dtype) for e in extras)
        )

    def set_static_lr_channels(self, chans: Optional[np.ndarray]) -> None:
        """Upload frame-invariant trailing LR input channels ONCE per series.

        The CRU-TS inference frames are assembled as [climate, elevation_lr,
        mask_lr] (inference/datasets.py) — only channel 0 varies per month.
        With ``chans`` set to the (H, W, C-1) invariant tail,
        :meth:`device_call` accepts the 1-channel varying frame and the jit
        concatenates the channels on device: per-frame host->device bytes
        drop 3x (0.5 MB vs 1.5 MB bf16 for the 360x720 globe) on the thin
        tunnel the e2e sweep is bound by."""
        self._static_lr_dev = None if chans is None else jnp.asarray(chans, self.compute_dtype)

    def _build(self, h: int, w: int, k: int = 1, has_static: bool = False):
        """One jit per (frame shape, frame-batch k): tiles -> generator -> blend.

        ``k`` frames are processed per dispatch (``device_call_many``): the
        tile batch is k-fold larger (better MXU occupancy at small grids) and
        the per-call host round-trip — measured ~25 ms on the tunnel-attached
        chip, comparable to one frame's whole transport — is amortized k-fold.
        """
        hp, ys = self._regular_grid(h)
        wp, xs = self._regular_grid(w)
        origins = [(y, x) for y in ys for x in xs]
        t, s, bs = self.tile, self.scale, self.batch_size
        ht = t * s
        st = self.stride * s
        n = len(origins)
        n_y, n_x = len(ys), len(xs)
        w_const = jnp.asarray(self._weights)  # (ht, ht) f32
        # parity-group blend needs adjacent-only overlap (tile <= 2*stride)
        grouped = t <= 2 * self.stride and n > 4

        def blend_grouped(tiles_w: jax.Array) -> jax.Array:
            """(n, ht, ht) weighted tiles -> (hp*s, wp*s) accumulated canvas.

            Tiles overlap only their immediate neighbors, so the even/odd
            parity groups along each axis are internally non-overlapping:
            zero-pad each tile to the group pitch G=2*stride, lay each group
            out as ONE reshape/transpose, and add the four shifted canvases —
            4 dense adds total, vs one update-slice per tile.
            """
            G = 2 * st
            tiles_g = jnp.pad(tiles_w, ((0, 0), (0, G - ht), (0, G - ht)))
            tiles_g = tiles_g.reshape(n_y, n_x, G, G)
            out = jnp.zeros((hp * s + 2 * G, wp * s + 2 * G), jnp.float32)
            for py in (0, 1):
                for px in (0, 1):
                    sub = tiles_g[py::2, px::2]
                    ny_p, nx_p = sub.shape[:2]
                    if ny_p == 0 or nx_p == 0:
                        continue
                    canvas = sub.transpose(0, 2, 1, 3).reshape(ny_p * G, nx_p * G)
                    out = out.at[
                        py * st : py * st + ny_p * G, px * st : px * st + nx_p * G
                    ].add(canvas)
            return out[: hp * s, : wp * s]

        def blend_loop(tiles_w: jax.Array) -> jax.Array:
            out = jnp.zeros((hp * s, wp * s), jnp.float32)
            for i, (y, x) in enumerate(origins):
                out = out.at[y * s : y * s + ht, x * s : x * s + ht].add(tiles_w[i])
            return out

        blend = blend_grouped if grouped else blend_loop

        pack_idx = None if self._pack_idx is None else jnp.asarray(self._pack_idx)
        use_pack12 = self._pack12
        post_fn = self._post_fn

        def run(frames: jax.Array, post_args: jax.Array, *rest: jax.Array) -> jax.Array:
            # frames: (k, h, w, Cvar); rest = (static_lr?,) + hr_extras
            if has_static:
                static, extras = rest[0], rest[1:]
                frames = jnp.concatenate(
                    [frames, jnp.broadcast_to(static[None], (k,) + static.shape)], axis=-1
                )
            else:
                extras = rest
            if (hp, wp) != (h, w):  # uniform-grid reflect padding, on device
                frames = jnp.pad(
                    frames, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)), mode="reflect"
                )
                extras = tuple(
                    jnp.pad(ex, ((0, (hp - h) * s), (0, (wp - w) * s)) + ((0, 0),) * (ex.ndim - 2),
                            mode="reflect")
                    for ex in extras
                )
            # origin-major tile order: (n, k, t, t, C) -> (n*k, ...), so the
            # per-origin HR extras repeat k-fold in matching order
            tiles = jnp.stack([frames[:, y : y + t, x : x + t] for y, x in origins])
            tiles = tiles.reshape((n * k,) + tiles.shape[2:])
            ex_tiles = [
                jnp.repeat(
                    jnp.stack([ex[y * s : (y + t) * s, x * s : (x + t) * s] for y, x in origins]),
                    k, axis=0,
                )
                for ex in extras
            ]
            nk = n * k
            if nk <= bs:
                sr = self._gen(tiles, *ex_tiles)
            else:
                # balanced chunks: m = ceil(nk/bs) map steps of ceil(nk/m)
                # tiles — same in-flight cap, minimal padding (a naive nk->bs
                # split padded a 24-tile globe grid to 2x16, +33% dead MXU)
                m = -(-nk // bs)
                cs = -(-nk // m)
                pad = m * cs - nk
                padded = [jnp.concatenate([a, a[: 1].repeat(pad, 0)]) if pad else a for a in (tiles, *ex_tiles)]
                chunked = [a.reshape((m, cs) + a.shape[1:]) for a in padded]
                sr = jax.lax.map(lambda args: self._gen(*args), tuple(chunked))
                sr = sr.reshape((-1,) + sr.shape[2:])[:nk]
            sr = sr[..., 0].astype(jnp.float32).reshape(n, k, ht, ht)
            sr = sr.transpose(1, 0, 2, 3) * w_const  # (k, n, ht, ht)
            out = jax.vmap(blend)(sr)  # (k, hp*s, wp*s)
            norm = blend(jnp.broadcast_to(w_const, (n, ht, ht)))  # constant-folded by XLA
            out = out / jnp.maximum(norm, 1e-8)[None]
            out = out[:, : h * s, : w * s]
            if post_fn is not None:
                out = jax.vmap(post_fn)(out, post_args)
            if pack_idx is not None:
                out = out.reshape(k, -1)[:, pack_idx]
                if use_pack12:
                    from climsr_tpu.ops.pack12 import pack12 as pack12_fn

                    return pack12_fn(out)
            return out.astype(self.output_dtype)

        return jax.jit(run)

    def device_call(
        self,
        frame: np.ndarray,
        extras: Optional[Tuple[np.ndarray, ...]] = None,
        post_args: Tuple[float, ...] = (),
    ) -> jax.Array:
        """Dispatch SR of one frame and return the (H*scale, W*scale) DEVICE
        array without blocking — the building block of the pipelined e2e path
        (inference/run.py): the caller reads it back (``np.asarray``) on a
        writer thread while the device already runs the next frame.

        ``post_args``: per-frame scalars for the construction-time ``post_fn``
        (e.g. this month's vmin/vmax) — traced jit inputs, so varying them
        never recompiles. With ``pack_indices`` set the return is the 1-D
        gathered vector instead of the frame. With static LR channels set
        (:meth:`set_static_lr_channels`) pass only the VARYING channels."""
        out = self.device_call_many(
            frame[None], extras=extras, post_args=np.asarray(post_args, np.float32)[None]
        )
        return out[0]

    def device_call_many(
        self,
        frames: np.ndarray,
        extras: Optional[Tuple[np.ndarray, ...]] = None,
        post_args: Optional[np.ndarray] = None,
    ) -> jax.Array:
        """Dispatch SR of a (k, H, W[, C]) frame GROUP in one jit call.

        Returns (k, H*scale, W*scale) — or (k, n_pack) with ``pack_indices``.
        One compile per (frame shape, k): callers should use a fixed group
        size and pad the final group (repeat the last frame, drop the
        outputs). Grouping amortizes the per-dispatch host round-trip
        (~25 ms measured over the device tunnel — as long as one frame's
        whole transport) and widens the generator batch at small tile grids.
        """
        if frames.ndim == 3:
            frames = frames[..., None]
        k = frames.shape[0]
        pre_padded = frames.shape[1] < self.tile or frames.shape[2] < self.tile
        if pre_padded:
            if self._pack_idx is not None:
                raise ValueError(
                    "pack_indices address the unpadded (H*scale, W*scale) frame; "
                    f"frame {frames.shape[1:3]} smaller than tile {self.tile} would be "
                    "pre-padded and misalign the gather"
                )
            ph, pw = (-frames.shape[1]) % self.tile, (-frames.shape[2]) % self.tile
            if ph or pw:
                frames = np.pad(frames, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        h, w = frames.shape[1:3]
        if extras is not None:
            ex_dev = tuple(jnp.asarray(e, self.compute_dtype) for e in extras)
        else:
            ex_dev = self._extras_dev or ()
        if pre_padded and ex_dev:
            # the HR extras must track the pre-padded frame exactly (tile
            # slicing in run() assumes ex.shape == frame.shape * scale); the
            # in-jit regular-grid padding only covers the compiled shape
            m = self.tile * self.scale

            def _pad_hr(e):
                ph, pw = (-e.shape[0]) % m, (-e.shape[1]) % m
                if ph or pw:
                    e = jnp.pad(e, ((0, ph), (0, pw)) + ((0, 0),) * (e.ndim - 2), mode="reflect")
                return e

            ex_dev = tuple(_pad_hr(e) for e in ex_dev)
        static = self._static_lr_dev
        if static is not None and static.shape[:2] != (h, w):
            raise ValueError(
                f"static LR channels {static.shape[:2]} do not match the frame {(h, w)}"
            )
        key = (h, w, frames.shape[-1], len(ex_dev), k, static is not None)
        if key not in self._compiled:
            self._compiled[key] = self._build(h, w, k=k, has_static=static is not None)
        if post_args is None:
            post_args = np.zeros((k, 0), np.float32)
        static_args = (static,) if static is not None else ()
        return self._compiled[key](
            jnp.asarray(frames, self.compute_dtype),
            jnp.asarray(post_args, jnp.float32),
            *static_args,
            *ex_dev,
        )

    def __call__(
        self,
        frame: np.ndarray,
        extras: Optional[Tuple[np.ndarray, ...]] = None,
        post_args: Tuple[float, ...] = (),
    ) -> np.ndarray:
        """SR one (H, W, C) frame -> (H*scale, W*scale, 1) numpy array.

        ``extras``: optional HR-space conditioning rasters (elevation, mask) at
        (H*scale, W*scale, 1), passed to generator_fn as additional arguments.
        Frame-invariant extras should be uploaded once via :meth:`set_extras`;
        passing them here transfers them again on every call. With
        ``pack_indices`` set the output is a 1-D gathered vector, not a frame
        — use :meth:`device_call` (the pipelined path) instead.
        """
        if self._pack_idx is not None:
            raise ValueError(
                "TiledSR.__call__ returns a cropped (H*scale, W*scale, 1) frame, but "
                "pack_indices makes device_call return a packed 1-D vector — call "
                "device_call() and scatter the result yourself"
            )
        orig_hw = frame.shape[:2]
        out = self.device_call(frame, extras, post_args=post_args)
        return np.asarray(out)[: orig_hw[0] * self.scale, : orig_hw[1] * self.scale, None]


def whole_frame_sr(
    generator_fn: Callable[..., jax.Array],
    frames: np.ndarray,
    extras: Optional[Tuple[np.ndarray, ...]] = None,
    batch_size: int = 8,
    compute_dtype=jnp.bfloat16,
) -> np.ndarray:
    """Batched whole-frame SR over a (N, H, W, C) month stack.

    Reference behavior (full 360x720 frames through the net) but batched to
    fill the chip; one compile for the whole series. Frame-invariant extras
    (elevation/mask rasters) are uploaded ONCE and broadcast to the batch
    inside the jit — not re-shipped per chunk (a 1440-month sweep would
    otherwise push ~GBs of duplicate rasters over the host link).
    """
    if extras is not None:
        ex_dev = tuple(jnp.asarray(e, compute_dtype) for e in extras)

        def fn(fr, *exs):
            return generator_fn(
                fr, *(jnp.broadcast_to(e[None], (fr.shape[0],) + e.shape) for e in exs)
            )

    else:
        ex_dev = ()
        fn = generator_fn
    fn = jax.jit(fn)
    n = frames.shape[0]
    outs = []
    for start in range(0, n, batch_size):
        chunk = frames[start : start + batch_size]
        pad_n = batch_size - chunk.shape[0]
        if pad_n:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad_n, axis=0)])
        sr = np.asarray(fn(jnp.asarray(chunk, compute_dtype), *ex_dev).astype(jnp.float32))
        outs.append(sr[: batch_size - pad_n] if pad_n else sr)
    return np.concatenate(outs, axis=0)
