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

Compiled shapes are cached per (tile, batch) so the 1440-month CRU-TS sweep
compiles exactly once.
"""
from __future__ import annotations

from functools import partial
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
    ):
        if overlap >= tile_size // 2:
            raise ValueError(f"overlap {overlap} must be < tile_size/2 ({tile_size // 2})")
        self.scale = scale
        self.tile = tile_size
        self.overlap = overlap
        self.stride = tile_size - 2 * overlap
        self.batch_size = batch_size
        self.compute_dtype = compute_dtype
        self._fn = jax.jit(generator_fn)
        hr_tile = tile_size * scale
        self._weights = jnp.asarray(_feather_window(hr_tile, overlap * scale))[None, :, :, None]

    def _tile_origins(self, size: int):
        """Start offsets covering [0, size) with the last tile snapped back."""
        origins = list(range(0, max(size - self.tile, 0) + 1, self.stride))
        if origins[-1] + self.tile < size:
            origins.append(size - self.tile)
        return origins

    def __call__(self, frame: np.ndarray, extras: Optional[Tuple[np.ndarray, ...]] = None) -> np.ndarray:
        """SR one (H, W, C) frame -> (H*scale, W*scale, C_out) numpy array.

        ``extras``: optional per-frame HR-space conditioning rasters (elevation,
        mask) at (H*scale, W*scale, 1); tiles of them are passed to the
        generator_fn as additional arguments.
        """
        if frame.shape[0] < self.tile or frame.shape[1] < self.tile:
            frame, _ = pad_to_multiple(frame, self.tile)
        h, w = frame.shape[:2]
        ys = self._tile_origins(h)
        xs = self._tile_origins(w)

        lr_tiles = []
        extra_tiles = [[] for _ in (extras or [])]
        for y in ys:
            for x in xs:
                lr_tiles.append(frame[y : y + self.tile, x : x + self.tile])
                for i, ex in enumerate(extras or []):
                    s, t = self.scale, self.tile
                    extra_tiles[i].append(ex[y * s : (y + t) * s, x * s : (x + t) * s])

        n = len(lr_tiles)
        hr_tile = self.tile * self.scale
        out = np.zeros((h * self.scale, w * self.scale, 1), np.float32)
        norm = np.zeros((h * self.scale, w * self.scale, 1), np.float32)
        weights_np = np.asarray(self._weights[0])

        for start in range(0, n, self.batch_size):
            chunk = lr_tiles[start : start + self.batch_size]
            pad_n = self.batch_size - len(chunk)
            batch = np.stack(chunk + [chunk[-1]] * pad_n).astype(np.float32)
            args = [jnp.asarray(batch, self.compute_dtype)]
            for ex_list in extra_tiles:
                ex_chunk = ex_list[start : start + self.batch_size]
                ex_batch = np.stack(ex_chunk + [ex_chunk[-1]] * pad_n).astype(np.float32)
                args.append(jnp.asarray(ex_batch, self.compute_dtype))
            sr = np.asarray(self._fn(*args).astype(jnp.float32))
            for j in range(len(chunk)):
                idx = start + j
                y = ys[idx // len(xs)] * self.scale
                x = xs[idx % len(xs)] * self.scale
                out[y : y + hr_tile, x : x + hr_tile] += sr[j] * weights_np
                norm[y : y + hr_tile, x : x + hr_tile] += weights_np
        return out / np.maximum(norm, 1e-8)


def whole_frame_sr(
    generator_fn: Callable[..., jax.Array],
    frames: np.ndarray,
    extras: Optional[Tuple[np.ndarray, ...]] = None,
    batch_size: int = 8,
    compute_dtype=jnp.bfloat16,
    pad_multiple: int = 8,
) -> np.ndarray:
    """Batched whole-frame SR over a (N, H, W, C) month stack.

    Reference behavior (full 360x720 frames through the net) but batched to
    fill the chip; one compile for the whole series.
    """
    fn = jax.jit(generator_fn)
    n = frames.shape[0]
    outs = []
    for start in range(0, n, batch_size):
        chunk = frames[start : start + batch_size]
        pad_n = batch_size - chunk.shape[0]
        if pad_n:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad_n, axis=0)])
        args = [jnp.asarray(chunk, compute_dtype)]
        if extras is not None:
            for ex in extras:
                ex_b = np.broadcast_to(ex[None], (batch_size,) + ex.shape)
                args.append(jnp.asarray(ex_b, compute_dtype))
        sr = np.asarray(fn(*args).astype(jnp.float32))
        outs.append(sr[: batch_size - pad_n] if pad_n else sr)
    return np.concatenate(outs, axis=0)
