# -*- coding: utf-8 -*-
"""12-bit fixed-point packing for device->host readback on thin links.

The whole-globe e2e sweep is bound by the device tunnel's D2H bandwidth
(measured 6-17 MB/s with ~0.1 s fixed latency per fetch — scripts/
bench_tunnel.py). The SR output leaves the chip in the NORMALIZED [-1, 1]
domain; a uniform 12-bit code over ``(-RANGE, RANGE)`` carries it in 1.5
bytes/px instead of f16's 2 (-25% bytes) at a BETTER worst-case absolute
error: u12 over (-1.5, 1.5) is 3.7e-4 everywhere, while f16's ulp at
|x|~1 is 4.9e-4. RANGE=1.5 leaves headroom for SR overshoot beyond the
normalized range (values outside are clamped; trained generators stay
within ~[-1.1, 1.1]).

Layout: values are padded to a multiple of 8 and packed 8-per-3 uint32
little-end-first: ``w0 = u0 | u1<<12 | (u2&0xFF)<<24``,
``w1 = u2>>8 | u3<<4 | u4<<16 | (u5&0xF)<<28``,
``w2 = u5>>4 | u6<<8 | u7<<20``. ``pack12`` runs in-jit on device (pure
bit ops); ``unpack12`` is vectorized numpy for the host writer thread.

No reference analogue (the reference reads back full f32 frames over PCIe,
``climsr/inference/inference.py:70-76``); this is TPU-tunnel machinery.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

RANGE = 1.5  # code domain (-RANGE, RANGE); SR overshoot beyond is clamped
_LEVELS = 4095  # 2**12 - 1 code steps
#: worst-case absolute reconstruction error on values inside (-RANGE, RANGE)
MAX_ABS_ERR = RANGE / _LEVELS  # 3.66e-4


def packed_len(n: int) -> int:
    """Number of uint32 words that ``pack12`` emits for ``n`` values."""
    n8 = -(-n // 8)
    return n8 * 3


def pack12(x: jnp.ndarray) -> jnp.ndarray:
    """(..., N) float -> (..., packed_len(N)) uint32; device-side, jit-safe."""
    n = x.shape[-1]
    pad = (-n) % 8
    if pad:
        x = jnp.concatenate([x, jnp.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1)
    xf = x.astype(jnp.float32)
    u = jnp.clip(
        jnp.round((xf + RANGE) * (_LEVELS / (2.0 * RANGE))), 0, _LEVELS
    ).astype(jnp.uint32)
    u = u.reshape(x.shape[:-1] + (-1, 8))
    w0 = u[..., 0] | (u[..., 1] << 12) | ((u[..., 2] & 0xFF) << 24)
    w1 = (u[..., 2] >> 8) | (u[..., 3] << 4) | (u[..., 4] << 16) | ((u[..., 5] & 0xF) << 28)
    w2 = (u[..., 5] >> 4) | (u[..., 6] << 8) | (u[..., 7] << 20)
    return jnp.stack([w0, w1, w2], axis=-1).reshape(x.shape[:-1] + (-1,))


def unpack12(w: np.ndarray, n: int) -> np.ndarray:
    """(..., packed_len(n)) uint32 -> (..., n) float32; host-side numpy."""
    w = np.asarray(w, np.uint32).reshape(w.shape[:-1] + (-1, 3))
    w0, w1, w2 = w[..., 0], w[..., 1], w[..., 2]
    u = np.empty(w.shape[:-1] + (8,), np.uint32)
    u[..., 0] = w0 & 0xFFF
    u[..., 1] = (w0 >> 12) & 0xFFF
    u[..., 2] = ((w0 >> 24) & 0xFF) | ((w1 & 0xF) << 8)
    u[..., 3] = (w1 >> 4) & 0xFFF
    u[..., 4] = (w1 >> 16) & 0xFFF
    u[..., 5] = ((w1 >> 28) & 0xF) | ((w2 & 0xFF) << 4)
    u[..., 6] = (w2 >> 8) & 0xFFF
    u[..., 7] = (w2 >> 20) & 0xFFF
    vals = u.reshape(w.shape[:-2] + (-1,))[..., :n].astype(np.float32)
    return vals * (2.0 * RANGE / _LEVELS) - RANGE
