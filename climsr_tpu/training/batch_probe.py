# -*- coding: utf-8 -*-
"""auto_scale_batch_size: find the largest batch that fits HBM — WITHOUT OOMing.

Parity: the reference exposes PL's ``auto_scale_batch_size`` trainer knob
(``climsr/core/config.py:144``; PL's Tuner runs trial fits, catches CUDA OOMs
and doubles/bisects). Catching OOMs is the wrong tool on TPU — a real HBM OOM
can wedge the runtime — and is unnecessary: XLA knows the exact memory plan of
a compiled executable before anything runs. So the probe AOT-compiles the
train step at doubling batch sizes on abstract inputs (``jit(...).lower(...)
.compile()`` with ShapeDtypeStructs — no data is materialized) and reads
``compiled.memory_analysis()`` against the device's ``memory_stats()`` limit,
returning the largest power-of-two batch whose plan fits within ``headroom``
of free HBM.

Strategies (PL names): ``'power'`` / True = double until it no longer fits;
``'binsearch'`` = afterwards bisect between the last fit and the first
failure. Backends without memory introspection (CPU tests; some experimental
plugins) fall back to the configured batch size with a warning.
"""
from __future__ import annotations

import logging
from typing import Callable, Dict, Optional, Tuple

import jax

logger = logging.getLogger(__name__)

# trial compiles are pure host work but remote-compile minutes are real; the
# reference's PL tuner default is max_trials=25 (2^25x the start batch) which
# is absurd for climate tiles — 8 doublings = 256x is plenty
MAX_TRIALS = 8


def _device_bytes_limit() -> Optional[int]:
    try:
        stats = jax.devices()[0].memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return stats.get("bytes_limit") or stats.get("bytes_reservable_limit")


def _plan_bytes(compiled) -> Optional[int]:
    """Total device bytes of the executable's memory plan, or None."""
    try:
        mem = compiled.memory_analysis()
    except Exception:
        return None
    if mem is None:
        return None
    # AOT memory analysis field names differ across backends/versions; sum
    # what exists. Arguments/outputs are the live train state + batch;
    # temp/generated covers activations and scratch.
    total = 0
    found = False
    for field in (
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "temp_size_in_bytes",
        "generated_code_size_in_bytes",
        "alias_size_in_bytes",
    ):
        v = getattr(mem, field, None)
        if v is not None:
            found = True
            total += int(v)
    return total if found else None


def fits(
    step_fn: Callable, state, batch_template: Dict, bs: int, headroom: float, shards: int = 1
) -> Optional[Tuple[bool, int]]:
    """AOT-compile ``step_fn(state, batch)`` at batch size ``bs``.

    ``shards``: the data-parallel factor. The trainer shards every batch over
    the mesh's data axis, so the per-device footprint of a GLOBAL batch ``bs``
    is that of a single-device run at ``ceil(bs / shards)`` (activations
    scale with the local slice; params/optimizer state are replicated) —
    probing the global size against one device's limit would over-report by
    ~shards x and shrink batches that actually fit.

    Returns (fits, plan_bytes), or None when the backend can't report memory.
    """
    limit = _device_bytes_limit()
    if limit is None:
        return None
    local_bs = -(-bs // max(1, shards))  # ceil
    sds = jax.tree_util.tree_map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    batch = {
        k: jax.ShapeDtypeStruct((local_bs,) + tuple(v.shape[1:]), v.dtype)
        for k, v in batch_template.items()
    }
    try:
        compiled = jax.jit(step_fn).lower(sds, batch).compile()
    except Exception as e:  # a compile-time resource error IS "does not fit"
        msg = str(e).lower()
        if "memory" in msg or "resource" in msg or "exceeds" in msg:
            return False, 0
        raise
    plan = _plan_bytes(compiled)
    if plan is None:
        return None
    return plan <= headroom * limit, plan


def probe_max_batch_size(
    step_fn: Callable,
    state,
    batch_template: Dict,
    start: int,
    mode: str = "power",
    headroom: float = 0.9,
    max_trials: int = MAX_TRIALS,
    shards: int = 1,
    _fits: Optional[Callable] = None,
) -> int:
    """Largest GLOBAL batch size whose per-device memory plan fits the device.

    ``batch_template``: one real (or ShapeDtypeStruct) batch — only shapes
    beyond the leading batch dim and dtypes are read. ``shards`` is the
    data-parallel factor (see :func:`fits`). ``_fits`` overrides the probe
    predicate (tests). Returns ``start`` unchanged when the backend reports
    no memory stats.
    """
    check = _fits or (lambda bs: fits(step_fn, state, batch_template, bs, headroom, shards))
    first = check(start)
    if first is None:
        logger.warning(
            "auto_scale_batch_size: backend reports no memory stats; keeping batch_size=%d",
            start,
        )
        return start
    ok, plan = first
    if not ok:
        # configured batch already over budget: halve until it fits
        bs = start
        while bs > 1:
            bs //= 2
            res = check(bs)
            if res is None:
                return start
            if res[0]:
                logger.warning(
                    "auto_scale_batch_size: configured batch_size=%d does not fit; scaled DOWN to %d",
                    start, bs,
                )
                return bs
        raise ValueError(f"auto_scale_batch_size: even batch_size=1 exceeds device memory (start={start})")

    good, bad = start, None
    bs = start
    for _ in range(max_trials):
        bs *= 2
        res = check(bs)
        if res is None:
            return good
        if res[0]:
            good = bs
        else:
            bad = bs
            break
    if mode == "binsearch" and bad is not None:
        lo, hi = good, bad
        while hi - lo > max(1, lo // 8):  # ~12% resolution, bounded compiles
            mid = (lo + hi) // 2
            res = check(mid)
            if res is None:
                break
            if res[0]:
                lo = mid
            else:
                hi = mid
        good = lo
    logger.info("auto_scale_batch_size: selected batch_size=%d (started at %d)", good, start)
    return good
