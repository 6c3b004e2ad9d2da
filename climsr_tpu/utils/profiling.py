# -*- coding: utf-8 -*-
"""Per-op device-time reports from a JAX xplane trace.

The reference's ``profiler=advanced``/``pytorch`` (PL AdvancedProfiler /
PyTorchProfiler) produce per-function / per-op time tables. The TPU-native
equivalent derives the same information from the xplane trace that
``jax.profiler.trace`` writes: XLA op events on the device planes are
aggregated by op name into a self/total-time table — real device times from
the hardware trace, not host-side wrappers (which the axon transport's async
completion would render meaningless anyway).

The xplane protobuf schema ships with tensorflow
(``tensorflow.tsl.profiler.protobuf.xplane_pb2``) — imported lazily so the
trainer never pays the TF import unless an advanced report is requested; with
no TF available the caller falls back to the stage-time table.
"""
from __future__ import annotations

import logging
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional, Tuple

logger = logging.getLogger(__name__)


def find_xplane_files(profile_dir) -> List[Path]:
    return sorted(Path(profile_dir).rglob("*.xplane.pb"))


def _load_xspace(path: Path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    space.ParseFromString(path.read_bytes())
    return space


def aggregate_device_ops(profile_dir) -> Optional[Dict[str, Tuple[float, int]]]:
    """op name -> (total device time in seconds, event count).

    On real device planes only the "XLA Ops"/"Async XLA Ops" lines are
    aggregated — the sibling "Steps"/"XLA Modules" lines span the same wall
    time (an op is inside a module is inside a step), so counting every line
    would triple-count and label rows with bare step numbers. The CPU backend
    (tests) has no named op lines; there every line except the host "python"
    tracing line is used. Returns None when no trace or no proto support
    exists.
    """
    files = find_xplane_files(profile_dir)
    if not files:
        return None
    try:
        spaces = [_load_xspace(f) for f in files]
    except Exception as e:  # TF absent or proto mismatch
        logger.warning("xplane parse unavailable (%s)", e)
        return None

    def collect(planes) -> Dict[str, Tuple[float, int]]:
        totals: Dict[str, Tuple[float, int]] = defaultdict(lambda: (0.0, 0))
        for plane in planes:
            # display_name is the short HLO op name ("fusion.78"); name holds
            # the full HLO instruction text on TPU planes
            meta = {
                m_id: (m.display_name or m.name)
                for m_id, m in plane.event_metadata.items()
            }
            op_lines = [l for l in plane.lines if l.name in ("XLA Ops", "Async XLA Ops")]
            lines = op_lines or [l for l in plane.lines if l.name != "python"]
            for line in lines:
                for event in line.events:
                    op = meta.get(event.metadata_id) or f"op#{event.metadata_id}"
                    secs, cnt = totals[op]
                    totals[op] = (secs + event.duration_ps * 1e-12, cnt + 1)
        return dict(totals)

    all_planes = [p for space in spaces for p in space.planes]
    # real accelerator planes first ("/device:TPU:0", "gpu:0", ...)
    device = [p for p in all_planes if (p.name or "").startswith("/device:") or "TPU" in (p.name or "")]
    totals = collect(device)
    if not totals:
        # CPU backend (tests): XLA op events live on the "/host:CPU" plane
        totals = collect(p for p in all_planes if (p.name or "") == "/host:CPU")
    return totals or None


_ASYNC_PREFIXES = ("copy-start", "copy-done", "all-reduce-start", "all-gather-start",
                   "collective-permute-start", "send", "recv", "async")


def _is_async_span(op: str) -> bool:
    return op.lstrip("%").startswith(_ASYNC_PREFIXES)


def format_op_table(totals: Dict[str, Tuple[float, int]], top: int = 40) -> str:
    """AdvancedProfiler-style table: ops ranked by total device time.

    Async DMA/collective spans (copy-start etc.) OVERLAP compute — their
    durations measure transfer latency, not occupied core time — so they are
    aggregated into one summary row instead of polluting the compute ranking.
    """
    compute = {k: v for k, v in totals.items() if not _is_async_span(k)}
    async_secs = sum(t for k, (t, _) in totals.items() if _is_async_span(k))
    async_cnt = sum(c for k, (_, c) in totals.items() if _is_async_span(k))
    grand = sum(t for t, _ in compute.values()) or 1.0
    rows = sorted(compute.items(), key=lambda kv: -kv[1][0])[:top]
    width = max((len(n) for n, _ in rows), default=10)
    width = min(width, 72)
    lines = [f"  {'op':<{width}}  {'total':>10}  {'count':>7}  {'mean':>9}  {'%':>5}"]
    for op, (secs, cnt) in rows:
        shown = op if len(op) <= width else op[: width - 1] + "…"
        lines.append(
            f"  {shown:<{width}}  {secs * 1e3:8.2f}ms  {cnt:7d}  {secs / max(cnt, 1) * 1e6:7.1f}us  {secs / grand * 100:4.1f}"
        )
    lines.append(f"  {'TOTAL (compute events)':<{width}}  {grand * 1e3:8.2f}ms")
    if async_cnt:
        lines.append(
            f"  {'async DMA/collective spans (overlap compute)':<{width}}  "
            f"{async_secs * 1e3:8.2f}ms  {async_cnt:7d}"
        )
    return "\n".join(lines)


def advanced_profile_report(profile_dir, top: int = 40) -> Optional[str]:
    totals = aggregate_device_ops(profile_dir)
    if not totals:
        return None
    return format_op_table(totals, top=top)
