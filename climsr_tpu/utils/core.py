# -*- coding: utf-8 -*-
"""Misc runtime utilities.

Parity: reference ``climsr/core/utils.py`` — warnings suppression, config
pretty-printer, ``log_step`` timing decorator, ``finish`` logger cleanup.
(The reference's RTX-3090 power-limit nvidia-smi hack is GPU-specific and has
no TPU counterpart; intentionally not ported.)
"""
from __future__ import annotations

import functools
import logging
import time
import warnings
from typing import Any, Callable, Dict, Optional, Sequence

logger = logging.getLogger(__name__)


def extras(ignore_warnings: bool = True) -> None:
    """Apply optional run mutations controlled by config flags (utils.py:17)."""
    if ignore_warnings:
        warnings.filterwarnings("ignore")


def print_config(cfg: Dict[str, Any], fields: Optional[Sequence[str]] = None) -> str:
    """Render the composed config as an indented tree (rich-tree analogue)."""
    lines = []

    def walk(node: Any, indent: int) -> None:
        pad = "  " * indent
        if isinstance(node, dict):
            for k, v in node.items():
                if isinstance(v, (dict, list)):
                    lines.append(f"{pad}{k}:")
                    walk(v, indent + 1)
                else:
                    lines.append(f"{pad}{k}: {v}")
        elif isinstance(node, list):
            for v in node:
                lines.append(f"{pad}- {v}")

    selected = {k: cfg[k] for k in fields} if fields else cfg
    walk(selected, 0)
    out = "\n".join(lines)
    print(out)
    return out


def log_step(prefix: str = "") -> Callable:
    """Decorator logging entry/exit wall time of a step (utils.py:78-113)."""

    def decorator(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            name = prefix or fn.__name__
            logger.info("%s: started", name)
            t0 = time.time()
            try:
                return fn(*args, **kwargs)
            finally:
                logger.info("%s: finished in %.2fs", name, time.time() - t0)

        return wrapper

    return decorator


def finish(loggers: Optional[Sequence[Any]] = None) -> None:
    """Close any loggers that need explicit teardown (wandb-style, utils.py:116)."""
    for lg in loggers or []:
        close = getattr(lg, "close", None) or getattr(lg, "finish", None)
        if callable(close):
            try:
                close()
            except Exception:  # teardown is best-effort
                logger.exception("Failed to close logger %r", lg)


def enable_persistent_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Turn on JAX's persistent XLA compilation cache for CLI runs.

    The flagship jits are remote-compile-heavy on this TPU stack (train step
    ~3 min, whole-frame tiled inference ~5 min, flagship GAN step ~10 min);
    caching makes every run after the first start in seconds. No-op if the
    user already configured a cache dir.
    """
    import os

    import jax

    # jax.config.read() raises for contextmanager-backed flags on current JAX;
    # the attribute read is the supported way and keeps this a true no-op when
    # the user (or a shared prefilled cache) already configured a dir
    if getattr(jax.config, "jax_compilation_cache_dir", None):
        return
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "climsr_tpu", "xla_cache"
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:  # cache is an optimization, never a hard requirement
        logger.debug("could not enable the persistent compilation cache", exc_info=True)
