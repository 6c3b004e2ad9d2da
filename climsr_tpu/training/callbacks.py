# -*- coding: utf-8 -*-
"""Trainer callbacks: validation image grids (the reference's LogImagesCallback).

Parity: reference ``climsr/core/callbacks.py:39-440``:

- after validation, pull one val batch, run the generator, and log image grids
  to TensorBoard: HR / elevation / nearest / cubic once (first epoch), SR and
  |error| every epoch,
- masked-NaN rendering with jet (data), inferno (elevation), gray colormaps,
  ocean painted black,
- optional per-sample matplotlib figure panels with MAE/RMSE labels vs the
  nearest/cubic interpolation baselines, saved under ``images/``.
"""
from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import numpy as np

import climsr_tpu.consts as consts

B = consts.batch_items
logger = logging.getLogger(__name__)


def _colorize(arr: np.ndarray, mask: Optional[np.ndarray] = None, cmap_name: str = "jet") -> np.ndarray:
    """(H, W) float -> (H, W, 3) uint8 with NaN/ocean painted black."""
    import matplotlib

    cmap = matplotlib.colormaps[cmap_name].copy()
    cmap.set_bad("black", 1.0)
    arr = np.asarray(arr, np.float32).copy()
    if mask is not None:
        arr[mask <= 0] = np.nan
    finite = np.isfinite(arr)
    vmin = np.nanmin(arr[finite]) if finite.any() else 0.0
    vmax = np.nanmax(arr[finite]) if finite.any() else 1.0
    norm = (arr - vmin) / (vmax - vmin + 1e-12)
    rgba = cmap(np.ma.masked_invalid(norm))
    return (rgba[..., :3] * 255).astype(np.uint8)


def make_grid(images: np.ndarray, masks: Optional[np.ndarray], nrow: int = 8, cmap: str = "jet") -> np.ndarray:
    """(N, H, W) stack -> single (GH, GW, 3) uint8 grid image."""
    n, h, w = images.shape[:3]
    ncol = min(nrow, n)
    nrows = (n + ncol - 1) // ncol
    grid = np.zeros((nrows * h, ncol * w, 3), np.uint8)
    for i in range(n):
        r, c = divmod(i, ncol)
        m = masks[i] if masks is not None else None
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = _colorize(images[i], m, cmap)
    return grid


class LogImagesCallback:
    def __init__(
        self,
        max_images: int = 8,
        save_figures: bool = False,
    ):
        self.max_images = max_images
        self.save_figures = save_figures
        self._static_logged = False

    def on_validation_end(self, trainer, epoch: int, val_metrics: Dict[str, float]) -> None:
        import jax
        import jax.numpy as jnp

        # rank-zero only: TB image logging is guarded inside MetricLogger, but
        # the extra generator forward and the figure PNGs should not run (or
        # race on the same path) once per process under jax.distributed
        if jax.process_index() != 0:
            return
        loader = trainer.val_loader
        batch = next(iter(loader))
        batch.pop("__valid__", None)
        n = min(self.max_images, batch[B.hr].shape[0])
        batch = {k: v[:n] if np.ndim(v) >= 1 else v for k, v in batch.items()}

        params = trainer._generator_params()
        from climsr_tpu.models import FUSION_GENERATORS

        x = jnp.asarray(batch[B.lr], trainer.compute_dtype)
        if trainer.generator_type in FUSION_GENERATORS:
            sr = trainer.g_model.apply(
                {"params": params},
                x,
                jnp.asarray(batch[B.elevation], trainer.compute_dtype),
                jnp.asarray(batch[B.mask], trainer.compute_dtype),
            )
        else:
            sr = trainer.g_model.apply({"params": params}, x)
        sr = np.asarray(sr.astype(jnp.float32))[..., 0]
        hr = batch[B.hr][..., 0]
        mask = batch[B.mask][..., 0]
        error = np.abs(sr - hr)

        step = trainer.global_step
        mlog = trainer.metric_logger
        if not self._static_logged:
            mlog.log_image("val/hr_images", make_grid(hr, mask, cmap="jet"), step)
            mlog.log_image("val/elevation", make_grid(batch[B.elevation][..., 0], mask, cmap="inferno"), step)
            mlog.log_image("val/nearest_interpolation", make_grid(batch[B.nearest][..., 0], mask, cmap="jet"), step)
            mlog.log_image("val/cubic_interpolation", make_grid(batch[B.cubic][..., 0], mask, cmap="jet"), step)
            self._static_logged = True
        mlog.log_image("val/sr_images", make_grid(sr, mask, cmap="jet"), step)
        mlog.log_image("val/error", make_grid(error, mask, cmap="gray"), step)

        if self.save_figures:
            self._save_fig(trainer, batch, sr, error, epoch, step)

    def _save_fig(self, trainer, batch, sr, error, epoch: int, step: int) -> None:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        img_dir = os.path.join(trainer.workdir, "images")
        os.makedirs(img_dir, exist_ok=True)
        hr = batch[B.hr][..., 0]
        nearest = batch[B.nearest][..., 0]
        cubic = batch[B.cubic][..., 0]
        mask = batch[B.mask][..., 0]
        n = hr.shape[0]
        cols = ["HR", "Interp. Nearest", "Interp. Cubic", "SR", "SR Error"]
        fig, axes = plt.subplots(n, len(cols), figsize=(3 * len(cols), 3 * n), squeeze=False)
        for i in range(n):
            panels = [hr[i], nearest[i], cubic[i], sr[i], error[i]]
            for j, (title, panel) in enumerate(zip(cols, panels)):
                ax = axes[i][j]
                shown = panel.copy()
                shown[mask[i] <= 0] = np.nan
                ax.imshow(shown, cmap="jet")
                ax.set_xticks([])
                ax.set_yticks([])
                if j in (1, 2, 3):
                    diff = (panel - hr[i])[mask[i] > 0]
                    mae = float(np.abs(diff).mean()) if diff.size else 0.0
                    rmse = float(np.sqrt(np.square(diff).mean())) if diff.size else 0.0
                    ax.set_xlabel(f"MAE {mae:.3f} / RMSE {rmse:.3f}", fontsize=8)
                if i == 0:
                    ax.set_title(title)
        out = os.path.join(img_dir, f"figure_epoch={epoch:03d}_step={step:06d}.png")
        fig.savefig(out, bbox_inches="tight", dpi=72)
        plt.close(fig)
        logger.info("Saved validation figure panel to %s", out)


class LearningRateMonitor:
    """Logs the generator LR each validation (reference learning_rate_monitor.yaml)."""

    def on_validation_end(self, trainer, epoch: int, val_metrics: Dict[str, float]) -> None:
        # global_step counts MICRO-batches; the schedule advances once per
        # optimizer step (optax MultiSteps), so divide by the accum factor
        opt_step = trainer.global_step // max(1, getattr(trainer, "_accum", 1))
        trainer.metric_logger.log_metrics(
            {"lr-generator": float(trainer.g_schedule(opt_step))}, trainer.global_step
        )


class DeviceStatsMonitor:
    """Logs accelerator memory stats each validation.

    The reference's GPUStatsMonitor callback (``conf/callbacks/
    gpu_stats_monitor.yaml``) samples nvidia-smi; the TPU-native equivalent
    reads XLA's per-device allocator stats (HBM in-use / peak / limit).
    """

    def on_validation_end(self, trainer, epoch: int, val_metrics: Dict[str, float]) -> None:
        import jax

        stats = {}
        for i, dev in enumerate(trainer.mesh.devices.flatten()):
            m = dev.memory_stats() if hasattr(dev, "memory_stats") else None
            if not m:
                continue
            gib = 1 / 2**30
            stats[f"device_stats/dev{i}/bytes_in_use_gib"] = m.get("bytes_in_use", 0) * gib
            stats[f"device_stats/dev{i}/peak_bytes_in_use_gib"] = m.get("peak_bytes_in_use", 0) * gib
            limit = m.get("bytes_limit")
            if limit:
                stats[f"device_stats/dev{i}/utilization"] = m.get("bytes_in_use", 0) / limit
        if stats:
            trainer.metric_logger.log_metrics(stats, trainer.global_step)
        else:
            logger.debug("device memory_stats unavailable on this platform")




class ModelPruningCallback:
    """L1-unstructured magnitude pruning of the generator's weight kernels.

    TPU-native analogue of ``pytorch_lightning.callbacks.ModelPruning`` with
    ``pruning_fn='l1_unstructured'`` (reference
    ``conf/callbacks/model_pruning.yaml``): at every TRAIN-EPOCH END (PL's
    ModelPruning hook point — before validation, so the epoch's val metrics
    and the checkpoint they rank describe the pruned parameters), the
    smallest-|w| ``amount`` fraction of each remaining conv/dense kernel is
    zeroed; masks are cumulative across epochs (PL semantics, whose default
    ``amount=0.5`` is kept). Like PL — which re-applies masks on every
    forward via weight hooks — the mask is enforced every train step:
    ``on_train_batch_end`` multiplies the generator params by the current
    mask on device (one fused elementwise pass, dispatched async), so the
    optimizer cannot drive pruned weights away from zero between
    validations. With ``use_lottery_ticket_hypothesis=True`` the surviving
    weights are rewound to their values captured at fit start
    (``conf/callbacks/lottery_ticket.yaml``).
    """

    def __init__(self, amount: float = 0.5, use_lottery_ticket_hypothesis: bool = False):
        self.amount = float(amount)
        self.use_lottery_ticket_hypothesis = use_lottery_ticket_hypothesis
        self._masks = None
        self._initial = None
        self._device_masks = None
        self._apply_masks = None

    @staticmethod
    def _prunable(leaf) -> bool:
        return hasattr(leaf, "ndim") and leaf.ndim >= 2  # kernels, not biases/scalars

    def on_fit_start(self, trainer) -> None:
        import jax

        if self.use_lottery_ticket_hypothesis:
            self._initial = jax.device_get(trainer._generator_params())

    def on_train_epoch_end(self, trainer, epoch: int) -> None:
        import jax
        import jax.numpy as jnp

        params = jax.device_get(trainer._generator_params())
        if self._masks is None:
            self._masks = jax.tree_util.tree_map(
                lambda w: np.ones_like(np.asarray(w), dtype=bool) if self._prunable(w) else None,
                params,
                is_leaf=lambda x: hasattr(x, "ndim"),
            )

        def prune(w, mask, w0):
            if mask is None:
                return np.asarray(w), None
            w = np.asarray(w)
            alive = np.abs(w)[mask]
            if alive.size == 0:
                return w * mask, mask
            k = int(alive.size * self.amount)
            if k > 0:
                thresh = np.partition(alive, k - 1)[k - 1]
                mask = mask & (np.abs(w) > thresh)
            src = np.asarray(w0) if w0 is not None else w
            return np.where(mask, src, 0.0).astype(w.dtype), mask

        new_params = {}
        flat_p, treedef = jax.tree_util.tree_flatten(params)
        flat_m = jax.tree_util.tree_leaves(
            self._masks, is_leaf=lambda x: x is None or isinstance(x, np.ndarray)
        )
        flat_0 = (
            jax.tree_util.tree_leaves(self._initial)
            if self._initial is not None
            else [None] * len(flat_p)
        )
        pruned, masks = [], []
        for w, m, w0 in zip(flat_p, flat_m, flat_0):
            pw, pm = prune(w, m, w0)
            pruned.append(jnp.asarray(pw))
            masks.append(pm)
        self._masks = jax.tree_util.tree_unflatten(treedef, masks)
        new_params = jax.tree_util.tree_unflatten(treedef, pruned)
        trainer._set_generator_params(new_params)
        # device copies of the masks (flat, aligned with tree_leaves(params))
        # for the cheap per-step re-application
        self._device_masks = tuple(
            None if m is None else jnp.asarray(m, pw.dtype) for m, pw in zip(masks, pruned)
        )
        if self._apply_masks is None:

            def apply(p, mk):
                leaves, tdef = jax.tree_util.tree_flatten(p)
                out = [w if m is None else w * m for w, m in zip(leaves, mk)]
                return jax.tree_util.tree_unflatten(tdef, out)

            # donate the params: unmasked leaves alias straight through and
            # masked ones update in place — the per-step re-application then
            # costs one fused multiply over masked kernels, no tree copy
            self._apply_masks = jax.jit(apply, donate_argnums=(0,))
        total = sum(int(np.asarray(m).size) for m in masks if m is not None)
        zeros = sum(int((~m).sum()) for m in masks if m is not None)
        logger.info(
            "Pruned generator to %.1f%% sparsity%s",
            100.0 * zeros / max(1, total),
            " (lottery-ticket rewind)" if self.use_lottery_ticket_hypothesis else "",
        )

    def on_train_batch_end(self, trainer) -> None:
        if self._device_masks is None:
            return
        trainer._set_generator_params(
            self._apply_masks(trainer._generator_params(), self._device_masks)
        )


def _lottery_ticket() -> ModelPruningCallback:
    return ModelPruningCallback(use_lottery_ticket_hypothesis=True)


CALLBACK_REGISTRY = {
    "log_images": LogImagesCallback,
    "learning_rate_monitor": LearningRateMonitor,
    "device_stats_monitor": DeviceStatsMonitor,
    "model_pruning": ModelPruningCallback,
    "lottery_ticket": _lottery_ticket,
    # the reference's GPUStatsMonitor -> the TPU device-stats monitor
    "gpu_stats_monitor": DeviceStatsMonitor,
}


# config names that are first-class Trainer features, not callback objects
_TRAINER_LEVEL_CALLBACKS = {"early_stopping", "model_checkpoint"}


def build_callbacks(names: Optional[List[str]]) -> List:
    out = []
    for name in names or []:
        if name in CALLBACK_REGISTRY:
            out.append(CALLBACK_REGISTRY[name]())
        elif name not in _TRAINER_LEVEL_CALLBACKS:
            # a typo'd callback silently vanishing costs a whole training run
            raise KeyError(
                f"Unknown callback {name!r}. Available: "
                f"{sorted(CALLBACK_REGISTRY) + sorted(_TRAINER_LEVEL_CALLBACKS)}"
            )
    return out
