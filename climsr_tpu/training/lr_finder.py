# -*- coding: utf-8 -*-
"""Learning-rate range test (the reference's ``auto_lr_find``/``lr_find_only``).

Parity: ``climsr/cli/train.py:98-109`` delegates to PL's LR finder; this is
the same procedure implemented directly: sweep LR exponentially from
``min_lr`` to ``max_lr`` over ``num_steps`` training steps, record the loss,
and suggest the LR at the steepest descent of the smoothed curve (PL/fastai
heuristic). Writes ``lr_find.png`` + ``lr_find.csv`` into the workdir.
"""
from __future__ import annotations

import logging
import math
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from climsr_tpu.data.pipeline import VALID_KEY, device_prefetch

logger = logging.getLogger(__name__)


def lr_range_test(
    trainer,
    min_lr: float = 1e-7,
    max_lr: float = 1.0,
    num_steps: int = 100,
    smooth_beta: float = 0.98,
) -> Tuple[float, Dict[str, List[float]]]:
    """Run the sweep on a fresh copy of the trainer's state; returns (suggestion, history).

    Uses an SGD-free trick: reuses the existing optimizer but scales the
    gradient update by (lr_t / base_lr) — exact for any chained
    ``scale_by_learning_rate`` optimizer with a constant base schedule.
    """
    import jax.numpy as jnp
    import optax

    import climsr_tpu.consts as consts
    from climsr_tpu.models import FUSION_GENERATORS
    from climsr_tpu.training.tasks.pretrain import pixel_loss_fn

    B = consts.batch_items
    model = trainer.g_model
    gen_type = trainer.generator_type
    loss_fn = pixel_loss_fn(gen_type)
    params = jax.device_get(trainer._generator_params())
    tx = optax.sgd(1.0)  # raw step; lr applied manually
    opt_state = tx.init(params)

    gamma = math.exp(math.log(max_lr / min_lr) / max(1, num_steps - 1))

    augment_kwargs = getattr(trainer, "_augment_kwargs", None)

    @jax.jit
    def step(params, opt_state, batch, lr):
        if augment_kwargs is not None:
            from climsr_tpu.ops.augment import augment_and_assemble

            batch = augment_and_assemble(batch, jax.random.PRNGKey(0), gen_type, **augment_kwargs)

        def compute_loss(p):
            x = batch[B.lr].astype(trainer.compute_dtype)
            if gen_type in FUSION_GENERATORS:
                sr = model.apply({"params": p}, x, batch[B.elevation].astype(trainer.compute_dtype),
                                 batch[B.mask].astype(trainer.compute_dtype))
            else:
                sr = model.apply({"params": p}, x)
            return loss_fn(sr.astype(jnp.float32), batch[B.hr].astype(jnp.float32))

        loss, grads = jax.value_and_grad(compute_loss)(params)
        updates, opt_state = tx.update(jax.tree_util.tree_map(lambda g: g * lr, grads), opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    lrs: List[float] = []
    losses: List[float] = []
    smoothed: List[float] = []
    avg = 0.0
    lr = min_lr

    def cycling_batches():
        import jax.numpy as jnp

        epoch = 0
        store = getattr(trainer, "train_store", None)
        while True:
            trainer.train_loader.set_epoch(epoch)
            if store is not None:
                for idx in trainer.train_loader:
                    yield {k: jnp.take(v, jnp.asarray(idx), axis=0) for k, v in store.items()}
            else:
                yield from device_prefetch(iter(trainer.train_loader), trainer.batch_sharding)
            epoch += 1

    i = 0
    for batch in cycling_batches():
        if i >= num_steps:
            break
        batch.pop(VALID_KEY, None)
        params, opt_state, loss = step(params, opt_state, batch, lr)
        loss = float(loss)
        if not np.isfinite(loss):
            logger.info("LR finder stopping at lr=%.3g (non-finite loss)", lr)
            break
        avg = smooth_beta * avg + (1 - smooth_beta) * loss
        corrected = avg / (1 - smooth_beta ** (i + 1))
        if smoothed and corrected > 4 * min(smoothed):
            logger.info("LR finder stopping at lr=%.3g (loss diverged)", lr)
            break
        lrs.append(lr)
        losses.append(loss)
        smoothed.append(corrected)
        lr *= gamma
        i += 1

    if len(smoothed) < 5:
        suggestion = min_lr
    else:
        log_lrs = np.log10(lrs)
        grads = np.gradient(np.asarray(smoothed), log_lrs)
        # skip the first/last few noisy points
        lo, hi = 2, max(3, len(grads) - 2)
        suggestion = float(lrs[lo + int(np.argmin(grads[lo:hi]))])

    history = {"lr": lrs, "loss": losses, "smoothed": smoothed}
    _save_outputs(trainer.workdir, history, suggestion)
    logger.info("LR finder suggestion: %.3g", suggestion)
    return suggestion, history


def _save_outputs(workdir, history: Dict[str, List[float]], suggestion: float) -> None:
    import csv

    workdir = Path(workdir)
    with open(workdir / "lr_find.csv", "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["lr", "loss", "smoothed"])
        for row in zip(history["lr"], history["loss"], history["smoothed"]):
            writer.writerow(row)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots()
        ax.plot(history["lr"], history["smoothed"])
        ax.set_xscale("log")
        ax.axvline(suggestion, color="r", linestyle="--", label=f"suggestion {suggestion:.2g}")
        ax.set_xlabel("learning rate")
        ax.set_ylabel("smoothed loss")
        ax.legend()
        fig.savefig(workdir / "lr_find.png", bbox_inches="tight")
        plt.close(fig)
    except Exception:  # plotting is best-effort
        pass
