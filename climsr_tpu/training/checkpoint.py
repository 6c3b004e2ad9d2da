# -*- coding: utf-8 -*-
"""Checkpointing: orbax-backed save/restore with top-k tracking by hp_metric.

Parity: the reference's ModelCheckpoint callback (monitor hp_metric, mode=min,
save_top_k, ``conf/callbacks/model_checkpoint.yaml``), resume
(``cli/train.py:91-93``) and the generator-only fine-tune restore
(``cli/train.py:112-121``, rcan's tail-tolerant ``load_state_dict``).

State is saved as a pure pytree (params/opt_state/step) plus the composed
config snapshot — the role the pickled ``HydraInstantiator`` plays in
reference checkpoints (``core/task.py:228-233``).
"""
from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, directory, save_top_k: int = 100, mode: str = "min"):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        # PL ModelCheckpoint semantics: save_top_k=0 disables checkpointing
        # (save() becomes a no-op unless forced, e.g. the preemption save);
        # save_top_k=-1 keeps everything.
        self.save_top_k = int(save_top_k)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=save_top_k if save_top_k > 0 else None,
            best_fn=(lambda m: m["hp_metric"]) if save_top_k > 0 else None,
            best_mode=mode,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(
        self,
        step: int,
        state: Any,
        hp_metric: Optional[float] = None,
        config: Optional[Dict] = None,
        force: bool = False,
    ) -> None:
        if self.save_top_k == 0 and not force:
            return
        metrics = {"hp_metric": float(hp_metric)} if hp_metric is not None else None
        self._mgr.save(step, args=ocp.args.StandardSave(state), metrics=metrics)
        if config is not None and jax.process_index() == 0:
            cfg_path = self.directory / "config.json"
            if not cfg_path.exists():
                cfg_path.write_text(json.dumps(config, indent=2, default=str))

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    @property
    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint found in {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def close(self) -> None:
        self._mgr.close()


def restore_pytree(path, template: Any = None) -> Any:
    """Restore a raw pytree from a checkpoint directory (any step layout)."""
    path = Path(path).absolute()
    # accept either a manager root (containing step dirs) or a single step dir
    if (path / "_CHECKPOINT_METADATA").exists() or (path / "state").exists() or (path / "default").exists():
        step_dir = path
    else:
        step_dirs = sorted((d for d in path.iterdir() if d.is_dir() and d.name.isdigit()), key=lambda d: int(d.name))
        if not step_dirs:
            raise FileNotFoundError(f"No checkpoint steps under {path}")
        step_dir = step_dirs[-1]
    with ocp.StandardCheckpointer() as ckptr:
        target = step_dir / "default" if (step_dir / "default").exists() else step_dir
        if template is None:
            return ckptr.restore(target)
        return ckptr.restore(target, target=template)


def extract_generator_params(restored: Any) -> Any:
    """Pull the generator param tree out of a restored checkpoint object.

    The state may be a TrainState dict ({'params': ...}), a GAN state
    ({'g_params': ...}), a bare param tree, or a dataclass-like object with
    those attributes. Key-presence checks, not truthiness: a present-but-empty
    params dict must NOT fall through to the whole state
    (opt_state/step/d_params)."""
    if isinstance(restored, dict):
        if "params" in restored:
            return restored["params"]
        if "g_params" in restored:
            return restored["g_params"]
        return restored
    params = getattr(restored, "params", None)
    if params is not None:
        return params
    return getattr(restored, "g_params", restored)


def restore_generator_params(path, current_params: Any) -> Any:
    """Generator-only restore for fine-tuning (cli/train.py:112-121 analogue).

    Loads a checkpointed state and grafts its generator params into
    ``current_params``, tolerating missing/new leaves (rcan.py:195-219's
    lenient tail handling): leaves present in both with matching shapes are
    copied, everything else keeps the fresh initialization.
    """
    from climsr_tpu.interop.torch_import import is_torch_checkpoint, load_reference_generator_params

    if is_torch_checkpoint(path):
        # reference PL .ckpt: translate the torch weights, then graft as usual
        _, source = load_reference_generator_params(path)
    else:
        source = extract_generator_params(restore_pytree(path))

    flat_src = dict(_flatten(source))
    out, n_copied, n_skipped = _graft(current_params, flat_src, prefix=())
    logger.info("Generator restore: %d leaves copied, %d kept fresh", n_copied, n_skipped)
    return out


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


def _graft(current, flat_src: Dict, prefix):
    n_copied = 0
    n_skipped = 0

    def walk(node, pfx):
        nonlocal n_copied, n_skipped
        if isinstance(node, dict):
            return {k: walk(v, pfx + (k,)) for k, v in node.items()}
        src = flat_src.get(pfx)
        if src is not None and getattr(src, "shape", None) == getattr(node, "shape", None):
            n_copied += 1
            return jax.numpy.asarray(src, dtype=node.dtype)
        n_skipped += 1
        return node

    return walk(current, prefix), n_copied, n_skipped
