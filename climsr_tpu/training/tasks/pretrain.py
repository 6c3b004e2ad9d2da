# -*- coding: utf-8 -*-
"""Pixel-loss pre-training task: one fused, donated, sharded train step.

Parity: reference ``climsr/task/pl_generator_pre_training.py`` +
``climsr/core/task.py``:

- loss = MSE for srcnn, L1 otherwise (``task.py:141``),
- training_step = pixel loss on (sr, hr) (``pl_generator_pre_training.py:18-33``),
- val/test step: denormalize, zero ocean pixels via mask, pixel loss + the
  16-metric suite (``task.py:262-300``).

TPU design: the whole step (fwd + bwd + optimizer) is one ``jax.jit`` with the
batch sharded over the mesh's data axis and donated state — XLA emits the
gradient psum over ICI (the DDP/NCCL equivalent), fuses the optimizer update,
and keeps params in place (donation avoids a full param copy per step).
Forward runs in bf16 (model dtype), loss/grads accumulate in f32.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

import climsr_tpu.consts as consts
from climsr_tpu.data.normalization import minmax_denormalize, zscore_denormalize
from climsr_tpu.metrics.suite import compute_metric_suite
from climsr_tpu.training.train_state import TrainState

B = consts.batch_items


def pixel_loss_fn(generator_type: str) -> Callable:
    if generator_type == consts.models.srcnn:
        return lambda sr, hr: jnp.mean(jnp.square(sr - hr))
    return lambda sr, hr: jnp.mean(jnp.abs(sr - hr))


def _forward(model, generator_type: str, params, batch, compute_dtype):
    from climsr_tpu.models import apply_generator_batch

    return apply_generator_batch(generator_type, model, params, batch, compute_dtype)


def make_pretrain_step(
    model,
    generator_type: str,
    tx: optax.GradientTransformation,
    compute_dtype=jnp.bfloat16,
    donate: bool = True,
    in_shardings: Any = None,
    out_shardings: Any = None,
    augment: Optional[Dict] = None,
    augment_seed: int = 0,
    store: Optional[Dict] = None,
    zero: Optional[Dict] = None,
    spatial: Optional[Dict] = None,
) -> Callable[[TrainState, Dict], Tuple[TrainState, Dict[str, jax.Array]]]:
    """``augment``: when set (dict of augment_and_assemble kwargs), the batch
    carries raw {hr, elevation, mask} tiles and flips/rot90 + LR synthesis run
    on device inside this step (ops/augment.py).

    ``store``: device-resident tile store ({hr, elevation, mask} stacked on
    HBM); the step then takes an int32 index vector instead of a batch and
    gathers on device — zero per-step host transfer.

    ``zero``: DeepSpeed-ZeRO-style partitioning over the mesh (reference
    ``conf/plugins/deepspeed*.yaml``), expressed as GSPMD sharding
    constraints: ``{"stage": 2|3, "shardings": <pytree of NamedShardings
    aligned with params>}``. Stage 2 constrains the gradients to the sharded
    specs (XLA then lowers the DP gradient sum to a reduce-scatter, runs the
    optimizer on shards, and all-gathers the updated parameters). Stage 3
    additionally keeps ``state.params`` persistently sharded: the forward
    gathers them on use (an all-gather XLA schedules with the first
    consumers), and the with_sharding_constraint VJP delivers the gradients
    pre-sharded. Optimizer-state sharding (stage 1) is the caller's
    ``device_put`` of ``state.opt_state`` — orthogonal to this hook.

    ``spatial``: spatial-shard training (kwargs of
    ``parallel.halo.spatial_sharded_model_forward`` — mesh/axis/halo/scale/
    batch_axis): the generator forward runs H-sharded over the mesh with a
    differentiable halo exchange, the conv-net analogue of context
    parallelism for frames too large per chip (europe-extent 452x452
    fine-tuning). The backward retraces the ppermute over ICI; the loss and
    optimizer update below are unchanged (the sharded ``sr`` flows through
    GSPMD)."""
    loss_fn = pixel_loss_fn(generator_type)
    zero_stage = (zero or {}).get("stage", 0)
    zero_shardings = (zero or {}).get("shardings")
    spatial_fwd = None
    if spatial is not None:
        from climsr_tpu.parallel.halo import spatial_sharded_model_forward

        spatial_fwd = spatial_sharded_model_forward(model, generator_type, **spatial)
    # loss/grad accumulation dtype: f32 for bf16/f32 compute, f64 under x64
    # (keeps the f64 gradient-golden parity tests exact)
    acc_dtype = jnp.promote_types(jnp.float32, compute_dtype)

    def step(state: TrainState, batch: Dict) -> Tuple[TrainState, Dict[str, jax.Array]]:
        if store is not None:
            indices = batch
            batch = {k: jnp.take(v, indices, axis=0) for k, v in store.items()}
        if augment is not None:
            from climsr_tpu.ops.augment import augment_and_assemble

            rng = jax.random.fold_in(jax.random.PRNGKey(augment_seed), state.step)
            batch = augment_and_assemble(batch, rng, generator_type, **augment)

        def compute_loss(params):
            if zero_stage >= 3 and zero_shardings is not None:
                # gather-on-use: the persistent params are sharded; XLA
                # all-gathers each leaf where it is first consumed, and the
                # helper's custom VJP keeps the parameter cotangent sharded
                # (see parallel/mesh.py:zero_gather_on_use).
                from climsr_tpu.parallel.mesh import zero_gather_on_use

                params = zero_gather_on_use(params, zero_shardings)
            if spatial_fwd is not None:
                sr = spatial_fwd(
                    params,
                    batch[B.lr].astype(compute_dtype),
                    batch[B.elevation].astype(compute_dtype) if B.elevation in batch else None,
                    batch[B.mask].astype(compute_dtype) if B.mask in batch else None,
                )
            else:
                sr = _forward(model, generator_type, params, batch, compute_dtype)
            return loss_fn(sr.astype(acc_dtype), batch[B.hr].astype(acc_dtype))

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        if zero_stage >= 2 and zero_shardings is not None:
            # ZeRO-2: pin the gradients to the sharded layout — under GSPMD
            # the DP gradient all-reduce then lowers to reduce-scatter, the
            # optimizer update runs on shards, and the updated params are
            # all-gathered once below.
            grads = jax.lax.with_sharding_constraint(grads, zero_shardings)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if zero_stage >= 3 and zero_shardings is not None:
            # ZeRO-3: params stay persistently sharded between steps
            new_params = jax.lax.with_sharding_constraint(new_params, zero_shardings)
        new_state = state.replace(step=state.step + 1, params=new_params, opt_state=new_opt_state)
        metrics = {"train/loss": loss, "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    kwargs = {}
    if in_shardings is not None:
        kwargs["in_shardings"] = in_shardings
    if out_shardings is not None:
        kwargs["out_shardings"] = out_shardings
    return jax.jit(step, donate_argnums=(0,) if donate else (), **kwargs)


def make_eval_step(
    model,
    generator_type: str,
    normalization_method: str = "minmax",
    normalization_range: Tuple[float, float] = (-1.0, 1.0),
    zscore_mean: float = 0.0,
    zscore_std: float = 1.0,
    compute_dtype=jnp.bfloat16,
    prefix: str = consts.stages.val,
) -> Callable[[Any, Dict], Dict[str, jax.Array]]:
    """Validation/test step: the reference's common_val_test_step as one jit.

    Returns the metric dict (16 metrics + loss keys). Mask zeroing and the
    normalized/denormalized metric routing match ``task.py:262-300``.
    """
    loss_fn = pixel_loss_fn(generator_type)

    @jax.jit
    def step(params, batch: Dict) -> Dict[str, jax.Array]:
        sr = _forward(model, generator_type, params, batch, compute_dtype).astype(jnp.float32)
        hr = batch[B.hr].astype(jnp.float32)
        mask = batch[B.mask].astype(jnp.float32)
        original = batch[B.original_data].astype(jnp.float32)

        if normalization_method == "zscore":
            denormalized_sr = zscore_denormalize(sr, zscore_mean, zscore_std)
        else:
            denormalized_sr = minmax_denormalize(
                sr, batch[B.min], batch[B.max], feature_range=normalization_range
            )

        sr_masked = sr * mask
        hr_masked = hr * mask
        denormalized_sr = denormalized_sr * mask
        original_masked = original * mask

        loss = loss_fn(sr_masked, hr_masked)
        metric_dict = compute_metric_suite(sr_masked, hr_masked, denormalized_sr, original_masked, mode=prefix)
        metric_dict[f"{prefix}/normalized_loss"] = loss
        metric_dict[f"{prefix}/loss"] = loss
        return metric_dict

    return step
