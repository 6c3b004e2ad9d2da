#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Headline benchmark: ESRGAN (RRDB, nb=11, gc=16) 4x SR throughput per chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mpix_HR/s/chip", "vs_baseline": N}

Methodology
-----------
- The flagship generator (the reference's trained config, conf/generator/
  esrgan.yaml: nf=64, nb=11, gc=16) runs 4x SR on batches of 32x32-LR /
  128x128-output CRU-TS-style tiles in bfloat16 — the training-tile geometry
  the models are built around (production whole-globe inference tiles the LR
  frame at 128px with overlap; the per-pixel FLOP count is identical but the
  per-pixel rate is geometry-dependent — see the tile-geometry note below).
- Timing: N forward passes are chained *inside one jit* with a real
  loop-carried data dependency (next input mixes in the downsampled output),
  so neither XLA loop-invariant hoisting nor the experimental axon transport's
  optimistic async completion can fake the number. Cost of the single host
  round-trip is removed by differencing a 1-iteration run.

Baseline
--------
The reference publishes no numbers (BASELINE.md). Its inference path runs the
same RRDB generator in fp32, batch_size=1, via a Python DataLoader loop on an
RTX-3090-class GPU (climsr/inference/inference.py:48-70; fp16 is used only in
training). Analytic estimate: ~11.55 MFLOP per LR pixel (nb=11, gc=16 conv
stack incl. HR-scale head + fusion SRCNN); RTX 3090 fp32 ~35.6 TFLOP/s peak at
a generous 35% conv utilization + batch-1 dispatch overhead gives
~15 Mpix-HR/s. vs_baseline is measured throughput over that estimate; the
BASELINE.json north star (>=5x) corresponds to vs_baseline >= 5.
Besides the headline inference JSON line (stdout), three more JSON lines go
to stderr so the driver-captured tail records them each round: the flagship
*training-step* throughput (fused forward+backward+adam, bs=192, the
reference's pre-training batch), the *GAN fine-tune step* throughput (fused
G+D + conv5_4 VGG graph, the reference's second training stage), and the
*whole-globe e2e* months/s (full pipeline incl. NetCDF read, tiled SR,
GeoTIFF writes — the production sweep).

Tile-geometry note: this benchmark runs 32x32-LR tiles — the training-tile
geometry, where the Pallas trunk is eligible and engaged. The shipped tiled
inference path uses 128px tiles (also Pallas-eligible since the kernel raises
its own scoped-VMEM limit; measured 63.3 Mpix-HR/s raw, ~49.9 effective after
the 1.27x overlap redundancy — see README "Tile-geometry honesty");
whole frames beyond 16384 LR px fall back to the XLA trunk.
"""
from __future__ import annotations

import json
import sys
import time

BASELINE_MPIX_HR_S = 15.0
FLOPS_PER_LR_PIXEL = 11.55e6  # ESRGAN nb=11 gc=16 analytic conv FLOPs
# reference training-step anchor: 3x forward FLOPs (6.8 TFLOP/step at bs=192)
# on the RTX-3090 fp16 training path at the same generous 35%-of-peak conv
# utilization used for the inference anchor -> ~700 samples/s (BASELINE.md)
BASELINE_TRAIN_SAMPLES_S = 700.0
# GAN fine-tune step anchor (task/pl_gan.py:63-97): per sample the reference
# runs G fwd+bwd (3x11.83 GF at 32->128), D fwd on (sr,hr) for the
# relativistic G loss incl. bwd-through-D-to-sr (~4x3.65 GF), the D update on
# real+fake (~6x3.65 GF), and the no-grad conv5_4 VGG19 forward on sr AND hr
# (2x12.8 GF at 128px) -> ~97.6 GF/sample = 18.7 TFLOP at bs=192. At the same
# 35%-of-peak RTX-3090 fp16 utilization as the train anchor (~24.8 TF/s
# effective) that is ~250 samples/s.
BASELINE_GAN_SAMPLES_S = 250.0
# whole-globe anchor: the reference inference loop (inference.py:48-70) runs
# whole 360x720 LR frames, batch=1, fp32 on the RTX-3090 — 360*720*11.55 MFLOP
# = 3.0 TFLOP/month at the same 35%-of-peak utilization (12.5 TF/s) is 0.24 s
# compute, plus rasterio GeoTIFF write of the 1440x2880 HR frame (~0.1 s
# observed for our own codec at this size) -> ~3 months/s
BASELINE_GLOBE_MONTHS_S = 3.0
# RCAN europe-geometry anchor: the reference's SHIPPED inference model
# (conf/inference/inference_rcan.yaml:4) runs 113x113 LR -> 452x452 frames
# fp32 batch=1 (climsr/inference/inference.py:48-70). Analytic: 32.4 MFLOP
# per LR pixel (scripts/bench_rcan.py) at the same 35%-of-peak RTX-3090
# fp32 utilization used for the ESRGAN anchor (12.46 TF/s) -> 0.385 MLRpx/s
# = ~6.2 Mpix-HR/s.
BASELINE_RCAN_MPIX_HR_S = 6.2


def bench_train_step() -> None:
    """Flagship pretrain step: ESRGAN nb=11, bs=192, bf16, donated state."""
    import jax
    import jax.numpy as jnp

    from climsr_tpu.config.schemas import OptimizerConfig
    from climsr_tpu.models import create_generator
    from climsr_tpu.training.optimizers import build_optimizer
    from climsr_tpu.training.tasks.pretrain import make_pretrain_step
    from climsr_tpu.training.train_state import TrainState

    bs, lr_hw = 192, 32
    model = create_generator(
        "esrgan", nf=64, nb=11, gc=16, out_channels=1, dtype=jnp.bfloat16, use_pallas=True
    )  # Pallas trunk with the fused Pallas backward (round 4): +31% vs XLA
    r = jax.random.PRNGKey(0)
    batch = {
        "lr": jax.random.normal(r, (bs, lr_hw, lr_hw, 3), jnp.bfloat16),
        "hr": jax.random.normal(r, (bs, lr_hw * 4, lr_hw * 4, 1), jnp.bfloat16),
        "elevation": jax.random.normal(r, (bs, lr_hw * 4, lr_hw * 4, 1), jnp.bfloat16),
        "mask": jnp.ones((bs, lr_hw * 4, lr_hw * 4, 1), jnp.bfloat16),
    }
    params = model.init(r, batch["lr"][:1], batch["elevation"][:1], batch["mask"][:1])["params"]
    tx = build_optimizer(OptimizerConfig(name="adam", lr=1e-4, weight_decay=1e-4), lambda s: 1e-4)
    step = make_pretrain_step(model, "esrgan", tx, compute_dtype=jnp.bfloat16, donate=True)

    # ONE state threaded through every timing run: the step donates its input
    # state, so re-creating a state from the original (now-donated) param
    # buffers would fault — and the data dependency between consecutive steps
    # is exactly what makes the timing honest.
    state = TrainState.create(params, tx)

    def run(state, n):
        t0 = time.perf_counter()
        metrics = None
        for _ in range(n):
            state, metrics = step(state, batch)
        # host scalar pull = a real data-dependent completion barrier (the
        # axon transport's optimistic async makes block_until_ready unreliable)
        float(metrics["train/loss"])
        return state, time.perf_counter() - t0

    iters = 6
    state, _ = run(state, 1)  # compile
    samples = []
    for _ in range(3):
        state, t1 = run(state, 1)
        state, tn = run(state, iters + 1)
        samples.append((tn - t1) / iters)
    dt = sorted(samples)[1]
    sps = bs / dt
    print(
        f"# train bs={bs} dt={dt * 1e3:.1f} ms/step = {sps:.0f} samples/s/chip",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "esrgan_nb11_train_step_throughput",
                "value": round(sps, 1),
                "unit": "samples/s/chip",
                "vs_baseline": round(sps / BASELINE_TRAIN_SAMPLES_S, 2),
            }
        ),
        file=sys.stderr,
    )


def bench_gan_step() -> None:
    """Flagship GAN fine-tune step: fused G+D + conv5_4 VGG graph, bs=192.

    The reference's second training stage (task/pl_gan.py): relativistic
    RaGAN with pixel/perceptual/adversarial weights 0.01/1.0/0.005. Same
    chained-jit + host-scalar-barrier methodology as the pretrain stage.
    """
    import jax
    import jax.numpy as jnp

    from climsr_tpu.config.schemas import OptimizerConfig
    from climsr_tpu.losses.perceptual import build_perceptual_loss
    from climsr_tpu.models import create_discriminator, create_generator
    from climsr_tpu.training.optimizers import build_optimizer
    from climsr_tpu.training.tasks.gan import make_gan_step
    from climsr_tpu.training.train_state import GANTrainState

    bs, lr_hw = 192, 32
    # use_pallas=False: embedding the 33 custom-vjp trunk kernels inside the
    # G+D+VGG gradient graph was observed to push the remote XLA compile past
    # 45 min (vs ~3 min for the XLA trunk) — a driver bench stage must stay
    # inside its time budget, and the XLA-trunk number is the one measured
    # in README ("GAN fine-tune step")
    g_model = create_generator(
        "esrgan", nf=64, nb=11, gc=16, out_channels=1, dtype=jnp.bfloat16, use_pallas=False
    )
    d_model = create_discriminator("esrgan", in_channels=1, dtype=jnp.bfloat16)
    r = jax.random.PRNGKey(0)
    batch = {
        "lr": jax.random.normal(r, (bs, lr_hw, lr_hw, 3), jnp.bfloat16),
        "hr": jax.random.normal(r, (bs, lr_hw * 4, lr_hw * 4, 1), jnp.bfloat16),
        "elevation": jax.random.normal(r, (bs, lr_hw * 4, lr_hw * 4, 1), jnp.bfloat16),
        "mask": jnp.ones((bs, lr_hw * 4, lr_hw * 4, 1), jnp.bfloat16),
    }
    g_params = g_model.init(r, batch["lr"][:1], batch["elevation"][:1], batch["mask"][:1])["params"]
    d_vars = d_model.init(jax.random.PRNGKey(1), jnp.zeros((1, 128, 128, 1), jnp.bfloat16), train=False)
    g_tx = build_optimizer(OptimizerConfig(name="adam", lr=1e-4, weight_decay=1e-4), lambda s: 1e-4)
    d_tx = build_optimizer(OptimizerConfig(name="adam", lr=1e-4, weight_decay=1e-4), lambda s: 1e-4)
    perceptual = build_perceptual_loss(compute_dtype=jnp.bfloat16, cutoff="conv5_4")
    step = make_gan_step(
        g_model, d_model, "esrgan", g_tx, d_tx,
        pixel_weight=0.01, perceptual_weight=1.0, adversarial_weight=0.005,
        perceptual_fn=perceptual, compute_dtype=jnp.bfloat16, donate=True,
    )
    state = GANTrainState.create(g_params, g_tx, d_vars["params"], d_tx, d_vars.get("batch_stats"))

    def run(state, n):
        t0 = time.perf_counter()
        metrics = None
        for _ in range(n):
            state, metrics = step(state, batch)
        float(metrics["train/loss_G"])  # host scalar pull = real completion barrier
        return state, time.perf_counter() - t0

    iters = 5
    state, _ = run(state, 1)  # compile
    samples = []
    for _ in range(3):
        state, t1 = run(state, 1)
        state, tn = run(state, iters + 1)
        samples.append((tn - t1) / iters)
    dt = sorted(samples)[1]
    sps = bs / dt
    print(
        f"# GAN bs={bs} dt={dt * 1e3:.1f} ms/step = {sps:.0f} samples/s/chip "
        f"(fused G+D + conv5_4 VGG)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "gan_train_step_throughput",
                "value": round(sps, 1),
                "unit": "samples/s/chip",
                "vs_baseline": round(sps / BASELINE_GAN_SAMPLES_S, 2),
            }
        ),
        file=sys.stderr,
    )


def bench_rcan() -> None:
    """RCAN 113->452 europe-geometry inference — the reference's shipped
    inference model (scripts/bench_rcan.py has the methodology + the
    measured per-op attribution and the written Pallas-kernel decision)."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "bench_rcan", Path(__file__).parent / "scripts" / "bench_rcan.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mpix_s = mod.run(bs=16)
    print(
        json.dumps(
            {
                "metric": "rcan_europe_4x_sr_inference_throughput",
                "value": round(mpix_s, 1),
                "unit": "Mpix_HR/s/chip",
                "vs_baseline": round(mpix_s / BASELINE_RCAN_MPIX_HR_S, 2),
            }
        ),
        file=sys.stderr,
    )


def bench_whole_globe() -> None:
    """Production path: CRU-TS-sized months through the FULL pipeline.

    NetCDF read -> normalization -> overlap-tiled SR on device -> denorm ->
    masked GeoTIFF writes (scripts/bench_whole_globe.py). Reported as the
    warm-sweep months/s so the driver records the e2e number each round
    (the product's reason to exist is the 1440-month CRU-TS sweep).
    """
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "bench_whole_globe", Path(__file__).parent / "scripts" / "bench_whole_globe.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rates = mod.run(months=60, json_line=True)
    months_s = rates["months_per_s_steady"]
    print(
        json.dumps(
            {
                "metric": "whole_globe_e2e_throughput",
                "value": round(months_s, 3),
                "unit": "months/s/chip",
                "vs_baseline": round(months_s / BASELINE_GLOBE_MONTHS_S, 2),
            }
        ),
        file=sys.stderr,
    )


def main() -> None:
    import jax
    import jax.numpy as jnp

    from climsr_tpu.models import create_generator
    from climsr_tpu.ops.resize import nearest_downsample

    model = create_generator(
        "esrgan", nf=64, nb=11, gc=16, out_channels=1, dtype=jnp.bfloat16, use_pallas=True
    )
    rngk = jax.random.PRNGKey(0)
    variables = model.init(
        rngk,
        jnp.zeros((1, 32, 32, 3), jnp.bfloat16),
        jnp.zeros((1, 128, 128, 1), jnp.bfloat16),
        jnp.ones((1, 128, 128, 1), jnp.bfloat16),
    )
    params = variables["params"]

    def chained(p, x, e, m, n):
        def body(i, x):
            out = model.apply({"params": p}, x, e, m)
            feed = nearest_downsample(out, 4)
            return (x * 0.999 + jnp.concatenate([feed] * 3, axis=-1) * 0.001).astype(x.dtype)

        x = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(x.astype(jnp.float32))

    f = jax.jit(chained, static_argnames="n")

    bs = 128
    iters = 20
    x = jax.random.normal(rngk, (bs, 32, 32, 3), jnp.bfloat16)
    e = jax.random.normal(rngk, (bs, 128, 128, 1), jnp.bfloat16)
    m = jnp.ones((bs, 128, 128, 1), jnp.bfloat16)

    # compile both loop lengths
    float(f(params, x, e, m, 1))
    float(f(params, x, e, m, iters + 1))

    def timed(n):
        t0 = time.perf_counter()
        float(f(params, x, e, m, n))
        return time.perf_counter() - t0

    # median of 3 repeats, overhead-differenced
    samples = []
    for _ in range(3):
        t1 = timed(1)
        tn = timed(iters + 1)
        samples.append((tn - t1) / iters)
    dt = sorted(samples)[1]

    hr_pixels = bs * 128 * 128
    mpix_s = hr_pixels / dt / 1e6
    tflops = bs * 32 * 32 * FLOPS_PER_LR_PIXEL / dt / 1e12
    print(
        f"# bs={bs} dt={dt * 1e3:.2f} ms/iter ~{tflops:.1f} TFLOP/s "
        f"({tflops / 197 * 100:.1f}% of v5e peak) on {jax.devices()[0]}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "esrgan_nb11_4x_sr_inference_throughput",
                "value": round(mpix_s, 1),
                "unit": "Mpix_HR/s/chip",
                "vs_baseline": round(mpix_s / BASELINE_MPIX_HR_S, 2),
            }
        )
    )


def _run_guarded(flag: str, budget_s: int, what: str) -> bool:
    """Run one bench stage as a subprocess with a hard time budget.

    Two reasons a stage can wedge forever: the remote TPU compiler can take
    tens of minutes and a blocking compile call can't be interrupted by an
    in-process signal handler (CPython defers handlers until the C++ call
    returns), and a DOWN device tunnel hangs even `jax.devices()`. A
    subprocess CAN be killed; its stdout/stderr pass straight through, so the
    JSON-line contract is unchanged. Stages run sequentially — never two TPU
    jobs at once."""
    import subprocess

    try:
        proc = subprocess.run([sys.executable, __file__, flag], timeout=budget_s, check=False)
        if proc.returncode != 0:
            print(f"# {what} bench failed: exit code {proc.returncode}", file=sys.stderr)
            return False
        return True
    except subprocess.TimeoutExpired:
        print(f"# {what} bench skipped: exceeded {budget_s}s (compile or device tunnel down)", file=sys.stderr)
        return False
    except Exception as e:
        print(f"# {what} bench skipped: {e}", file=sys.stderr)
        return False


if __name__ == "__main__":
    # the flagship jits are remote-compile-heavy; cache them across runs
    from climsr_tpu.utils.core import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    if "--train-only" in sys.argv:
        bench_train_step()
    elif "--gan-only" in sys.argv:
        bench_gan_step()
    elif "--inference-only" in sys.argv:
        main()
    elif "--globe-only" in sys.argv:
        bench_whole_globe()
    elif "--rcan-only" in sys.argv:
        bench_rcan()
    else:
        # Budgets: the axon tunnel's remote-compile latency varies by 3-5x
        # between runs (a 900s budget was observed to clip the train stage on
        # a slow-tunnel window even with a warm compile cache), and each
        # subprocess stage additionally pays a first device->host fetch
        # handshake measured at ~3 min on a bad-weather window (round 5).
        _run_guarded("--train-only", 1800, "train-step")
        _run_guarded("--gan-only", 2400, "GAN-step")
        _run_guarded("--globe-only", 2100, "whole-globe e2e")
        _run_guarded("--rcan-only", 1500, "RCAN-inference")
        ok = _run_guarded("--inference-only", 2400, "inference")
        if not ok:
            sys.exit(1)  # no headline JSON was printed — fail loudly, never hang
