"""A/B the flagship training step with the Pallas trunk on/off.

Usage: python scripts/bench_train_pallas.py {on|off}

Round-4 measurements on a v5e chip (bs=192, 32x32 LR, bf16, fused pretrain
step): on = 98.4 ms/step (1951 samples/s), off = 129.2 ms/step (1487) —
the fused Pallas backward (ops/pallas/rdb.py) gives training +31%.
"""
import time, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from climsr_tpu.utils.core import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
from climsr_tpu.config.schemas import OptimizerConfig
from climsr_tpu.models import create_generator
from climsr_tpu.training.optimizers import build_optimizer
from climsr_tpu.training.tasks.pretrain import make_pretrain_step
from climsr_tpu.training.train_state import TrainState

use_pallas = sys.argv[1] == "on"
bs, lr_hw = 192, 32
model = create_generator("esrgan", nf=64, nb=11, gc=16, out_channels=1, dtype=jnp.bfloat16, use_pallas=use_pallas)
r = jax.random.PRNGKey(0)
batch = {
    "lr": jax.random.normal(r, (bs, lr_hw, lr_hw, 3), jnp.bfloat16),
    "hr": jax.random.normal(r, (bs, lr_hw*4, lr_hw*4, 1), jnp.bfloat16),
    "elevation": jax.random.normal(r, (bs, lr_hw*4, lr_hw*4, 1), jnp.bfloat16),
    "mask": jnp.ones((bs, lr_hw*4, lr_hw*4, 1), jnp.bfloat16),
}
params = model.init(r, batch["lr"][:1], batch["elevation"][:1], batch["mask"][:1])["params"]
tx = build_optimizer(OptimizerConfig(name="adam", lr=1e-4, weight_decay=1e-4), lambda s: 1e-4)
step = make_pretrain_step(model, "esrgan", tx, compute_dtype=jnp.bfloat16, donate=True)
state = TrainState.create(params, tx)

def run(state, n):
    t0 = time.perf_counter()
    metrics = None
    for _ in range(n):
        state, metrics = step(state, batch)
    float(metrics["train/loss"])
    return state, time.perf_counter() - t0

iters = 6
state, _ = run(state, 1)
samples = []
for _ in range(3):
    state, t1 = run(state, 1)
    state, tn = run(state, iters+1)
    samples.append((tn - t1)/iters)
dt = sorted(samples)[1]
print(f"use_pallas={use_pallas}: {dt*1e3:.1f} ms/step = {bs/dt:.0f} samples/s")
