# -*- coding: utf-8 -*-
"""Multi-process (jax.distributed) smoke test on the CPU backend.

Spawns two subprocesses, each with 4 virtual CPU devices, forming an
8-device two-process 'data' mesh — the smallest faithful model of a
multi-host TPU pod. Verifies the multi-host input path (put_global /
process_local_slice / device_prefetch) assembles correct global arrays.

Reference capability: ``num_nodes``/``num_processes``
(``climsr/core/config.py:107-108``).
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.e2e

_WORKER = Path(__file__).with_name("_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_data_mesh(tmp_path):
    from climsr_tpu.data.synthetic import make_synthetic_dataset

    data_dir = make_synthetic_dataset(tmp_path / "ds", n_tiles_per_stage=(16, 8, 8))
    out_dir = tmp_path / "out"
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(_WORKER.parents[1]) + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), coordinator, "2", str(i), str(data_dir), str(out_dir)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    losses, fit_hp, resume_hp, gan_hp, spatial = [], [], [], [], []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"MP-WORKER-OK p{i}" in out, out
        for line in out.splitlines():
            if line.startswith("MP-TRAIN-LOSS"):
                losses.append(float(line.split()[-1]))
            elif line.startswith("MP-SPATIAL-LOSS"):
                spatial.append(float(line.split()[-1]))
            elif line.startswith("MP-FIT-HP"):
                fit_hp.append(float(line.split()[-1]))
            elif line.startswith("MP-RESUME-HP"):
                resume_hp.append(float(line.split()[-1]))
            elif line.startswith("MP-GAN-HP"):
                gan_hp.append(float(line.split()[-1]))
    # the jitted step reduced gradients across BOTH processes' shards -> the
    # loss (a global mean) is identical on every process
    assert len(losses) == 2 and losses[0] == losses[1]
    # the spatial-shard step (DP x spatial mesh, halo ppermute) agrees too
    assert len(spatial) == 2 and spatial[0] == spatial[1]
    # full fit (ZeRO-2, top-k checkpointing) and resume agree across processes
    assert len(fit_hp) == 2 and fit_hp[0] == fit_hp[1]
    assert len(resume_hp) == 2 and resume_hp[0] == resume_hp[1]
    # GAN fit (fused G+D, BN batch_stats, GANTrainState checkpoint) agrees too
    assert len(gan_hp) == 2 and gan_hp[0] == gan_hp[1]
