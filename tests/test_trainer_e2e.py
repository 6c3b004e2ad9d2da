# -*- coding: utf-8 -*-
"""Trainer end-to-end on the virtual CPU mesh: fit + validate + test + checkpoints
through the real CLI (the driver-visible surface)."""
import csv
import glob

import numpy as np
import pytest

pytestmark = pytest.mark.e2e

from climsr_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def tiny_world(tmp_path_factory):
    root = make_synthetic_dataset(tmp_path_factory.mktemp("ds"), n_tiles_per_stage=(16, 4, 4))
    return root


def test_cli_fit_validate_test_checkpoint(tiny_world, tmp_path):
    from climsr_tpu.cli.train import main

    hp = main([
        "experiment=srcnn_pre_training_debug",
        f"datamodule.cfg.data_path={tiny_world}",
        "training.batch_size=8",
        "training.validation_batch_size=8",
        "trainer.max_epochs=2",
        "trainer.limit_train_batches=4",
        "trainer.limit_val_batches=2",
        "trainer.limit_test_batches=1",
        "trainer.save_top_k=2",
        "trainer.log_every_n_steps=2",
        # advanced = the simple stage table PLUS an epoch-0 xplane trace and
        # per-op device-time table — exercises both profiler wrappers
        "profiler=advanced",
        "print_config=false",
        f"training.output_dir={tmp_path}",
    ])
    assert hp is not None and np.isfinite(hp)
    run_dirs = glob.glob(f"{tmp_path}/outputs/runs/srcnn/*")
    assert len(run_dirs) == 1
    ckpts = glob.glob(f"{run_dirs[0]}/checkpoints/*")
    assert any(p.split("/")[-1].isdigit() for p in ckpts)
    rows = open(f"{run_dirs[0]}/metrics.csv").read()
    assert "val/rmse" in rows and "train/loss" in rows
    assert glob.glob(f"{run_dirs[0]}/checkpoints/config.json"), "config snapshot saved with checkpoints"
    # the epoch-0 trace was captured and, when xplane protos are parsable in
    # this env, distilled into the per-op table next to the checkpoints
    from climsr_tpu.utils.profiling import advanced_profile_report, find_xplane_files

    trace_dir = f"{run_dirs[0]}/profiles"
    assert find_xplane_files(trace_dir), "profiler=advanced wrote no xplane trace"
    if advanced_profile_report(trace_dir) is not None:
        ops = open(f"{run_dirs[0]}/profile_ops.txt").read()
        assert "TOTAL (compute events)" in ops


def test_cli_gan_fit_smoke(tiny_world, tmp_path):
    from climsr_tpu.cli.train import main

    hp = main([
        "experiment=esrgan_fine_tune_no_gan_pre_training",
        f"datamodule.cfg.data_path={tiny_world}",
        "datamodule.cfg.europe_extent=false",
        "training.batch_size=4",
        "training.validation_batch_size=4",
        "training.model_weights=null",
        "generator={name: esrgan, nf: 16, nb: 1, gc: 8}",
        "discriminator={name: esrgan, out_channels: 16}",
        # a real (shallow, conv2_2) VGG perceptual graph in the fused G+D
        # step — the full conv5_4 compile takes tens of minutes on the CPU
        # test mesh and is covered by dryrun_multichip / test_gan_mesh
        "task.cfg.perceptual_loss_factor=0.005",
        "task.cfg.perceptual_cutoff=conv2_2",
        # single-device: 8-way SPMD partitioning of the fused G+D step is
        # compile-bound on CPU; the sharded path is covered by dryrun_multichip
        "trainer.num_devices=1",
        "trainer.max_epochs=1",
        "trainer.limit_train_batches=2",
        "trainer.limit_val_batches=1",
        "trainer.limit_test_batches=1",
        "trainer.save_top_k=1",
        "print_config=false",
        f"training.output_dir={tmp_path}",
    ])
    assert hp is not None and np.isfinite(hp)


def test_gan_discriminator_channel_mismatch_rejected(tiny_world, tmp_path):
    """D consumes the generator's 1-channel SR/HR; a config claiming
    in_channels=3 would init params that crash at the first jitted step —
    reject it at Trainer construction with a clear message instead."""
    import pytest

    from climsr_tpu.cli.train import main

    with pytest.raises(ValueError, match="in_channels"):
        main([
            "experiment=esrgan_fine_tune_no_gan_pre_training",
            f"datamodule.cfg.data_path={tiny_world}",
            "datamodule.cfg.europe_extent=false",
            "training.batch_size=4",
            "training.model_weights=null",
            "generator={name: esrgan, nf: 16, nb: 1, gc: 8}",
            "discriminator={name: esrgan, out_channels: 16, in_channels: 3}",
            "trainer.num_devices=1",
            "trainer.max_epochs=1",
            "trainer.limit_train_batches=1",
            "print_config=false",
            f"training.output_dir={tmp_path}",
        ])


def test_resume_from_checkpoint(tiny_world, tmp_path):
    from climsr_tpu.cli.train import main

    base = [
        "experiment=srcnn_pre_training_debug",
        f"datamodule.cfg.data_path={tiny_world}",
        "training.batch_size=8",
        "trainer.limit_train_batches=2",
        "trainer.limit_val_batches=1",
        "trainer.limit_test_batches=1",
        "trainer.save_top_k=1",
        "print_config=false",
        f"training.output_dir={tmp_path}",
    ]
    main(base + ["trainer.max_epochs=1"])
    ckpt_dir = glob.glob(f"{tmp_path}/outputs/runs/srcnn/*/checkpoints")[0]
    first_steps = [int(p.split("/")[-1]) for p in glob.glob(f"{ckpt_dir}/*") if p.split("/")[-1].isdigit()]
    assert first_steps, "first run wrote no checkpoint"
    hp = main(base + ["trainer.max_epochs=1", f"trainer.resume_from_checkpoint={ckpt_dir}"])
    assert hp is not None and np.isfinite(hp)
    # the resumed run must CONTINUE the global step count, not retrain from 0
    # (a restore that silently no-ops would produce the same step numbers)
    second_dir = [d for d in glob.glob(f"{tmp_path}/outputs/runs/srcnn/*") if f"{d}/checkpoints" != ckpt_dir]
    assert len(second_dir) == 1
    second_steps = [
        int(p.split("/")[-1])
        for p in glob.glob(f"{second_dir[0]}/checkpoints/*")
        if p.split("/")[-1].isdigit()
    ]
    assert second_steps and max(second_steps) > max(first_steps), (first_steps, second_steps)


def test_cli_lr_finder(tiny_world, tmp_path):
    """LR range test via the training CLI (reference: trainer.tune/lr_find,
    cli/train.py:98-109): sweeps lr exponentially, writes the curve, returns
    a finite suggestion without running a full fit."""
    from climsr_tpu.cli.train import main

    out = main([
        "experiment=srcnn_pre_training_debug",
        f"datamodule.cfg.data_path={tiny_world}",
        "training.batch_size=8",
        "training.lr_find_only=true",
        "print_config=false",
        f"training.output_dir={tmp_path}",
    ])
    assert out is not None and np.isfinite(out) and out > 0
    import glob as _glob

    assert _glob.glob(f"{tmp_path}/outputs/runs/srcnn/*/lr_find*"), "lr-finder curve artifacts written"


def test_preemption_checkpoint_on_sigterm(tiny_world, tmp_path):
    """SIGTERM mid-training -> a checkpoint is written at the next step
    boundary and fit() exits cleanly (TPU-pod eviction safety; the reference
    has no analogue — recovery there is fully manual)."""
    import os
    import signal

    from climsr_tpu.cli.train import main

    # a callback that delivers SIGTERM to ourselves during the first epoch
    import climsr_tpu.training.loop as loop_mod

    orig_train_epoch = loop_mod.Trainer.train_epoch
    fired = {"n": 0}
    epoch_end_calls: list = []

    class _EpochEndProbe:
        # PL semantics: a preemption-truncated epoch is NOT an epoch end —
        # weight-mutating hooks (pruning) must not advance their schedule on
        # the partial epoch right before the forced checkpoint
        def on_train_epoch_end(self, trainer, epoch):
            epoch_end_calls.append(epoch)

    def sabotaged(self, epoch):
        if fired["n"] == 0:
            fired["n"] += 1
            self.callbacks.append(_EpochEndProbe())
            os.kill(os.getpid(), signal.SIGTERM)
        return orig_train_epoch(self, epoch)

    loop_mod.Trainer.train_epoch = sabotaged
    try:
        main([
            "experiment=srcnn_pre_training_debug",
            f"datamodule.cfg.data_path={tiny_world}",
            "training.batch_size=8",
            "trainer.max_epochs=50",  # preemption must cut this short
            "trainer.limit_val_batches=1",
            "trainer.limit_test_batches=1",
            "trainer.save_top_k=1",
            "print_config=false",
            f"training.output_dir={tmp_path}",
        ])
    finally:
        loop_mod.Trainer.train_epoch = orig_train_epoch

    assert fired["n"] == 1
    assert epoch_end_calls == [], (
        f"on_train_epoch_end fired for a preemption-truncated epoch: {epoch_end_calls}"
    )
    run_dirs = glob.glob(f"{tmp_path}/outputs/runs/srcnn/*")
    assert len(run_dirs) == 1
    ckpts = [p for p in glob.glob(f"{run_dirs[0]}/checkpoints/*") if p.split("/")[-1].isdigit()]
    assert ckpts, "preemption checkpoint written"
    # ...and training was genuinely CUT SHORT: the SIGTERM landed during
    # epoch 0, so at most ~2 of the 50 requested epochs may have run (the
    # preemption flag is checked at step/epoch boundaries). A handler that
    # sets a flag nobody reads would train all 50 epochs and fail here.
    import csv as _csv
    import os.path as _osp

    # the run stops so early that metrics.csv may not even be flushed
    # (log_every_n_steps=50 default); a missing file = nothing ran
    max_step = 0
    if _osp.exists(f"{run_dirs[0]}/metrics.csv"):
        with open(f"{run_dirs[0]}/metrics.csv") as f:
            for row in _csv.reader(f):
                if row and row[0].isdigit():
                    max_step = max(max_step, int(row[0]))
    # the preemption checkpoint itself records the step it stopped at
    ckpt_steps = [int(p.split("/")[-1]) for p in ckpts]
    steps_per_epoch = 16 // 8  # 16 train tiles / batch_size 8
    assert max(ckpt_steps + [max_step]) <= 2 * steps_per_epoch, (
        f"preemption did not stop training (checkpoints at {ckpt_steps}, "
        f"metrics reached step {max_step} of {50 * steps_per_epoch} requested)"
    )


def test_deterministic_training_is_bit_stable(tiny_world, tmp_path):
    """trainer.deterministic=true: two runs with the same seed produce
    bit-identical training losses (reference pl.Trainer(deterministic=True)
    analogue — here it pins matmul/conv accumulation precision)."""
    import pandas as _pd

    from climsr_tpu.cli.train import main

    def one_run(out_dir):
        main([
            "experiment=srcnn_pre_training_debug",
            f"datamodule.cfg.data_path={tiny_world}",
            "training.batch_size=8",
            "trainer.max_epochs=1",
            "trainer.limit_train_batches=3",
            "trainer.limit_val_batches=1",
            "trainer.limit_test_batches=1",
            "trainer.deterministic=true",
            "trainer.log_every_n_steps=1",
            "trainer.save_top_k=0",
            "print_config=false",
            f"training.output_dir={out_dir}",
        ])
        run_dir = glob.glob(f"{out_dir}/outputs/runs/srcnn/*")[0]
        rows, header = [], []
        for line in open(f"{run_dir}/metrics.csv"):
            cells = line.strip().split(",")
            if cells and cells[0] == "step":
                header = cells
            elif cells and cells[0].isdigit():
                # wall-clock throughput is legitimately nondeterministic
                rows.append(tuple(
                    v for h, v in zip(header, cells) if "samples_per_sec" not in h
                ))
        return rows

    a = one_run(tmp_path / "a")
    b = one_run(tmp_path / "b")
    assert a and a == b


def test_max_steps_minus_one_means_unlimited(tiny_world, tmp_path):
    """PL sentinel max_steps=-1: training must run the full epoch budget, not
    stop after one micro-batch (a truthy -1 used to trip `global_step >= -1`)."""
    import csv as _csv

    import glob as _glob

    from climsr_tpu.cli.train import main

    hp = main([
        "experiment=srcnn_pre_training_debug",
        f"datamodule.cfg.data_path={tiny_world}",
        "training.batch_size=8",
        "training.validation_batch_size=8",
        "trainer.max_epochs=1",
        "trainer.max_steps=-1",
        "trainer.limit_train_batches=3",
        "trainer.limit_val_batches=1",
        "trainer.limit_test_batches=1",
        "trainer.log_every_n_steps=1",
        "print_config=false",
        f"training.output_dir={tmp_path}",
    ])
    assert hp is not None and np.isfinite(hp)
    rows = list(_csv.DictReader(open(_glob.glob(f"{tmp_path}/outputs/runs/srcnn/*/metrics.csv")[0])))
    steps = {int(r["step"]) for r in rows if r.get("train/loss") and r["step"].isdigit()}
    assert len(steps) >= 3, f"expected >=3 training steps, saw {sorted(steps)}"
