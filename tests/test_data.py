# -*- coding: utf-8 -*-
"""Data-layer tests on a synthetic dataset: channel contracts per generator type
(mirrors reference tests/data/test_climate_dataset.py), datamodule joins, loader."""
import numpy as np
import pytest

import climsr_tpu.consts as consts
from climsr_tpu.config.schemas import SuperResolutionDataConfig, TransformsCfg
from climsr_tpu.data.datamodule import SuperResolutionDataModule
from climsr_tpu.data.pipeline import VALID_KEY, DataLoader
from climsr_tpu.data.synthetic import make_synthetic_dataset

B = consts.batch_items


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    return make_synthetic_dataset(tmp_path_factory.mktemp("ds"), n_tiles_per_stage=(12, 5, 5))


def _cfg(data_root, **kw):
    base = dict(
        data_path=str(data_root),
        world_clim_variable="temp",
        generator_type="esrgan",
        resolutions=["2.5m"],
        batch_size=4,
        validation_batch_size=4,
        num_workers=2,
        normalization_method="minmax",
        normalization_range=(-1.0, 1.0),
        use_elevation=True,
        use_mask=True,
        use_global_min_max=True,
        transforms=TransformsCfg(),
    )
    base.update(kw)
    return SuperResolutionDataConfig(**base)


@pytest.mark.parametrize(
    "generator_type,use_elevation,use_mask,expected_channels",
    [
        ("esrgan", True, True, 3),
        ("esrgan", True, False, 2),
        ("esrgan", False, False, 1),
        ("srcnn", True, True, 3),
        ("srcnn", False, True, 2),
        ("srcnn", False, False, 1),
    ],
)
def test_channel_contract(data_root, generator_type, use_elevation, use_mask, expected_channels):
    dm = SuperResolutionDataModule(
        _cfg(data_root, generator_type=generator_type, use_elevation=use_elevation, use_mask=use_mask)
    )
    sample = dm.train_dataset[0]
    lr_size = 128 if generator_type == "srcnn" else 32  # srcnn gets pre-upscaled input
    assert sample[B.lr].shape == (lr_size, lr_size, expected_channels)
    assert sample[B.hr].shape == (128, 128, 1)
    assert sample[B.elevation].shape == (128, 128, 1)
    assert sample[B.mask].shape == (128, 128, 1)


def test_temp_mode_concatenates_three_vars(data_root):
    dm = SuperResolutionDataModule(_cfg(data_root))
    # temp mode: train = tmin+tavg+tmax concatenated; test = one set per variable
    assert len(dm.train_dataset) == 3 * 12
    assert len(dm.test_datasets) == 3


def test_normalization_bounds_and_mask(data_root):
    dm = SuperResolutionDataModule(_cfg(data_root, use_global_min_max=False))
    s = dm.val_dataset[0]
    hr = s[B.hr]
    assert hr.min() >= -1.0 - 1e-5 and hr.max() <= 1.0 + 1e-5
    mask = s[B.mask]
    assert set(np.unique(mask)) <= {0.0, 1.0}
    # ocean pixels (mask 0) were NaN in the original and substituted to 0 in hr
    assert np.all(hr[mask == 0.0] == 0.0)
    # per-tile minmax: land pixels span the full range
    assert hr.max() > 0.99


def test_val_sample_extras(data_root):
    dm = SuperResolutionDataModule(_cfg(data_root))
    s = dm.val_dataset[0]
    for key in (B.elevation_lr, B.nearest, B.cubic, B.original_data, B.min, B.max):
        assert key in s
    assert s[B.nearest].shape == (128, 128, 1)
    assert s[B.cubic].shape == (128, 128, 1)
    assert s[B.elevation_lr].shape == (32, 32, 1)
    assert np.isscalar(float(s[B.min]))


def test_zscore_path(data_root):
    dm = SuperResolutionDataModule(_cfg(data_root, normalization_method="zscore"))
    s = dm.train_dataset[0]
    hr = s[B.hr]
    assert np.isfinite(hr).all()
    # z-scored data should be roughly centered
    assert abs(float(hr[s[B.mask] == 1.0].mean())) < 3.0


def test_lr_is_nearest_decimation_of_hr(data_root):
    dm = SuperResolutionDataModule(
        _cfg(data_root, use_elevation=False, use_mask=False, transforms=TransformsCfg(False, False, False))
    )
    s = dm.train_dataset[0]
    np.testing.assert_array_equal(s[B.lr][..., 0], s[B.hr][::4, ::4, 0])


def test_dataloader_batching(data_root):
    dm = SuperResolutionDataModule(_cfg(data_root))
    loader = DataLoader(dm.train_dataset, batch_size=8, shuffle=True, num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == len(loader) == (3 * 12) // 8
    b = batches[0]
    assert b[B.lr].shape == (8, 32, 32, 3)
    assert b[B.hr].shape == (8, 128, 128, 1)
    assert b[VALID_KEY] == 8


def test_dataloader_pad_last(data_root):
    dm = SuperResolutionDataModule(_cfg(data_root))
    loader = DataLoader(dm.val_dataset, batch_size=4, shuffle=False, drop_last=False, pad_last=True)
    batches = list(loader)
    # 3 vars x 5 val tiles = 15 -> 3 full + 1 padded batch of 3
    assert len(batches) == 4
    assert batches[-1][B.hr].shape[0] == 4
    assert batches[-1][VALID_KEY] == 3


def test_shuffle_changes_with_epoch(data_root):
    dm = SuperResolutionDataModule(_cfg(data_root, transforms=TransformsCfg(False, False, False)))
    loader = DataLoader(dm.train_dataset, batch_size=4, shuffle=True, num_workers=1, seed=7)
    first = next(iter(loader))[B.hr].copy()
    loader.set_epoch(1)
    second = next(iter(loader))[B.hr].copy()
    assert not np.array_equal(first, second)


def test_augmentation_deterministic_per_index(data_root):
    """Per-sample augmentation derives from (seed-key, index), not the global
    random module: identical across fetches/thread schedules at the same
    epoch key, different across epochs."""
    dm = SuperResolutionDataModule(_cfg(data_root))
    ds = dm.train_dataset
    ds.set_epoch(7)
    a1 = ds[0][consts.batch_items.hr].copy()
    b1 = ds[1][consts.batch_items.hr].copy()
    ds.set_epoch(7)
    np.testing.assert_array_equal(ds[0][consts.batch_items.hr], a1)
    np.testing.assert_array_equal(ds[1][consts.batch_items.hr], b1)
    ds.set_epoch(7)
    ref = [ds[i][consts.batch_items.hr].copy() for i in range(8)]
    ds.set_epoch(8)
    changed = any(
        not np.array_equal(ds[i][consts.batch_items.hr], r) for i, r in enumerate(ref)
    )
    assert changed, "augmentation must re-randomize across epochs"


def test_device_prefetch_early_exit_releases_producer(data_root):
    """Breaking out of device_prefetch must unblock and finish the producer
    thread (it used to block forever in q.put, leaking device batches)."""
    import threading
    import time

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from climsr_tpu.data.pipeline import device_prefetch
    from climsr_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(8, ("data",))
    sharding = NamedSharding(mesh, P("data"))

    def it():
        for i in range(50):
            yield {"x": np.full((8, 4), float(i), np.float32), "__valid__": 8}

    before = threading.active_count()
    gen = device_prefetch(it(), sharding)
    next(gen)
    gen.close()  # early exit
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_device_prefetch_drains_more_batches_than_queue_depth(data_root):
    """The completion sentinel must be delivered even when the queue is full
    when the producer finishes (a dropped sentinel deadlocks the consumer)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from climsr_tpu.data.pipeline import device_prefetch
    from climsr_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(8, ("data",))
    sharding = NamedSharding(mesh, P("data"))

    def it():
        for i in range(10):  # > prefetch depth
            yield {"x": np.full((8, 2), float(i), np.float32), "__valid__": 8}

    seen = sum(1 for _ in device_prefetch(it(), sharding))
    assert seen == 10
