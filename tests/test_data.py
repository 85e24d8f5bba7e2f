"""Data-layer tests: NIfTI reader, LUNA16 slice scanning + cache format,
patch/folder datasets, transforms, StackMNIST IDX reader, CIFAR-10 pickle
reader, sharded loader."""

import gzip
import json
import os
import pickle
import struct

import numpy as np
import pytest
from PIL import Image

from ddgan_tpu.config import Config
from ddgan_tpu.data import (
    CIFAR10,
    DataLoader,
    DatasetCustom,
    Luna16Dataset,
    PositivePatchDataset,
    StackedMNIST,
    SyntheticDataset,
    build_transform,
    load_slice_info,
    make_dataset,
    read_nifti,
    save_slice_info,
    write_nifti,
)


def test_nifti_roundtrip(tmp_path):
    vol = np.random.RandomState(0).randint(0, 255, (16, 12, 8)).astype(np.float32)
    path = tmp_path / "vol.nii.gz"
    write_nifti(path, vol)
    back = read_nifti(path)
    np.testing.assert_allclose(back, vol.astype(np.float64))
    # uncompressed too
    path2 = tmp_path / "vol.nii"
    write_nifti(path2, vol.astype(np.int16))
    np.testing.assert_allclose(read_nifti(path2), vol.astype(np.float64))


def _make_luna_volume(tmp_path, n_files=2):
    data_dir = tmp_path / "data"
    mask_dir = tmp_path / "masks"
    data_dir.mkdir()
    mask_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(n_files):
        vol = rng.randint(0, 255, (256, 256, 256)).astype(np.uint8)
        mask = np.zeros((256, 256, 256), np.uint8)
        mask[100:110, 120:125, 130:140] = 1
        write_nifti(data_dir / f"case{i}.nii.gz", vol)
        write_nifti(mask_dir / f"case{i}.nii.gz", mask)
    return data_dir, mask_dir


def test_luna16_dataset_scan_and_cache(tmp_path, monkeypatch):
    data_dir, mask_dir = _make_luna_volume(tmp_path, n_files=1)
    monkeypatch.chdir(tmp_path)
    ds = Luna16Dataset(
        str(data_dir), str(mask_dir), bound_exp_lim=2, single_axis=True, _where="z"
    )
    # mask z-extent 130..139 (+1 edge) expanded by 2 → 128..141
    assert len(ds) == 14
    img, label = ds[0]
    assert label == 1
    assert np.asarray(img).shape == (256, 256)

    # cache round-trip: same format as configs/SlicesInfo*.txt
    cache = tmp_path / "slices.txt"
    save_slice_info(ds.slice_info, str(cache))
    ds2 = Luna16Dataset(
        str(data_dir), str(mask_dir), path_to_slices_info=str(cache)
    )
    assert ds2.slice_info == ds.slice_info


def test_luna16_3d_grouping(tmp_path, monkeypatch):
    data_dir, mask_dir = _make_luna_volume(tmp_path, n_files=1)
    monkeypatch.chdir(tmp_path)
    ds = Luna16Dataset(
        str(data_dir), str(mask_dir), bound_exp_lim=2, _3d=True, bounders=3,
        single_axis=True, _where="z",
    )
    assert len(ds) > 0
    img, _ = ds[0]
    # groups of bounders+1 strided indices span bounders*bounders slices
    assert np.asarray(img).shape == (256, 256, 9)


def test_positive_patch_dataset(tmp_path):
    sub = tmp_path / "case1"
    sub.mkdir()
    np.save(sub / "p_label_1.npy", np.random.RandomState(0).rand(64, 64, 64))
    ds = PositivePatchDataset(str(tmp_path), limited_slices=True)
    assert len(ds) == 8  # stride 8 over 64 slices
    img, label = ds[0]
    assert np.asarray(img).shape == (64, 64)
    ds_full = PositivePatchDataset(str(tmp_path), limited_slices=False)
    assert len(ds_full) == 64


def test_dataset_custom_and_transforms(tmp_path):
    d = tmp_path / "train" / "cls"
    d.mkdir(parents=True)
    for i in range(3):
        Image.fromarray(
            np.random.RandomState(i).randint(0, 255, (20, 20, 3), dtype=np.uint8)
        ).save(d / f"{i}.jpg")
    args = Config(
        do_resize="yes", to_tensor_transform="yes", use_normalize="yes",
        CenterCrop="yes", image_size=16, num_channels=3,
    )
    t = build_transform(args)
    ds = DatasetCustom(str(tmp_path), class_="train", transform=t)
    img, _ = ds[0]
    assert img.shape == (16, 16, 3)
    assert img.min() >= -1.0 and img.max() <= 1.0


def _write_idx(path, arr):
    with open(path, "wb") as f:
        ndim = arr.ndim
        f.write(struct.pack(">I", 0x800 + ndim))
        for d in arr.shape:
            f.write(struct.pack(">I", d))
        f.write(arr.astype(np.uint8).tobytes())


def test_stackmnist(tmp_path):
    imgs = np.random.RandomState(0).randint(0, 255, (10, 28, 28), dtype=np.uint8)
    labels = np.arange(10, dtype=np.uint8)
    _write_idx(tmp_path / "train-images-idx3-ubyte", imgs)
    _write_idx(tmp_path / "train-labels-idx1-ubyte", labels)
    ds = StackedMNIST(str(tmp_path), train=True, rng=np.random.default_rng(0))
    assert len(ds) == 20
    img, target = ds[0]
    assert np.asarray(img).shape == (28, 28, 3)
    assert 0 <= target <= 999


def test_cifar10_reader(tmp_path):
    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump(
                {b"data": rng.randint(0, 255, (5, 3072), dtype=np.uint8),
                 b"labels": list(rng.randint(0, 10, 5))},
                f,
            )
    ds = CIFAR10(str(tmp_path), train=True)
    assert len(ds) == 25
    img, label = ds[0]
    assert np.asarray(img).shape == (32, 32, 3)


def test_loader_sharding_and_batching():
    ds = SyntheticDataset(n=64, image_size=8, num_channels=1)
    # two shards must partition each epoch's samples disjointly
    l0 = DataLoader(ds, batch_size=4, num_shards=2, shard_id=0, seed=7)
    l1 = DataLoader(ds, batch_size=4, num_shards=2, shard_id=1, seed=7)
    b0 = [b for b, _ in l0]
    b1 = [b for b, _ in l1]
    assert len(b0) == len(b1) == 8
    assert all(b.shape == (4, 8, 8, 1) for b in b0)
    flat0 = np.concatenate([b.reshape(-1) for b in b0])
    flat1 = np.concatenate([b.reshape(-1) for b in b1])
    assert not np.array_equal(flat0, flat1)

    # set_epoch reshuffles
    l0.set_epoch(1)
    b0e1 = [b for b, _ in l0]
    assert not np.array_equal(b0[0], b0e1[0])

    # prefetch worker path yields identical batches (same epoch 0)
    lw = DataLoader(ds, batch_size=4, num_shards=2, shard_id=0, seed=7, num_workers=2)
    bw = [b for b, _ in lw]
    for a, b in zip(b0, bw):
        np.testing.assert_array_equal(a, b)


def test_make_dataset_synthetic():
    args = Config(dataset="synthetic", image_size=8, num_channels=1)
    ds = make_dataset(args)
    assert len(ds) == 256


def test_loader_multiworker_order_and_early_exit():
    """N>1 workers must emit batches in deterministic order, and an early
    consumer exit (limited_iter) must not leave workers blocked."""
    import threading
    import time

    ds = SyntheticDataset(n=128, image_size=8, num_channels=1)
    ref = [b for b, _ in DataLoader(ds, batch_size=8, seed=3)]
    l4 = DataLoader(ds, batch_size=8, seed=3, num_workers=4)
    got = [b for b, _ in l4]
    assert len(got) == len(ref)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)

    # early exit: consume 2 of 16 batches, then drop the iterator
    before = threading.active_count()
    it = iter(DataLoader(ds, batch_size=8, seed=3, num_workers=4, prefetch=2))
    next(it), next(it)
    it.close()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_loader_worker_error_propagates():
    """A worker exception must re-raise in the consumer (torch DataLoader
    semantics), not hang the results.get() re-sequencer forever."""

    class BadDataset:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            if i == 13:
                raise OSError("corrupt file")
            return np.zeros((4, 4, 1), np.float32), 0

    loader = DataLoader(BadDataset(), batch_size=4, shuffle=False,
                        num_workers=2)
    with pytest.raises(OSError, match="corrupt file"):
        for _ in loader:
            pass


def test_loader_vectorized_uint8_path_matches_per_image(tmp_path):
    """The uint8 batch-vectorized fast path (one gather + batch normalize)
    must be numerically identical to the per-image PIL path it replaces
    (r3 VERDICT item 4 host-throughput fix)."""
    from ddgan_tpu.data.transforms import Compose, Normalize, ToTensor

    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    rng = np.random.RandomState(3)
    for i in range(1, 6):
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump(
                {b"data": rng.randint(0, 256, (8, 3072), dtype=np.uint8),
                 b"labels": list(range(8))},
                f,
            )
    tf = Compose([ToTensor(), Normalize((0.5,) * 3, (0.5,) * 3)])
    ds = CIFAR10(str(tmp_path), train=True, transform=tf)
    fast = DataLoader(ds, batch_size=8, shuffle=False, drop_last=True)
    assert fast._vectorized_transform() is not None

    batches = list(fast)
    # per-image reference: __getitem__ drives PIL + the transform pipeline
    want = np.stack([np.asarray(ds[i][0], np.float32) for i in range(8)])
    np.testing.assert_allclose(batches[0][0], want, rtol=0, atol=1e-6)
    np.testing.assert_array_equal(batches[0][1], np.arange(8))

    # pipelines the fast path can't express fall back to per-image
    from ddgan_tpu.data.transforms import CenterCrop

    ds2 = CIFAR10(str(tmp_path), train=True,
                  transform=Compose([ToTensor(), CenterCrop(16)]))
    slow = DataLoader(ds2, batch_size=4, shuffle=False)
    assert slow._vectorized_transform() is None
    x, _ = next(iter(slow))
    assert x.shape == (4, 16, 16, 3)


def test_build_loader_fallback_single_process():
    """Loader-construction failure degrades to an unsharded loader in
    single-process runs (ddgan.py:262-269 analog); multi-process re-raise
    is covered by tools/multihost_dryrun.py (real 2-process run)."""
    from ddgan_tpu.train.loop import build_loader

    class BrokenLen:
        def __len__(self):
            raise RuntimeError("boom")

        def __getitem__(self, i):
            raise AssertionError("unreachable")

    cfg = Config(seed=3, num_workers=0)
    loader = build_loader(cfg, BrokenLen(), host_batch=4)
    assert loader.num_shards == 1
