#!/usr/bin/env python
"""Flagship-step throughput WITH the real host input pipeline (r3 V4).

bench.py times the fused step on device-resident synthetic data; this
tool answers "can ONE host core actually feed the chip at that rate?"
It builds a 50k-image CIFAR-10-format pickle set (the real on-disk
format), constructs the production dataset + transform + DataLoader
stack exactly like train/loop.py does (to_tensor + normalize, thread
prefetch), and times the same flagship step with loader fetch +
device_put in the path. Reports samples/s/chip host-in-path vs the
synthetic number measured in the same process.

Reference path being matched: ddgan.py:242-269 (torchvision CIFAR10 +
DataLoader(num_workers=4, pin_memory) feeding cuda).

Run: python tools/bench_host_loader.py [--root /tmp/hostbench]

`--host-only` skips the device step entirely and times the loader alone
(images/s from one host core, the quantity that bounds host-in-path
throughput) — measurable on any backend, e.g. while the TPU tunnel is
down. The flagship chip consumes 1571 samples/s (BENCH_r03); the loader
must sustain at least that.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def make_cifar_pickles(root: Path, n: int = 50000, seed: int = 0) -> None:
    """Random-content but REAL-format CIFAR batches (uint8, 5 files)."""
    base = root / "cifar-10-batches-py"
    base.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(seed)
    per = n // 5
    for b in range(1, 6):
        with open(base / f"data_batch_{b}", "wb") as f:
            pickle.dump(
                {b"data": rng.randint(0, 256, (per, 3072), dtype=np.uint8),
                 b"labels": [0] * per},
                f,
            )


def host_only(args, root: Path):
    """Loader-alone throughput from one host core (no jax, no device)."""
    from ddgan_tpu.config import default_config
    from ddgan_tpu.data import DataLoader, make_dataset

    cfg = default_config()
    cfg.dataset = "cifar10"
    cfg.image_size = 32
    cfg.data_dir = str(root)
    cfg.to_tensor_transform = "yes"
    cfg.use_normalize = "yes"
    dataset = make_dataset(cfg)
    assert len(dataset) == args.n, len(dataset)
    global_batch = 64  # flagship recipe batch per chip
    loader = DataLoader(
        dataset, batch_size=global_batch, shuffle=True, drop_last=True,
        num_workers=args.num_workers, seed=0,
    )
    vec = loader._vectorized_transform() is not None

    it = iter(loader)
    next(it)  # warm the prefetch threads
    t0 = time.perf_counter()
    done = 0
    while done < args.steps:
        try:
            x, _y = next(it)
        except StopIteration:
            loader.set_epoch(loader.epoch + 1)
            it = iter(loader)
            continue
        done += 1
    rate = global_batch * args.steps / (time.perf_counter() - t0)

    flagship = 1571.2  # samples/s/chip, BENCH_r03 (synthetic device data)
    result = {
        "mode": "host-only (loader alone, no device step)",
        "dataset": f"{args.n} CIFAR-format uint8 images (real pickle reader)",
        "num_workers": args.num_workers,
        "vectorized_loader_path": vec,
        "loader_images_per_sec": round(rate, 1),
        "flagship_chip_consumption_per_sec": flagship,
        "loader_headroom_x": round(rate / flagship, 2),
    }
    print(json.dumps(result, indent=2))
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/hostbench")
    ap.add_argument("--n", type=int, default=50000)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--num-workers", type=int, default=2)
    ap.add_argument("--host-only", action="store_true",
                    help="time the loader alone (no device step; any backend)")
    args = ap.parse_args()

    root = Path(args.root)
    if not (root / "cifar-10-batches-py").exists():
        print(f"writing {args.n} CIFAR-format images to {root}...", flush=True)
        make_cifar_pickles(root, args.n)

    if args.host_only:
        return host_only(args, root)

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(REPO))
    from bench import build_flagship_step
    from ddgan_tpu.data import DataLoader, make_dataset
    from ddgan_tpu.parallel import shard_batch

    step, state, synth_batch, key, lr_g, lr_d, cfg, mesh, n_dev = (
        build_flagship_step()
    )
    global_batch = cfg.batch_size * n_dev

    # --- synthetic (device-resident) reference window, same process
    for _ in range(3):
        key, k = jax.random.split(key)
        state, metrics = step(state, synth_batch, k, lr_g, lr_d)
    _ = float(metrics.errD)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        key, k = jax.random.split(key)
        state, metrics = step(state, synth_batch, k, lr_g, lr_d)
    _ = float(metrics.errD)
    synth_rate = global_batch * args.steps / (time.perf_counter() - t0) / n_dev

    # --- real loader in the path (production construction, loop.py)
    cfg.data_dir = str(root)
    cfg.to_tensor_transform = "yes"
    cfg.use_normalize = "yes"
    dataset = make_dataset(cfg)
    assert len(dataset) == args.n, len(dataset)
    loader = DataLoader(
        dataset, batch_size=global_batch, shuffle=True, drop_last=True,
        num_workers=args.num_workers, seed=0,
    )
    vec = loader._vectorized_transform() is not None

    it = iter(loader)
    # warmup: one fetch+put+step (step executable is already compiled)
    x, _y = next(it)
    key, k = jax.random.split(key)
    state, metrics = step(state, shard_batch(mesh, x), k, lr_g, lr_d)
    _ = float(metrics.errD)

    t0 = time.perf_counter()
    done = 0
    while done < args.steps:
        try:
            x, _y = next(it)
        except StopIteration:
            loader.set_epoch(loader.epoch + 1)
            it = iter(loader)
            continue
        key, k = jax.random.split(key)
        state, metrics = step(state, shard_batch(mesh, x), k, lr_g, lr_d)
        done += 1
    _ = float(metrics.errD)
    host_rate = global_batch * args.steps / (time.perf_counter() - t0) / n_dev

    result = {
        "dataset": f"{args.n} CIFAR-format uint8 images (real pickle reader)",
        "num_workers": args.num_workers,
        "vectorized_loader_path": vec,
        "samples_per_sec_per_chip_synthetic": round(synth_rate, 1),
        "samples_per_sec_per_chip_host_in_path": round(host_rate, 1),
        "host_overhead_pct": round(100 * (1 - host_rate / synth_rate), 1),
    }
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
