#!/usr/bin/env python
"""Execute the multi-HOST code paths for real (r2 VERDICT item 3).

The reference's L5 layer spawns one process per GPU and rendezvous via
torch.distributed env:// (ddgan.py:589-644). Our analog
(parallel/distributed.init_processes + mesh.shard_batch's
jax.make_array_from_process_local_data branch + the host-sharded
DataLoader) had never run under process_count>1 — all prior multi-device
evidence was single-process SPMD. This script launches TWO real
jax.distributed CPU processes (1 device each) and proves:

  1. rendezvous + teardown through `init_processes` (the production entry);
  2. host-sharded DataLoader disjointness: the two processes' index sets
     partition the dataset (DistributedSampler semantics, ddgan.py:245-254);
  3. global-batch assembly via `jax.make_array_from_process_local_data`
     (mesh.py shard_batch, process_count>1 branch);
  4. one fused SPMD train step with cross-PROCESS pmean whose metrics and
     post-step parameter checksums match the same step run single-process
     on a 2-device mesh with the identical global batch.

Run (serialized with this host's one-core rule — nothing else running):

  python tools/multihost_dryrun.py            # orchestrates everything
  python tools/multihost_dryrun.py --rank 0 --size 2 --out f.json  # child

Writes MULTIHOST_r03.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_DATA = 24          # divisible by shards*batch → full, pad-free coverage
LOCAL_BATCH = 4      # per-process (= per-device here) batch
GLOBAL_BATCH = 8


class IndexDataset:
    """Tiny dataset whose label IS the index — lets shards prove coverage."""

    def __init__(self, n: int = N_DATA, image_size: int = 8):
        self.n = n
        self.image_size = image_size

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        img = np.full((self.image_size, self.image_size, 1), idx / 100.0, np.float32)
        return img, idx


def _tiny_cfg():
    from ddgan_tpu.config import Config

    return Config(
        dataset="synthetic", exp="mh_dryrun", image_size=8, num_channels=1,
        num_channels_dae=8, ch_mult=[1], num_res_blocks=1,
        attn_resolutions=[4], nz=4, z_emb_dim=8, n_mlp=1, t_emb_dim=8,
        ngf=4, num_timesteps=2, batch_size=LOCAL_BATCH, dropout=0.0,
        lazy_reg=1, r1_gamma=0.05, ema_decay=0.999, seed=11,
    )


def _global_batch():
    rng = np.random.RandomState(0)
    return rng.uniform(-1, 1, (GLOBAL_BATCH, 8, 8, 1)).astype(np.float32)


def _run_steps(local_slice=None, n_steps: int = 2):
    """Build the fused step over the GLOBAL mesh and run n_steps.

    local_slice: this process's host-local piece of the global batch
    (multi-process), or None to device_put the full batch (single-process).
    Returns (metrics_dict, checksum) — checksum = Σ ||leaf|| over G params
    and EMA after the steps, a whole-trajectory fingerprint.
    """
    import jax
    import jax.numpy as jnp

    from ddgan_tpu.diffusion import DiffusionCoefficients, PosteriorCoefficients
    from ddgan_tpu.parallel import make_mesh, replicate, shard_batch
    from ddgan_tpu.train import create_train_state, make_optimizer, make_train_step
    from ddgan_tpu.train.loop import build_models

    cfg = _tiny_cfg()
    gen, disc = build_models(cfg)
    coeff = DiffusionCoefficients.create(cfg.num_timesteps, cfg.beta_min, cfg.beta_max)
    pos = PosteriorCoefficients.create(cfg.num_timesteps, cfg.beta_min, cfg.beta_max)
    tx_d = make_optimizer(cfg.beta1_d, cfg.beta2_d, cfg.weight_decay_D, cfg.grad_clip_norm)
    tx_g = make_optimizer(cfg.beta1_g, cfg.beta2_g, cfg.weight_decay_G, cfg.grad_clip_norm)
    mesh = make_mesh()  # GLOBAL devices (spans processes when size>1)

    key = jax.random.PRNGKey(cfg.seed)
    state = create_train_state(
        key, gen, disc, tx_g, tx_d,
        (cfg.image_size, cfg.image_size, cfg.num_channels), cfg.nz,
        batch=2, use_ema=True,
    )
    state = replicate(mesh, state)
    step = make_train_step(
        gen, disc, coeff, pos,
        num_timesteps=cfg.num_timesteps, nz=cfg.nz,
        r1_gamma=cfg.r1_gamma, lazy_reg=cfg.lazy_reg,
        ema_decay=cfg.ema_decay, use_ema=True,
        tx_g=tx_g, tx_d=tx_d, mesh=mesh,
    )

    full = _global_batch()
    batch = shard_batch(mesh, full if local_slice is None else local_slice)

    lr_g = jnp.asarray(cfg.lr_g, jnp.float32)
    lr_d = jnp.asarray(cfg.lr_d, jnp.float32)
    key = jax.random.PRNGKey(99)
    metrics = None
    for _ in range(n_steps):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k, lr_g, lr_d)

    out = {
        "errD": float(metrics.errD),
        "errG": float(metrics.errG),
        "d_real": float(metrics.errD_real),
    }
    checksum = 0.0
    for leaf in jax.tree.leaves(state.params_G) + jax.tree.leaves(state.ema_G):
        checksum += float(jnp.linalg.norm(leaf.astype(jnp.float32)))
    return out, checksum


def child(rank: int, size: int, out_path: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    try:  # cross-process CPU collectives ride gloo
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    class Args:
        master_address = "127.0.0.1"

    def fn(rank_, gpu, args):
        import jax
        from jax.experimental import multihost_utils

        assert jax.process_count() == size, jax.process_count()
        assert jax.process_index() == rank_
        assert len(jax.devices()) == size and len(jax.local_devices()) == 1

        # --- host-sharded loader: shards must PARTITION the dataset
        from ddgan_tpu.data.loader import DataLoader

        dl = DataLoader(
            IndexDataset(), batch_size=LOCAL_BATCH, shuffle=True,
            drop_last=True, num_shards=size, shard_id=rank_, seed=5,
        )
        dl.set_epoch(0)
        local_idx = []
        for _x, y in dl:
            local_idx.extend(int(v) for v in y)
        assert len(local_idx) == N_DATA // size, len(local_idx)
        gathered = multihost_utils.process_allgather(
            np.asarray(sorted(local_idx), np.int32)
        )
        union = sorted(int(v) for row in gathered for v in row)
        assert union == list(range(N_DATA)), (
            f"host shards do not partition the dataset: {union}"
        )

        # --- fused SPMD step across processes, host-local batch assembly
        full = _global_batch()
        local = full[rank_ * LOCAL_BATCH : (rank_ + 1) * LOCAL_BATCH]
        metrics, checksum = _run_steps(local_slice=local)
        if rank_ == 0:
            with open(out_path, "w") as f:
                json.dump({"metrics": metrics, "checksum": checksum,
                           "process_count": size}, f)
        return 0

    from ddgan_tpu.parallel.distributed import init_processes

    init_processes(rank, size, fn, Args())


def single(out_path: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    metrics, checksum = _run_steps(local_slice=None)
    with open(out_path, "w") as f:
        json.dump({"metrics": metrics, "checksum": checksum,
                   "process_count": 1}, f)


def orchestrate(out_json: str) -> int:
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    me = str(Path(__file__).resolve())

    print("[1/2] single-process 2-device reference run...")
    single_out = "/tmp/mh_single.json"
    subprocess.run(
        [sys.executable, me, "--single", "--out", single_out],
        env=env, check=True, timeout=1800,
    )

    print("[2/2] launching 2 jax.distributed processes...")
    multi_out = "/tmp/mh_rank0.json"
    procs = [
        subprocess.Popen(
            [sys.executable, me, "--rank", str(r), "--size", "2",
             "--out", multi_out],
            env=env,
        )
        for r in range(2)
    ]
    try:
        codes = [p.wait(timeout=1800) for p in procs]
    finally:
        # never leave an orphan holding the coordinator port (one-core
        # host: a hung rank would also block every later python job)
        for p in procs:
            if p.poll() is None:
                p.kill()
                p.wait()
    assert codes == [0, 0], f"child exit codes {codes}"

    with open(single_out) as f:
        s = json.load(f)
    with open(multi_out) as f:
        m = json.load(f)

    diffs = {
        k: abs(s["metrics"][k] - m["metrics"][k]) for k in s["metrics"]
    }
    diffs["checksum"] = abs(s["checksum"] - m["checksum"])
    # identical math on identical data: same global mesh shape, same
    # fold_in(axis_index) streams, deterministic CPU kernels → tight match
    ok = all(v < 1e-4 for v in diffs.values())
    result = {
        "ok": ok,
        "single_process": s,
        "two_process": m,
        "abs_diffs": diffs,
        "evidence": [
            "init_processes rendezvous + teardown (2 real jax.distributed procs)",
            "DataLoader num_shards/shard_id partition asserted via process_allgather",
            "make_array_from_process_local_data global-batch assembly",
            "fused SPMD step pmean across processes == single-process 2-device run",
        ],
    }
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    return 0 if ok else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, default=None)
    ap.add_argument("--size", type=int, default=2)
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--out", default=str(REPO / "MULTIHOST_r03.json"))
    a = ap.parse_args()

    if a.single:
        single(a.out)
    elif a.rank is not None:
        child(a.rank, a.size, a.out)
    else:
        sys.exit(orchestrate(a.out))
