#!/usr/bin/env python
"""Execute the multi-HOST code paths for real (r2 V3, widened per r3 V7).

The reference's L5 layer spawns one process per GPU and rendezvous via
torch.distributed env:// (ddgan.py:589-644). Our analog
(parallel/distributed.init_processes + mesh.shard_batch's
jax.make_array_from_process_local_data branch + the host-sharded
DataLoader) is proven here with REAL jax.distributed CPU processes in
TWO topologies:

  * 2 processes × 1 device  vs  1 process × 2 devices
  * 2 processes × 2 devices vs  1 process × 4 devices  (multi-device
    hosts — the production v5e pod shape)

and per topology:

  1. rendezvous + teardown through `init_processes` (the production entry);
  2. host-sharded DataLoader disjointness: the processes' index sets
     partition the dataset (DistributedSampler semantics, ddgan.py:245-254);
  3. global-batch assembly via `jax.make_array_from_process_local_data`
     (mesh.py shard_batch, process_count>1 branch);
  4. one fused SPMD train step with cross-PROCESS pmean whose metrics and
     post-step parameter checksums match the same step run single-process
     on the same-size mesh with the identical global batch;
  5. a mesh-sharded SAMPLER call (test_ddgan's generation path) on the
     trained params, checksum-matched against the single-process run;
  6. the loader-construction fallback REGRESSION (r3 VERDICT item 3): a
     failing loader under process_count>1 must raise (never silently
     retry unsharded and duplicate data across hosts), while a
     single-process run degrades to the unsharded loader like
     ddgan.py:262-269;
  7. (r5) the SAME steps with the ZeRO-1 sharded optimizer: moments
     placed across processes via place_zero1_state's
     make_array_from_process_local_data branch, psum_scatter/all_gather
     riding the cross-process collectives — metrics/checksums must match
     the single-process zero1 run AND stay within trajectory tolerance
     of the replicated path (train/zero1.py docstring).

Run (serialized with this host's one-core rule — nothing else running):

  python tools/multihost_dryrun.py            # orchestrates everything
  python tools/multihost_dryrun.py --rank 0 --size 2 --out f.json  # child

Writes MULTIHOST_r05.json at the repo root.
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
GLOBAL_BATCH = 8     # global batch in every topology (per-device varies)


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


class BrokenDataset:
    """__len__ raises → DataLoader construction validation fails."""

    def __len__(self):
        raise RuntimeError("broken dataset (forced loader failure)")

    def __getitem__(self, idx):  # pragma: no cover
        raise RuntimeError("unreachable")


def _tiny_cfg():
    from ddgan_tpu.config import Config

    return Config(
        dataset="synthetic", exp="mh_dryrun", image_size=8, num_channels=1,
        num_channels_dae=8, ch_mult=[1], num_res_blocks=1,
        attn_resolutions=[4], nz=4, z_emb_dim=8, n_mlp=1, t_emb_dim=8,
        ngf=4, num_timesteps=2, batch_size=GLOBAL_BATCH, dropout=0.0,
        lazy_reg=1, r1_gamma=0.05, ema_decay=0.999, seed=11,
    )


def _global_batch():
    rng = np.random.RandomState(0)
    return rng.uniform(-1, 1, (GLOBAL_BATCH, 8, 8, 1)).astype(np.float32)


def _run_steps(local_slice=None, n_steps: int = 2, zero1: bool = False):
    """Build the fused step over the GLOBAL mesh, run n_steps, then one
    sharded-sampler call on the trained params.

    local_slice: this process's host-local piece of the global batch
    (multi-process), or None to device_put the full batch (single-process).
    zero1: use the ZeRO-1 sharded optimizer (train/zero1.py) instead of
    the replicated optax path — exercises place_zero1_state's
    multi-process placement branch and the cross-process
    psum_scatter/all_gather collectives.
    Returns (metrics_dict, checksum, sample_checksum) — checksum =
    Σ ||leaf|| over G params and EMA after the steps (a whole-trajectory
    fingerprint); sample_checksum fingerprints the generation path.
    """
    import jax
    import jax.numpy as jnp

    from ddgan_tpu.diffusion import (
        DiffusionCoefficients,
        PosteriorCoefficients,
        make_sharded_sampler,
    )
    from ddgan_tpu.parallel import make_mesh, replicate, shard_batch
    from ddgan_tpu.train import (
        create_train_state,
        make_optimizer,
        make_train_step,
        make_zero1_optimizer,
        place_zero1_state,
    )
    from ddgan_tpu.train.loop import build_models

    cfg = _tiny_cfg()
    gen, disc = build_models(cfg)
    coeff = DiffusionCoefficients.create(cfg.num_timesteps, cfg.beta_min, cfg.beta_max)
    pos = PosteriorCoefficients.create(cfg.num_timesteps, cfg.beta_min, cfg.beta_max)
    mesh = make_mesh()  # GLOBAL devices (spans processes when size>1)
    n_dev = mesh.size
    if zero1:
        tx_d = make_zero1_optimizer(
            cfg.beta1_d, cfg.beta2_d, cfg.weight_decay_D, cfg.grad_clip_norm, n_dev
        )
        tx_g = make_zero1_optimizer(
            cfg.beta1_g, cfg.beta2_g, cfg.weight_decay_G, cfg.grad_clip_norm, n_dev
        )
    else:
        tx_d = make_optimizer(cfg.beta1_d, cfg.beta2_d, cfg.weight_decay_D, cfg.grad_clip_norm)
        tx_g = make_optimizer(cfg.beta1_g, cfg.beta2_g, cfg.weight_decay_G, cfg.grad_clip_norm)

    key = jax.random.PRNGKey(cfg.seed)
    state = create_train_state(
        key, gen, disc, tx_g, tx_d,
        (cfg.image_size, cfg.image_size, cfg.num_channels), cfg.nz,
        batch=2, use_ema=True,
    )
    state = place_zero1_state(mesh, state) if zero1 else replicate(mesh, state)
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

    # --- sharded sampler over the SAME mesh on the trained params
    # (test_ddgan.py:180-208 generation path, sharded like cli/test_cli.py)
    params_G = state.params_G
    buffers_G = state.buffers_G

    def generator(x, t, z):
        variables = {"params": params_G}
        if buffers_G:
            variables["buffers"] = buffers_G
        return gen.apply(variables, x, t, z, train=False)

    if zero1:
        # the generation path is optimizer-independent; the replicated
        # leg already fingerprints it — skip the extra compile here
        return out, checksum, 0.0

    sampler = make_sharded_sampler(
        pos, generator, cfg.num_timesteps,
        (cfg.image_size, cfg.image_size, cfg.num_channels), cfg.nz,
        mesh, per_device_batch=max(1, GLOBAL_BATCH // n_dev),
    )
    samples = sampler(jax.random.PRNGKey(7))
    sample_checksum = float(jnp.linalg.norm(samples.astype(jnp.float32)))
    return out, checksum, sample_checksum


def child(rank: int, size: int, local_devices: int, out_path: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)
    try:  # cross-process CPU collectives ride gloo
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass

    class Args:
        master_address = "127.0.0.1"

    def fn(rank_, gpu, args):
        import jax
        from jax.experimental import multihost_utils

        n_global = size * local_devices
        assert jax.process_count() == size, jax.process_count()
        assert jax.process_index() == rank_
        assert len(jax.devices()) == n_global
        assert len(jax.local_devices()) == local_devices

        # --- host-sharded loader: shards must PARTITION the dataset
        from ddgan_tpu.data.loader import DataLoader

        local_batch = GLOBAL_BATCH // size
        dl = DataLoader(
            IndexDataset(), batch_size=local_batch, shuffle=True,
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

        # --- loader-failure regression (r3 V3): under process_count>1 a
        # failing loader construction must RAISE, never silently retry
        # unsharded (which would feed every host the full dataset)
        from ddgan_tpu.train.loop import build_loader

        cfg = _tiny_cfg()
        raised = False
        try:
            build_loader(cfg, BrokenDataset(), local_batch)
        except RuntimeError:
            raised = True
        assert raised, "multi-host loader fallback silently swallowed the failure"

        # --- fused SPMD step across processes, host-local batch assembly
        full = _global_batch()
        local = full[rank_ * local_batch : (rank_ + 1) * local_batch]
        metrics, checksum, sample_checksum = _run_steps(local_slice=local)

        # --- (r5) same steps under the ZeRO-1 sharded optimizer: moments
        # placed via make_array_from_process_local_data, psum_scatter /
        # all_gather riding the cross-process gloo collectives
        z_metrics, z_checksum, _ = _run_steps(local_slice=local, zero1=True)
        if rank_ == 0:
            with open(out_path, "w") as f:
                json.dump({"metrics": metrics, "checksum": checksum,
                           "sample_checksum": sample_checksum,
                           "zero1_metrics": z_metrics,
                           "zero1_checksum": z_checksum,
                           "process_count": size,
                           "local_devices": local_devices,
                           "loader_failure_raised": raised}, f)
        return 0

    from ddgan_tpu.parallel.distributed import init_processes

    init_processes(rank, size, fn, Args())


def single(n_devices: int, out_path: str) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)

    # single-process: the loader fallback must DEGRADE (ddgan.py:262-269),
    # not raise — the retry drops host sharding and construction succeeds
    from ddgan_tpu.train.loop import build_loader

    loader = build_loader(_tiny_cfg(), BrokenDataset(), GLOBAL_BATCH)
    assert loader.num_shards == 1, "fallback loader must be unsharded"

    metrics, checksum, sample_checksum = _run_steps(local_slice=None)
    z_metrics, z_checksum, _ = _run_steps(local_slice=None, zero1=True)
    with open(out_path, "w") as f:
        json.dump({"metrics": metrics, "checksum": checksum,
                   "sample_checksum": sample_checksum,
                   "zero1_metrics": z_metrics,
                   "zero1_checksum": z_checksum,
                   "process_count": 1, "local_devices": n_devices,
                   "single_fallback_degraded": True}, f)


def _run_topology(local_devices: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    me = str(Path(__file__).resolve())
    n_global = 2 * local_devices

    print(f"[topology 2x{local_devices}] single-process {n_global}-device "
          "reference run...")
    single_out = f"/tmp/mh_single_{n_global}.json"
    subprocess.run(
        [sys.executable, me, "--single", "--local-devices", str(n_global),
         "--out", single_out],
        env=env, check=True, timeout=1800,
    )

    print(f"[topology 2x{local_devices}] launching 2 jax.distributed "
          f"processes x {local_devices} devices...")
    multi_out = f"/tmp/mh_rank0_{n_global}.json"
    procs = [
        subprocess.Popen(
            [sys.executable, me, "--rank", str(r), "--size", "2",
             "--local-devices", str(local_devices), "--out", multi_out],
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

    diffs = {k: abs(s["metrics"][k] - m["metrics"][k]) for k in s["metrics"]}
    diffs["checksum"] = abs(s["checksum"] - m["checksum"])
    diffs["sample_checksum"] = abs(s["sample_checksum"] - m["sample_checksum"])
    diffs["zero1_checksum"] = abs(s["zero1_checksum"] - m["zero1_checksum"])
    diffs.update({
        f"zero1_{k}": abs(s["zero1_metrics"][k] - m["zero1_metrics"][k])
        for k in s["zero1_metrics"]
    })
    # identical math on identical data: same global mesh shape, same
    # fold_in(axis_index) streams, deterministic CPU kernels → tight match
    ok = all(v < 1e-4 for v in diffs.values())
    # zero1 vs replicated is float-associativity-equal, not bit-equal
    # (train/zero1.py docstring): a loose trajectory bound, recorded
    zero1_vs_replicated = abs(s["zero1_checksum"] - s["checksum"])
    ok = ok and zero1_vs_replicated < 1e-2
    return {
        "topology": f"2 procs x {local_devices} devs vs 1 proc x {n_global} devs",
        "ok": ok,
        "single_process": s,
        "two_process": m,
        "abs_diffs": diffs,
        "zero1_vs_replicated_checksum_diff": zero1_vs_replicated,
    }


def orchestrate(out_json: str) -> int:
    topo = [_run_topology(1), _run_topology(2)]
    ok = all(t["ok"] for t in topo)
    result = {
        "ok": ok,
        "topologies": topo,
        "evidence": [
            "init_processes rendezvous + teardown (2 real jax.distributed procs)",
            "DataLoader num_shards/shard_id partition asserted via process_allgather",
            "make_array_from_process_local_data global-batch assembly",
            "fused SPMD step pmean across processes == single-process same-size mesh",
            "mesh-sharded sampler checksum == single-process run (generation path)",
            "forced loader failure RAISES under process_count>1, degrades at 1",
            "ZeRO-1 sharded-optimizer step across processes (moments via "
            "make_array_from_process_local_data, cross-process "
            "psum_scatter/all_gather) == single-process zero1 run; "
            "trajectory within tolerance of the replicated path",
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
    ap.add_argument("--local-devices", type=int, default=1)
    ap.add_argument("--out", default=str(REPO / "MULTIHOST_r05.json"))
    a = ap.parse_args()

    if a.single:
        single(a.local_devices, a.out)
    elif a.rank is not None:
        child(a.rank, a.size, a.local_devices, a.out)
    else:
        sys.exit(orchestrate(a.out))
