#!/usr/bin/env python
"""Measured per-device memory evidence for ZeRO-1 (VERDICT r4 item 1).

Compiles the fused train step for the CelebA-HQ-256-shaped recipe
(nf 64, ch_mult 1 1 2 2 4 4, 256², DiscriminatorLarge, bf16 — the exact
model tools/bench_extra.py benches; /root/reference/readme.md:48-54) on
the 8-virtual-device CPU mesh twice — replicated optax vs zero1 — and
reports `compiled.memory_analysis()` per-device byte stats plus the
analytic optimizer-state accounting. The optimizer claim (2·P vs 2·P/n
f32 moment bytes per device) is batch-independent, so batch 1/device
keeps the CPU compile tractable.

Usage: python tools/zero1_memory.py [--out perf/r5_zero1_memory.txt]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("DDGAN_TPU_FORCE_PLATFORM", "cpu")
os.environ.setdefault("DDGAN_TPU_FORCE_NUM_CPU_DEVICES", "8")
from ddgan_tpu._platform import apply_force_platform  # noqa: E402

apply_force_platform()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def build(mode: str):
    from ddgan_tpu.config import Config
    from ddgan_tpu.diffusion import DiffusionCoefficients, PosteriorCoefficients
    from ddgan_tpu.parallel import make_mesh, replicate, shard_batch
    from ddgan_tpu.train import create_train_state, make_train_step
    from ddgan_tpu.train.loop import build_models, build_optimizers
    from ddgan_tpu.train.zero1 import Zero1Optimizer, place_zero1_state

    cfg = Config(
        dataset="celeba_256", image_size=256, num_channels=3,
        num_channels_dae=64, ch_mult=[1, 1, 2, 2, 4, 4], num_res_blocks=2,
        attn_resolutions=[16], nz=100, z_emb_dim=256, n_mlp=3,
        t_emb_dim=256, ngf=64, num_timesteps=2, batch_size=1,
        r1_gamma=2.0, lazy_reg=10, ema_decay=0.999, dropout=0.0,
        disc_small="no", compute_dtype="bfloat16",
        optimizer_sharding=mode,
    )
    mesh = make_mesh()
    gen, disc = build_models(cfg)
    coeff = DiffusionCoefficients.create(cfg.num_timesteps, cfg.beta_min, cfg.beta_max)
    pos = PosteriorCoefficients.create(cfg.num_timesteps, cfg.beta_min, cfg.beta_max)
    tx_g, tx_d = build_optimizers(cfg, mesh)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, disc, tx_g, tx_d,
        (cfg.image_size, cfg.image_size, cfg.num_channels), cfg.nz,
        batch=1, use_ema=True,
    )
    if isinstance(tx_g, Zero1Optimizer):
        state = place_zero1_state(mesh, state)
    else:
        state = replicate(mesh, state)
    step = make_train_step(
        gen, disc, coeff, pos,
        num_timesteps=cfg.num_timesteps, nz=cfg.nz, r1_gamma=cfg.r1_gamma,
        lazy_reg=cfg.lazy_reg, ema_decay=cfg.ema_decay, use_ema=True,
        tx_g=tx_g, tx_d=tx_d, mesh=mesh,
    )
    n_dev = len(jax.devices())
    batch = shard_batch(
        mesh,
        jnp.zeros((cfg.batch_size * n_dev, 256, 256, 3), jnp.float32),
    )
    lr = jnp.asarray(1e-4, jnp.float32)
    return step, state, batch, lr


def tree_bytes(tree):
    return sum(
        int(np.prod(l.shape)) * l.dtype.itemsize
        for l in jax.tree.leaves(tree)
        if hasattr(l, "dtype")
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    results = {}
    for mode in ("replicated", "zero1"):
        t0 = time.perf_counter()
        step, state, batch, lr = build(mode)
        lowered = step.lower(state, batch, jax.random.PRNGKey(1), lr, lr)
        compiled = lowered.compile()
        dt = time.perf_counter() - t0
        ma = compiled.memory_analysis()
        n = len(jax.devices())
        # per-DEVICE optimizer bytes: the moments' local shard
        opt_local = 0
        for opt in (state.opt_G, state.opt_D):
            for l in jax.tree.leaves(opt):
                if not hasattr(l, "dtype"):
                    continue
                shards = getattr(l, "addressable_shards", None)
                if shards:
                    s = shards[0].data
                    opt_local += int(np.prod(s.shape)) * s.dtype.itemsize
                else:
                    opt_local += int(np.prod(l.shape)) * l.dtype.itemsize
        results[mode] = {
            "compile_s": round(dt, 1),
            "argument_size_in_bytes": int(ma.argument_size_in_bytes),
            "output_size_in_bytes": int(ma.output_size_in_bytes),
            "temp_size_in_bytes": int(ma.temp_size_in_bytes),
            "alias_size_in_bytes": int(ma.alias_size_in_bytes),
            "optimizer_state_bytes_per_device": opt_local,
            "params_bytes": tree_bytes(state.params_G) + tree_bytes(state.params_D),
        }
        print(f"[{mode}] {json.dumps(results[mode])}", flush=True)
        del step, state, batch, lowered, compiled

    rep, z1 = results["replicated"], results["zero1"]
    summary = {
        "n_devices": len(jax.devices()),
        "opt_bytes_per_device_replicated": rep["optimizer_state_bytes_per_device"],
        "opt_bytes_per_device_zero1": z1["optimizer_state_bytes_per_device"],
        "opt_memory_ratio": round(
            rep["optimizer_state_bytes_per_device"]
            / max(1, z1["optimizer_state_bytes_per_device"]), 2,
        ),
        "argument_bytes_delta": rep["argument_size_in_bytes"]
        - z1["argument_size_in_bytes"],
    }
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            f.write(
                "# ZeRO-1 vs replicated optimizer memory, celeba256-shaped config\n"
                "# (nf 64, ch_mult 1 1 2 2 4 4, 256^2, DiscriminatorLarge, bf16,\n"
                "#  batch 1/device), 8-virtual-device CPU mesh.\n"
                "# compiled.memory_analysis() per-device stats + local moment bytes.\n"
                "# Tool: tools/zero1_memory.py\n"
            )
            for mode in ("replicated", "zero1"):
                f.write(f"{mode}: {json.dumps(results[mode])}\n")
            f.write(f"summary: {json.dumps(summary)}\n")


if __name__ == "__main__":
    main()
