#!/usr/bin/env python
"""Benchmark: CIFAR-10 DDGAN train-step throughput (samples/sec/chip).

Runs the paper recipe (readme.md:29-36: batch 64/device, nf=128,
ch_mult 1 2 2 2, T=4, lazy R1 every 15 steps) as the fused jitted train
step on the available accelerator, timed over real steps after warmup.

Baseline: the reference publishes no numeric throughput. The anchor used
for vs_baseline is the original NVlabs CIFAR-10 recipe wall-clock
(~1800 epochs / ~48h on 4x V100 → ≈130 samples/s/GPU); vs_baseline is
samples/sec/chip divided by that. The driver's north star is ≥3x.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC_PER_GPU = 130.0


def build_flagship_step():
    """Construct the flagship (paper-recipe) fused train step.

    Returns (step, state, batch, key, lr_g, lr_d, cfg, mesh, n_dev) — shared
    by the throughput bench below and tools/profile_step.py's xprof capture.
    """
    import jax
    import jax.numpy as jnp

    # the flagship step takes minutes to compile on the remote chip; cache
    # the executable across bench/profile invocations
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from ddgan_tpu.diffusion import DiffusionCoefficients, PosteriorCoefficients
    from ddgan_tpu.parallel import make_mesh, replicate, shard_batch
    from ddgan_tpu.train import create_train_state, make_train_step, make_optimizer
    from __graft_entry__ import _flagship_config

    cfg = _flagship_config()
    n_dev = len(jax.devices())
    mesh = make_mesh()

    from ddgan_tpu.train.loop import build_models

    gen, disc = build_models(cfg)  # honors cfg.compute_dtype for BOTH nets
    coeff = DiffusionCoefficients.create(cfg.num_timesteps, cfg.beta_min, cfg.beta_max)
    pos_coeff = PosteriorCoefficients.create(
        cfg.num_timesteps, cfg.beta_min, cfg.beta_max
    )
    tx_d = make_optimizer(cfg.beta1_d, cfg.beta2_d, cfg.weight_decay_D, cfg.grad_clip_norm)
    tx_g = make_optimizer(cfg.beta1_g, cfg.beta2_g, cfg.weight_decay_G, cfg.grad_clip_norm)

    key = jax.random.PRNGKey(0)
    state = create_train_state(
        key, gen, disc, tx_g, tx_d,
        (cfg.image_size, cfg.image_size, cfg.num_channels), cfg.nz,
        batch=2, use_ema=True,
    )
    state = replicate(mesh, state)
    step = make_train_step(
        gen, disc, coeff, pos_coeff,
        num_timesteps=cfg.num_timesteps, nz=cfg.nz,
        r1_gamma=cfg.r1_gamma, lazy_reg=cfg.lazy_reg,
        ema_decay=cfg.ema_decay, use_ema=True,
        tx_g=tx_g, tx_d=tx_d, mesh=mesh,
    )

    global_batch = cfg.batch_size * n_dev  # 64/chip, paper recipe
    rng = np.random.RandomState(0)
    batch = shard_batch(
        mesh,
        jnp.asarray(
            rng.uniform(-1, 1, (global_batch, cfg.image_size, cfg.image_size,
                                cfg.num_channels)).astype(np.float32)
        ),
    )
    lr_g = jnp.asarray(cfg.lr_g, jnp.float32)
    lr_d = jnp.asarray(cfg.lr_d, jnp.float32)
    return step, state, batch, key, lr_g, lr_d, cfg, mesh, n_dev


def main():
    import jax

    step, state, batch, key, lr_g, lr_d, cfg, mesh, n_dev = build_flagship_step()
    global_batch = cfg.batch_size * n_dev  # 64/chip, paper recipe

    # warmup (compile both R1 branches: lazy_reg=15, so run >= 16 steps
    # would be wasteful — the cond compiles both branches into one program)
    for i in range(3):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k, lr_g, lr_d)
    _ = float(metrics.errD)

    # a multiple of lazy_reg=15 so the timed window contains R1 steps at
    # exactly the true 1/15 rate (warmup ends at global step 3; steps 15
    # and 30 fall inside the 30-step window)
    n_steps = 30
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k, lr_g, lr_d)
    # value fetch (not just block_until_ready) — a remote-device relay can
    # ack readiness early, but it cannot fabricate the scalar's bytes
    _ = float(metrics.errD)
    dt = time.perf_counter() - t0

    samples_per_sec_per_chip = global_batch * n_steps / dt / n_dev
    result = {
        "metric": "cifar10_t4_train_samples_per_sec_per_chip",
        "value": round(samples_per_sec_per_chip, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(
            samples_per_sec_per_chip / BASELINE_SAMPLES_PER_SEC_PER_GPU, 3
        ),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
