#!/usr/bin/env python
"""Secondary on-chip benchmarks: T=4 sampler throughput and the
CelebA-HQ-256 recipe train step.

bench.py stays the driver's single-JSON-line flagship number; this tool
reproduces the two other headline measurements recorded in STATUS.md:

  python tools/bench_extra.py sampler     # T=4 reverse diffusion, batch 256
  python tools/bench_extra.py celeba256   # 256^2 recipe fused train step

Timing uses a VALUE fetch as the barrier (CLAUDE.md: the axon relay has
been observed acking `block_until_ready` early).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def bench_sampler(batch: int = 256, n_iters: int = 20) -> dict:
    import jax
    import jax.numpy as jnp

    _cache()
    from __graft_entry__ import _flagship_config
    from ddgan_tpu.diffusion import PosteriorCoefficients, sample_from_model
    from ddgan_tpu.models import NCSNpp

    cfg = _flagship_config()
    gen = NCSNpp.from_config(cfg)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, cfg.image_size, cfg.image_size, cfg.num_channels), jnp.float32)
    variables = gen.init(
        {"params": key, "dropout": key}, x[:2], jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, cfg.nz), jnp.float32),
    )
    pos_coeff = PosteriorCoefficients.create(
        cfg.num_timesteps, cfg.beta_min, cfg.beta_max
    )

    def model_fn(xt, t, z):
        return gen.apply(variables, xt, t, z, train=False)

    @jax.jit
    def sample(key):
        kx, kz = jax.random.split(key)
        x_init = jax.random.normal(
            kx, (batch, cfg.image_size, cfg.image_size, cfg.num_channels)
        )
        return sample_from_model(
            pos_coeff, model_fn, cfg.num_timesteps, x_init, kz, cfg.nz
        )

    # keys pre-split OUTSIDE the timed loop (an eager split between calls
    # serializes a tunnel round-trip into every dispatch — the r2
    # "per-dispatch relay overhead" was mostly this, see r5 sampler256)
    keys = list(jax.random.split(key, n_iters + 1))
    out = sample(keys[-1])  # compile
    _ = float(out.reshape(-1)[0])
    t0 = time.perf_counter()
    for k in keys[:n_iters]:
        out = sample(k)
    _ = float(out.reshape(-1)[0])
    dt = time.perf_counter() - t0
    rate = batch * n_iters / dt
    return {
        "metric": "cifar10_t4_sampler_samples_per_sec_per_chip",
        "value": round(rate, 2),
        "unit": "samples/sec/chip",
        "ms_per_call": round(dt / n_iters * 1e3, 1),
    }


def bench_sampler256(
    batch: int = 16, n_iters: int = 5, recipe: str = "celeba256",
    scan: int = 1,
) -> dict:
    """256² generation throughput (serving-path analog of the reference's
    test_ddgan.py sampling loop at the readme.md:39-57 recipes): T-step
    reverse diffusion through the full 39.8M-param NCSNpp at 256², bf16,
    fresh z per step. Region s2d closure applies per the model default."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    _cache()
    from ddgan_tpu.config import Config
    from ddgan_tpu.diffusion import PosteriorCoefficients, sample_from_model
    from ddgan_tpu.models import NCSNpp

    lsun = recipe == "lsun256"
    cfg = Config(
        dataset="lsun" if lsun else "celeba_256",
        image_size=256, num_channels=3,
        num_channels_dae=64, ch_mult=[1, 1, 2, 2, 4, 4], num_res_blocks=2,
        attn_resolutions=[16], nz=100, z_emb_dim=256, n_mlp=3,
        t_emb_dim=256, num_timesteps=4 if lsun else 2,
        dropout=0.0, compute_dtype="bfloat16",
    )
    gen = NCSNpp.from_config(cfg)
    key = jax.random.PRNGKey(0)
    variables = gen.init(
        {"params": key, "dropout": key},
        jnp.zeros((2, 256, 256, 3), jnp.float32), jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, cfg.nz), jnp.float32),
    )
    pos_coeff = PosteriorCoefficients.create(
        cfg.num_timesteps, cfg.beta_min, cfg.beta_max
    )

    def model_fn(xt, t, z):
        return gen.apply(variables, xt, t, z, train=False)

    @jax.jit
    def sample(key):
        kx, kz = jax.random.split(key)
        x_init = jax.random.normal(kx, (batch, 256, 256, 3))
        return sample_from_model(
            pos_coeff, model_fn, cfg.num_timesteps, x_init, kz, cfg.nz
        )

    if scan > 1:
        # serving macro-call: ONE dispatch runs `scan` reverse-diffusion
        # batches under lax.scan — r5 profiling showed the 256² serving
        # path is DISPATCH-bound through the tunnel (device busy 66.8
        # ms/call vs ~250-315 ms/call wall), so amortizing the per-call
        # host/relay cost over K batches is the structural fix.
        @jax.jit
        def sample_many(key):
            def body(_, k):
                return None, sample(k)

            _, outs = jax.lax.scan(body, None, jax.random.split(key, scan))
            return outs

        run, per_call = sample_many, batch * scan
    else:
        run, per_call = sample, batch

    # keys pre-split OUTSIDE the timed loop: an eager split between calls
    # is a separate tunnel dispatch gating the next sample() launch
    keys = list(jax.random.split(key, n_iters + 1))
    out = run(keys[-1])  # compile
    _ = float(out.reshape(-1)[0])
    t0 = time.perf_counter()
    for k in keys[:n_iters]:
        out = run(k)
    _ = float(out.reshape(-1)[0])
    dt = time.perf_counter() - t0
    return {
        "metric": f"{recipe}_t{cfg.num_timesteps}_sampler_samples_per_sec_per_chip",
        "value": round(per_call * n_iters / dt, 2),
        "unit": "samples/sec/chip",
        "batch_per_call": per_call,
        "ms_per_call": round(dt / n_iters * 1e3, 1),
    }


def build_celeba256_step(
    use_remat: bool = True, batch_size: int = 4, recipe: str = "celeba256"
):
    """Construct the CelebA-HQ-256 or LSUN-Church-256 recipe fused train step.

    Returns (step, state, batch, key, lr_g, lr_d, cfg) — shared by the
    bench below and profile_step.py --which celeba256.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    _cache()
    from ddgan_tpu.config import Config
    from ddgan_tpu.diffusion import DiffusionCoefficients, PosteriorCoefficients
    from ddgan_tpu.parallel import make_mesh, replicate, shard_batch
    from ddgan_tpu.train import create_train_state, make_optimizer, make_train_step
    from ddgan_tpu.train.loop import build_models

    # CelebA-HQ 256 paper recipe (readme.md:50-57) / LSUN Church Outdoor 256
    # (readme.md:39-46: same net, T=4, batch 8/GPU, r1 1.0, ema 0.999,
    # lr_d 1e-4, lr_g 1.6e-4), batch sized for one v5e
    lsun = recipe == "lsun256"
    cfg = Config(
        dataset="lsun" if lsun else "celeba_256",
        image_size=256, num_channels=3,
        num_channels_dae=64, ch_mult=[1, 1, 2, 2, 4, 4], num_res_blocks=2,
        attn_resolutions=[16], nz=100, z_emb_dim=256, n_mlp=3,
        t_emb_dim=256, ngf=64,
        num_timesteps=4 if lsun else 2, batch_size=batch_size,
        r1_gamma=1.0 if lsun else 2.0, lazy_reg=10, ema_decay=0.999,
        dropout=0.0, disc_small="no", compute_dtype="bfloat16",
        **({"lr_d": 1e-4, "lr_g": 1.6e-4} if lsun else {}),
    )
    cfg.use_remat = use_remat  # not a schema key; NCSNpp.from_config getattr's it
    gen, disc = build_models(cfg)
    coeff = DiffusionCoefficients.create(cfg.num_timesteps, cfg.beta_min, cfg.beta_max)
    pos_coeff = PosteriorCoefficients.create(cfg.num_timesteps, cfg.beta_min, cfg.beta_max)
    tx_d = make_optimizer(cfg.beta1_d, cfg.beta2_d, cfg.weight_decay_D, cfg.grad_clip_norm)
    tx_g = make_optimizer(cfg.beta1_g, cfg.beta2_g, cfg.weight_decay_G, cfg.grad_clip_norm)
    mesh = make_mesh()
    n_dev = len(jax.devices())

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
    rng = np.random.RandomState(0)
    batch = shard_batch(
        mesh,
        jnp.asarray(
            rng.uniform(
                -1, 1,
                (cfg.batch_size * n_dev, cfg.image_size, cfg.image_size, cfg.num_channels),
            ).astype(np.float32)
        ),
    )
    lr_g = jnp.asarray(cfg.lr_g, jnp.float32)
    lr_d = jnp.asarray(cfg.lr_d, jnp.float32)
    return step, state, batch, key, lr_g, lr_d, cfg


def bench_celeba256(
    n_steps: int = 10, use_remat: bool = True, batch_size: int = 4,
    recipe: str = "celeba256",
) -> dict:
    import jax

    step, state, batch, key, lr_g, lr_d, cfg = build_celeba256_step(
        use_remat, batch_size, recipe
    )
    n_dev = len(jax.devices())

    for _ in range(2):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k, lr_g, lr_d)
    _ = float(metrics.errD)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k, lr_g, lr_d)
    _ = float(metrics.errD)
    dt = time.perf_counter() - t0
    ms = dt / n_steps * 1e3
    return {
        "metric": (
            "lsun256_t4_train_ms_per_step" if recipe == "lsun256"
            else "celeba256_t2_train_ms_per_step"
        )
        + ("" if use_remat else "_noremat"),
        "value": round(ms, 1),
        "unit": "ms/step",
        "samples_per_sec_per_chip": round(cfg.batch_size * n_steps / dt, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "which",
        choices=["sampler", "sampler256", "sampler256-lsun",
                 "celeba256", "celeba256-noremat", "lsun256"],
    )
    ap.add_argument("--batch", type=int, default=0,
                    help="per-chip batch (sampler default 256; sampler256 "
                         "default 16; celeba256 default 4, the recipe's "
                         "per-GPU batch; lsun256 default 8, its per-GPU batch)")
    ap.add_argument("--scan", type=int, default=1,
                    help="sampler256: reverse-diffusion batches per DISPATCH "
                         "(lax.scan macro-call; amortizes the tunnel's "
                         "per-call host cost — see perf/r5_prof_sampler256.txt)")
    ap.add_argument("--iters", type=int, default=0,
                    help="timed calls (sampler256 default 5)")
    args = ap.parse_args()
    if args.which == "sampler":
        out = bench_sampler(batch=args.batch or 256)
        out["batch_per_call"] = args.batch or 256
    elif args.which in ("sampler256", "sampler256-lsun"):
        out = bench_sampler256(
            batch=args.batch or 16,
            n_iters=args.iters or 5,
            recipe="lsun256" if args.which.endswith("lsun") else "celeba256",
            scan=args.scan,
        )
    elif args.which == "lsun256":
        out = bench_celeba256(
            batch_size=args.batch or 8, recipe="lsun256"
        )
        out["batch_per_chip"] = args.batch or 8
    else:
        out = bench_celeba256(
            use_remat=(args.which == "celeba256"), batch_size=args.batch or 4
        )
        out["batch_per_chip"] = args.batch or 4
    print(json.dumps(out))


if __name__ == "__main__":
    main()
