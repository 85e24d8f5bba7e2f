#!/usr/bin/env python
"""Capture an xprof trace of the flagship train step and extract per-op stats.

VERDICT r1 item 5: the round-1 roofline (102.7 TFLOP/s, ~856 GB/s) came from
XLA cost analysis, not a profile. This tool produces the real evidence:

  1. builds the paper-recipe fused train step (bench.build_flagship_step),
  2. records `jax.profiler.trace` over 15 steps (one full lazy-R1 period),
  3. parses the trace-viewer JSON (vm.trace.json.gz) directly — the
     tensorboard_plugin_profile converters are broken against this image's
     TF/protobuf, but the trace events already carry `hlo_category`,
     `model_flops`, `raw_bytes_accessed` and `tf_op` provenance,
  4. prints a per-category roofline table and the top source ops by
     self-time and by bytes moved.

Run:  python tools/profile_step.py --logdir /tmp/ddgan_prof
      python tools/profile_step.py --logdir /tmp/ddgan_prof --analyze-only
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def capture(
    logdir: str, n_steps: int = 15, which: str = "flagship", batch: int = 0
) -> None:
    import jax

    if which == "sampler":
        return _capture_sampler(logdir, n_steps)
    if which in ("sampler256", "sampler256-lsun"):
        return _capture_sampler256(
            logdir, n_steps, batch or 16,
            "lsun256" if which.endswith("lsun") else "celeba256",
        )
    if which == "flagship":
        from bench import build_flagship_step

        step, state, batch_, key, lr_g, lr_d, *_ = build_flagship_step()
    else:
        from tools.bench_extra import build_celeba256_step

        step, state, batch_, key, lr_g, lr_d, *_ = build_celeba256_step(
            batch_size=batch or 4
        )
    batch = batch_
    for _ in range(3):  # compile + warm
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k, lr_g, lr_d)
    _ = float(metrics.errD)

    with jax.profiler.trace(logdir):
        for _ in range(n_steps):
            key, k = jax.random.split(key)
            state, metrics = step(state, batch, k, lr_g, lr_d)
        _ = float(metrics.errD)  # value fetch: force completion inside trace
    print(f"trace written under {logdir}")


def _capture_sampler(logdir: str, n_steps: int, batch: int = 256) -> None:
    """Trace the T-step reverse sampler (flagship recipe, batch 256)."""
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _flagship_config
    from ddgan_tpu.diffusion import PosteriorCoefficients, sample_from_model
    from ddgan_tpu.models import NCSNpp

    cfg = _flagship_config()
    gen = NCSNpp.from_config(cfg)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((2, cfg.image_size, cfg.image_size, cfg.num_channels), jnp.float32)
    variables = gen.init(
        {"params": key, "dropout": key}, x0, jnp.zeros((2,), jnp.int32),
        jnp.zeros((2, cfg.nz), jnp.float32),
    )
    pos = PosteriorCoefficients.create(cfg.num_timesteps, cfg.beta_min, cfg.beta_max)

    def model_fn(xt, t, z):
        return gen.apply(variables, xt, t, z, train=False)

    @jax.jit
    def sample(key):
        kx, kz = jax.random.split(key)
        x_init = jax.random.normal(
            kx, (batch, cfg.image_size, cfg.image_size, cfg.num_channels)
        )
        return sample_from_model(pos, model_fn, cfg.num_timesteps, x_init, kz, cfg.nz)

    out = sample(key)
    _ = float(out.reshape(-1)[0])
    with jax.profiler.trace(logdir):
        for _ in range(n_steps):
            key, k = jax.random.split(key)
            out = sample(k)
        _ = float(out.reshape(-1)[0])
    print(f"trace written under {logdir}")


def _capture_sampler256(
    logdir: str, n_steps: int, batch: int, recipe: str
) -> None:
    """Trace the 256² serving path (test_ddgan.py:180-208 analog): the
    T-step reverse sampler at the celeba256/lsun256 recipe, region closure
    per the model default. VERDICT r4 item 3 — the training step got four
    per-op profile passes in round 4; this gives the sampler the same."""
    import jax
    import jax.numpy as jnp
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
    pos = PosteriorCoefficients.create(cfg.num_timesteps, cfg.beta_min, cfg.beta_max)

    def model_fn(xt, t, z):
        return gen.apply(variables, xt, t, z, train=False)

    @jax.jit
    def sample(key):
        kx, kz = jax.random.split(key)
        x_init = jax.random.normal(kx, (batch, 256, 256, 3))
        return sample_from_model(pos, model_fn, cfg.num_timesteps, x_init, kz, cfg.nz)

    out = sample(key)
    _ = float(out.reshape(-1)[0])
    with jax.profiler.trace(logdir):
        for _ in range(n_steps):
            key, k = jax.random.split(key)
            out = sample(k)
        _ = float(out.reshape(-1)[0])
    print(f"trace written under {logdir}")


def load_device_ops(logdir: str):
    """Yield (name, dur_us, args) for every XLA-op event on the TPU device."""
    paths = sorted(glob.glob(os.path.join(logdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {logdir}")
    with gzip.open(paths[-1]) as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    # find the device pid and its 'XLA Ops' line
    dev_pid = None
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in (e["args"].get("name") or ""):
                dev_pid = e["pid"]
    ops_tid = None
    for e in ev:
        if (
            e.get("ph") == "M"
            and e.get("name") == "thread_name"
            and e.get("pid") == dev_pid
            and e["args"].get("name") == "XLA Ops"
        ):
            ops_tid = e["tid"]
    if dev_pid is None or ops_tid is None:
        raise RuntimeError(
            f"no TPU 'XLA Ops' line found in {paths[-1]} — was the trace "
            "captured on the TPU backend? (CPU traces carry no device ops)"
        )
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") == dev_pid and e.get("tid") == ops_tid:
            yield e["name"], e["dur"], e.get("args") or {}


def analyze(logdir: str, steps: int, top: int = 20, dump: str | None = None) -> None:
    cat = collections.defaultdict(lambda: [0.0, 0, 0])  # us, flops, bytes
    prov = collections.defaultdict(lambda: [0.0, 0, 0])
    byop = collections.defaultdict(lambda: [0.0, 0, 0, 0, None])  # +count, args
    total_us = 0.0
    for name, dur, a in load_device_ops(logdir):
        if "hlo_category" not in a:
            continue
        fl = int(a.get("model_flops") or 0)
        by = int(a.get("raw_bytes_accessed") or 0)
        total_us += dur
        for agg, k in ((cat, a["hlo_category"]), (prov, a.get("tf_op", "?"))):
            agg[k][0] += dur
            agg[k][1] += fl
            agg[k][2] += by
        rec = byop[name]
        rec[0] += dur
        rec[1] += fl
        rec[2] += by
        rec[3] += 1
        rec[4] = a

    if dump:
        # full per-HLO-op dump (incl. long_name HLO text) for offline digging
        rows = sorted(byop.items(), key=lambda kv: -kv[1][0])
        with open(dump, "w") as f:
            json.dump(
                [
                    {
                        "name": n,
                        "us_total": r[0],
                        "ms_per_step": r[0] / 1e3 / steps,
                        "flops": r[1],
                        "bytes": r[2],
                        "count": r[3],
                        "args": r[4],
                    }
                    for n, r in rows
                ],
                f, indent=1,
            )
        print(f"per-op dump ({len(rows)} ops) -> {dump}")

    print(f"total device op time: {total_us / 1e3 / steps:.2f} ms/step")
    hdr = f"{'category':<28}{'ms/step':>8}{'%':>6}{'GFLOP/st':>10}{'GB/st':>8}{'TFLOP/s':>9}{'GB/s':>7}"
    print("\n" + hdr)
    for name, (us, fl, by) in sorted(cat.items(), key=lambda kv: -kv[1][0]):
        sec = us / steps * 1e-6
        print(
            f"{name:<28}{us / 1e3 / steps:8.2f}{100 * us / total_us:6.1f}"
            f"{fl / 1e9 / steps:10.2f}{by / 1e9 / steps:8.2f}"
            f"{(fl / steps) / sec / 1e12 if sec else 0:9.1f}"
            f"{(by / steps) / sec / 1e9 if sec else 0:7.0f}"
        )

    for title, keyfn in (
        ("source ops by self time", lambda kv: -kv[1][0]),
        ("source ops by bytes", lambda kv: -kv[1][2]),
    ):
        print(f"\ntop {top} {title}:")
        print(f"{'ms/step':>8}{'%':>6}{'GB/st':>8}{'GB/s':>7}{'TFLOP/s':>9}  op")
        for name, (us, fl, by) in sorted(prov.items(), key=keyfn)[:top]:
            sec = us / steps * 1e-6
            print(
                f"{us / 1e3 / steps:8.2f}{100 * us / total_us:6.1f}"
                f"{by / 1e9 / steps:8.3f}"
                f"{(by / steps) / sec / 1e9 if sec else 0:7.0f}"
                f"{(fl / steps) / sec / 1e12 if sec else 0:9.1f}  {name[:115]}"
            )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/ddgan_prof")
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument(
        "--which",
        choices=["flagship", "celeba256", "sampler", "sampler256", "sampler256-lsun"],
        default="flagship",
    )
    ap.add_argument("--analyze-only", action="store_true")
    ap.add_argument("--batch", type=int, default=0,
                    help="per-chip batch for celeba256 (default 4)")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--dump", default=None,
                    help="write a per-HLO-op JSON (with long_name) here")
    args = ap.parse_args()

    if not args.analyze_only:
        capture(args.logdir, args.steps, args.which, args.batch)
    analyze(args.logdir, args.steps, args.top, args.dump)


if __name__ == "__main__":
    main()
