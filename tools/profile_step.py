#!/usr/bin/env python
"""Capture an xprof trace of the flagship train step and extract per-op stats.

VERDICT r1 item 5: the round-1 roofline (102.7 TFLOP/s, ~856 GB/s) came from
XLA cost analysis, not a profile. This tool produces the real evidence:

  1. builds the paper-recipe fused train step (bench.build_flagship_step),
  2. records `jax.profiler.trace` over 15 steps (one full lazy-R1 period),
  3. converts the .xplane.pb with the xprof/tensorboard-plugin-profile
     converters into op_profile + framework op stats,
  4. writes raw JSON next to the trace and prints the top self-time ops.

Run:  python tools/profile_step.py --logdir /tmp/ddgan_prof
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def capture(logdir: str, n_steps: int = 15) -> None:
    import jax
    from bench import build_flagship_step

    step, state, batch, key, lr_g, lr_d, cfg, mesh, n_dev = build_flagship_step()
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


def find_xplanes(logdir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(logdir, "plugins/profile/*/*.xplane.pb")))


def convert(logdir: str) -> dict[str, str]:
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    xplanes = find_xplanes(logdir)
    if not xplanes:
        raise FileNotFoundError(f"no .xplane.pb under {logdir}")
    out: dict[str, str] = {}
    for tool in ("op_profile", "framework_op_stats", "tensorflow_stats"):
        try:
            data, _ctype = raw_to_tool_data.xspace_to_tool_data(
                xplanes, tool + "^", {}
            )
            if isinstance(data, bytes):
                data = data.decode("utf-8", "replace")
            path = os.path.join(logdir, f"{tool}.json")
            with open(path, "w") as f:
                f.write(data)
            out[tool] = path
            print(f"{tool}: {path} ({len(data)} bytes)")
        except Exception as e:  # tool sets differ across plugin versions
            print(f"{tool}: unavailable ({type(e).__name__}: {e})")
    return out


def summarize_op_profile(path: str, top: int = 25) -> None:
    with open(path) as f:
        prof = json.load(f)

    leaves = []

    def walk(node, depth=0):
        children = node.get("children") or []
        m = node.get("metrics") or {}
        if not children and m:
            leaves.append((node.get("name", "?"), m))
        for c in children:
            walk(c, depth + 1)

    root = prof.get("byCategory") or prof.get("byProgram") or prof
    walk(root)
    leaves.sort(key=lambda x: -(x[1].get("rawTime") or x[1].get("time") or 0))
    print(f"\ntop {top} ops by self time:")
    for name, m in leaves[:top]:
        t = m.get("rawTime") or m.get("time") or 0
        flops = m.get("rawFlops") or 0
        bytes_ = m.get("rawBytesAccessed") or 0
        print(f"  {t:>14} ps  flops={flops:>14}  bytes={bytes_:>12}  {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/ddgan_prof")
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--convert-only", action="store_true")
    args = ap.parse_args()

    if not args.convert_only:
        capture(args.logdir, args.steps)
    paths = convert(args.logdir)
    if "op_profile" in paths:
        try:
            summarize_op_profile(paths["op_profile"])
        except Exception as e:
            print(f"summary failed ({e}); inspect the raw JSON")


if __name__ == "__main__":
    main()
