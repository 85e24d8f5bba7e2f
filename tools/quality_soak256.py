#!/usr/bin/env python
"""Flagship-grade 256² quality soak (r4 VERDICT item 2).

QUALITY_256_r04 proved the 256² recipe LEARNS (EMA FID 349→18.4 over 21
epochs) but lacked the two things the 32² soak (QUALITY_r03) proved:
EMA-vs-raw comparisons and SIGKILL+--resume continuity. This runs the
CelebA-HQ-256-shaped recipe (readme.md:48-54 axes: 256², nf 64, ch_mult
1 1 2 2 4 4, T=2, DiscriminatorLarge, bf16, dropout 0.3) with the FULL
round-4 fast-path stack active by default (width-s2d region closure +
stem/head edges, shared-R1 vjp forward, remat-auto) through the REAL
CLIs on the chip, and records:

  * random-feature FID over the EMA generator every --ckpt-every epochs;
  * EMA-vs-raw-G FID at each segment boundary (raw params_G AND the EMA
    tree snapshotted from the same content.ckpt — ema.py:57-80 swap-save
    semantics, netG_{9xxxx}/netG_{8xxxx} naming as in quality_soak.py);
  * one hard mid-run SIGKILL + `--resume`, plus natural segment resumes,
    with losses.json continuity asserted;
  * the FID floor between two disjoint real draws in the same space.

Zero egress ⇒ FID is in a FIXED seeded random-feature Inception space
(valid monotone signal, not comparable to published FID). Writes
QUALITY_256_r05.json at the repo root, incrementally (tunnel-outage and
round-end tolerant). Ref: /root/reference/ema.py:57-80,
/root/reference/test_ddgan.py:180-225.

Run:  python tools/quality_soak256.py --root /tmp/ddgan_soak256
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from quality_e2e import toy_image  # noqa: E402  (sibling tool)
from quality_soak import n_logged_epochs, snapshot_raw_netg  # noqa: E402


def make_jpeg_folder(root: Path, n_train: int, n_real: int, size: int, seed: int):
    from PIL import Image

    train_dir = root / "data" / "train" / "imgs"
    real_dir = root / "real"
    train_dir.mkdir(parents=True, exist_ok=True)
    real_dir.mkdir(parents=True, exist_ok=True)
    for i in range(n_train):
        rng = np.random.RandomState(seed * 7_000_003 + i)
        arr = (toy_image(rng, size) * 255).astype(np.uint8)
        Image.fromarray(arr).save(train_dir / f"img_{i:05d}.jpg", quality=95)
    for i in range(n_real):
        rng = np.random.RandomState(seed * 7_000_003 + n_train + i)
        arr = (toy_image(rng, size) * 255).astype(np.uint8)
        Image.fromarray(arr).save(real_dir / f"img_{i:05d}.png")
    print(f"dataset: {n_train} train jpgs, {n_real} real pngs at {size}²")


def train_cmd(args, num_epoch: int, resume: bool) -> list[str]:
    cmd = [
        sys.executable, str(REPO / "train_ddgan.py"),
        "--dataset", "custom", "--data_dir", "./data", "--mode", "train",
        "--image_size", "256", "--num_channels", "3",
        "--num_channels_dae", str(args.nf),
        "--ch_mult", "1", "1", "2", "2", "4", "4",
        "--num_res_blocks", "2", "--attn_resolutions", "16",
        "--num_timesteps", "2", "--nz", "100",
        "--z_emb_dim", "256", "--n_mlp", "3", "--t_emb_dim", "256",
        "--batch_size", str(args.batch_size),
        "--lr_g", "2e-4", "--lr_d", "1e-4",
        "--beta1_g", "0.5", "--beta2_g", "0.9",
        "--r1_gamma", "2.0", "--lazy_reg", "10",
        "--dropout", "0.3",
        "--disc_small", "no",
        "--use_ema", "--ema_decay", "0.999",
        "--compute_dtype", "bfloat16",
        "--to_tensor_transform", "yes", "--use_normalize", "yes",
        "--exp", args.exp, "--seed", str(args.seed),
        "--save_content", "--save_content_every", str(args.content_every),
        "--save_ckpt_every", str(args.ckpt_every),
        "--num_workers", "2",
        "--num_epoch", str(num_epoch),
    ]
    if resume:
        cmd.append("--resume")
    return cmd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/ddgan_soak256")
    ap.add_argument("--n-train", type=int, default=2048)
    ap.add_argument("--n-real", type=int, default=1024)
    ap.add_argument("--nf", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--segments", type=int, nargs="+", default=[32, 64],
                    help="cumulative num_epoch targets; each boundary is a "
                         "natural resume + raw-G/EMA snapshot pair")
    ap.add_argument("--kill-after-epochs", type=int, default=10,
                    help="hard-SIGKILL the first segment once losses.json "
                         "shows this many epochs, then --resume")
    ap.add_argument("--ckpt-every", type=int, default=8)
    ap.add_argument("--content-every", type=int, default=4)
    ap.add_argument("--resume-first", action="store_true")
    ap.add_argument("--fid-samples", type=int, default=1024)
    ap.add_argument("--fid-batch", type=int, default=64)
    ap.add_argument("--seed", type=int, default=23)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--train-timeout", type=int, default=14400)
    ap.add_argument("--exp", default="soak256")
    ap.add_argument("--out", default="QUALITY_256_r05.json")
    args = ap.parse_args()

    root = Path(args.root)
    root.mkdir(parents=True, exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    env.setdefault("DDGAN_TPU_INCEPTION_RANDOM", "0")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    if not (root / "data" / "train").exists():
        make_jpeg_folder(root, args.n_train, args.n_real, 256, args.seed)

    os.chdir(root)
    exp_path = root / "saved_info" / "dd_gan" / "custom" / args.exp
    events = []

    def run_train(num_epoch, resume, kill_after=None):
        t0 = time.time()
        p = subprocess.Popen(
            train_cmd(args, num_epoch, resume), env=env,
            stdout=open(root / "train_log.txt", "ab"),
            stderr=subprocess.STDOUT, cwd=root,
        )
        if kill_after is not None:
            while p.poll() is None:
                time.sleep(20)
                if n_logged_epochs(exp_path) >= kill_after:
                    p.send_signal(signal.SIGKILL)
                    p.wait()
                    events.append({
                        "event": "hard_kill",
                        "at_logged_epoch": n_logged_epochs(exp_path),
                        "wall_s": round(time.time() - t0, 1),
                    })
                    return "killed"
                if time.time() - t0 > args.train_timeout:
                    p.kill()
                    raise TimeoutError("segment exceeded --train-timeout")
            if p.returncode != 0:
                raise RuntimeError(f"train died rc={p.returncode} before kill point")
            return "completed-early"
        rc = p.wait(timeout=args.train_timeout)
        if rc != 0:
            raise RuntimeError(f"train segment rc={rc}; see {root}/train_log.txt")
        events.append({
            "event": "segment_done", "num_epoch": num_epoch,
            "resume": resume, "wall_s": round(time.time() - t0, 1),
        })
        return "completed"

    raw_snapshots = []
    if not args.skip_train:
        first = args.segments[0]
        if args.resume_first:
            events.append({
                "event": "resume_from_prior_driver_run",
                "at_logged_epoch": n_logged_epochs(exp_path),
            })
        status = run_train(first, resume=args.resume_first,
                           kill_after=args.kill_after_epochs)
        if status == "killed":
            run_train(first, resume=True)  # THE kill+resume evidence
        raw_snapshots.append(snapshot_raw_netg(exp_path))
        for tgt in args.segments[1:]:
            run_train(tgt, resume=True)
            raw_snapshots.append(snapshot_raw_netg(exp_path))

    losses = json.load(open(exp_path / "losses.json"))
    continuity_ok = len(losses) >= args.segments[-1]

    # ---- FID sweeps through the real sampling CLI (in-process)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    os.environ.setdefault("DDGAN_TPU_INCEPTION_RANDOM", "0")
    from ddgan_tpu.cli import test_cli

    real_ref = root / "real_stats.npz"
    if not real_ref.exists():
        from ddgan_tpu.eval import fid as fid_mod

        fid_mod.main(["--save-stats", str(root / "real"), str(real_ref)])

    floor_file = root / "fid_floor.txt"
    if not floor_file.exists():
        from PIL import Image

        from ddgan_tpu.eval.fid import calculate_fid_given_paths

        hold = root / "real_holdout"
        hold.mkdir(exist_ok=True)
        if len(list(hold.glob("*.png"))) < args.fid_samples:
            for i in range(args.fid_samples):
                rng = np.random.RandomState(
                    args.seed * 7_000_003 + args.n_train + args.n_real + i)
                arr = (toy_image(rng, 256) * 255).astype(np.uint8)
                Image.fromarray(arr).save(hold / f"img_{i:05d}.png")
        floor = float(calculate_fid_given_paths(
            [str(hold), str(real_ref)], batch_size=50, dims=2048))
        floor_file.write_text(f"{floor}\n")
    fid_floor = float(floor_file.read_text().strip())

    def fid_of(epoch_id: int) -> float:
        done = root / f"fid_{epoch_id}.txt"
        if done.exists():
            return float(done.read_text().strip())
        gen_dir = root / f"gen_{epoch_id}" / "generated_samples" / "custom"
        if gen_dir.exists() and len(list(gen_dir.glob("*.png"))) >= args.fid_samples:
            from ddgan_tpu.eval.fid import calculate_fid_given_paths

            fid = float(calculate_fid_given_paths(
                [str(gen_dir), str(real_ref)], batch_size=50, dims=2048))
            done.write_text(f"{fid}\n")
            return fid
        return float(test_cli.main([
            "--dataset", "custom", "--exp", args.exp, "--epoch_id", str(epoch_id),
            "--compute_fid", "--real_img_dir", str(real_ref),
            "--num_fid_samples", str(args.fid_samples),
            "--batch_size", str(args.fid_batch), "--seed", str(args.seed),
            "--generated_samples_dir", str(root / f"gen_{epoch_id}"),
            "--fid_output_path", str(root / f"fid_{epoch_id}.txt"),
        ]))

    disk_raw = sorted(
        int(p.stem.split("_")[1]) - 90000
        for p in exp_path.glob("netG_9????.ckpt")
        if int(p.stem.split("_")[1]) >= 90000
    )
    raw_snapshots = sorted(set(raw_snapshots) | set(disk_raw))

    ema_curve = []
    ema_vs_raw = []

    def write_artifact(complete: bool):
        out = {
            "recipe": "CelebA-HQ-256 axes: 256², nf=64, ch_mult 1 1 2 2 4 4, "
                      "blocks 2, T=2, batch 8, DiscriminatorLarge, bf16, "
                      "dropout 0.3 (readme.md:48-54) on 1 chip — region "
                      "closure + shared-R1 + remat-auto active (the defaults)",
            "dataset": f"{args.n_train} toy 256² jpgs via DatasetCustom",
            "feature_space": "seeded random FID-Inception "
                             "(DDGAN_TPU_INCEPTION_RANDOM=0)",
            "backend_note": os.environ.get("DDGAN_TPU_SWEEP_NOTE", ""),
            "events": events,
            "losses_epochs_logged": len(losses),
            "fid_floor_two_real_draws": fid_floor,
            "resume_continuity_ok": bool(continuity_ok),
            "sweep_complete": bool(complete),
            "ema_fid_curve": sorted(ema_curve, key=lambda r: r["epoch"]),
            "ema_vs_raw": ema_vs_raw,
            "config": {k: getattr(args, k) for k in vars(args)},
        }
        tmp = REPO / (args.out + ".tmp")
        with open(tmp, "w") as f:
            json.dump(out, f, indent=2)
        tmp.replace(REPO / args.out)
        return out

    # boundaries FIRST (raw-vs-EMA is the headline evidence), then the EMA
    # curve late-to-early so interruption keeps the informative points
    for e in raw_snapshots:
        raw_fid = fid_of(90000 + e)
        if (exp_path / f"netG_{80000 + e}.ckpt").exists():
            ema_fid = fid_of(80000 + e)
        else:
            ema_fid = next(
                (r["fid_ema"] for r in ema_curve if r["epoch"] == e), None
            )
        ema_vs_raw.append({"epoch": e, "fid_raw": raw_fid, "fid_ema": ema_fid})
        print(f"epoch {e}: raw {raw_fid:.3f} vs EMA {ema_fid}", flush=True)
        write_artifact(False)

    curve_epochs = sorted(
        (
            int(p.stem.split("_")[1])
            for p in exp_path.glob("netG_*.ckpt")
            if int(p.stem.split("_")[1]) < 80000
        ),
        key=lambda e: (not (root / f"fid_{e}.txt").exists(), -e),
    )
    for e in curve_epochs:
        t0 = time.time()
        fid = fid_of(e)
        ema_curve.append({"epoch": e, "fid_ema": fid})
        print(f"epoch {e}: FID(EMA, random-feature) = {fid:.3f} "
              f"[{time.time() - t0:.0f}s]", flush=True)
        write_artifact(False)

    out = write_artifact(True)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
