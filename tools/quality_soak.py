#!/usr/bin/env python
"""Flagship-width quality soak (r2 VERDICT item 2).

Trains the paper's CIFAR-10 recipe WIDTH (nf=128, ch_mult 1 2 2 2,
num_res_blocks 2, T=4, batch 64, bf16 — /root/reference/readme.md:29-36)
for hundreds of epochs on a ≥20k-image 32² toy distribution written in
CIFAR-10 pickle format (so the real `--dataset cifar10` reader path is
exercised), through the REAL CLIs on the chip, and records:

  * random-feature FID every --ckpt-every epochs over the EMA generator
    (netG_*.ckpt IS the EMA tree — ema.py swap-save semantics);
  * EMA-vs-raw-G FID at each segment boundary (raw params recovered from
    content.ckpt, written as netG_{9xxxx}.ckpt, scored through the same
    sampling CLI) — proving the EMA actually helps (ema.py:57-80);
  * one hard mid-run SIGKILL + `--resume` continuation, plus natural
    segment resumes, with losses.json continuity asserted.

Zero egress ⇒ FID is the Fréchet distance in a FIXED seeded
random-feature Inception space (valid monotone quality signal; not
comparable to published FID). Writes QUALITY_r03.json at the repo root.

Run:  python tools/quality_soak.py --root /tmp/ddgan_soak
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
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


def make_cifar_pickles(root: Path, n_train: int, n_real: int, seed: int):
    from PIL import Image

    base = root / "data" / "cifar-10-batches-py"
    real_dir = root / "real"
    base.mkdir(parents=True, exist_ok=True)
    real_dir.mkdir(parents=True, exist_ok=True)

    per_batch = -(-n_train // 5)
    idx = 0
    for b in range(1, 6):
        n = min(per_batch, n_train - (b - 1) * per_batch)
        data = np.empty((n, 3 * 32 * 32), np.uint8)
        for j in range(n):
            rng = np.random.RandomState(seed * 1_000_003 + idx)
            arr = (toy_image(rng, 32) * 255).astype(np.uint8)
            data[j] = arr.transpose(2, 0, 1).reshape(-1)  # CHW flat, CIFAR layout
            idx += 1
        with open(base / f"data_batch_{b}", "wb") as f:
            pickle.dump({b"data": data, b"labels": [0] * n}, f)
    for i in range(n_real):
        rng = np.random.RandomState(seed * 1_000_003 + n_train + i)
        arr = (toy_image(rng, 32) * 255).astype(np.uint8)
        Image.fromarray(arr).save(real_dir / f"img_{i:05d}.png")
    print(f"dataset: {n_train} train imgs (cifar pickle), {n_real} real pngs")


def train_cmd(args, num_epoch: int, resume: bool) -> list[str]:
    cmd = [
        sys.executable, str(REPO / "train_ddgan.py"),
        "--dataset", "cifar10", "--data_dir", "./data", "--mode", "train",
        "--image_size", "32", "--num_channels", "3",
        "--num_channels_dae", str(args.nf), "--ch_mult", "1", "2", "2", "2",
        "--num_res_blocks", "2", "--attn_resolutions", "16",
        "--num_timesteps", "4", "--nz", "100",
        "--z_emb_dim", "256", "--n_mlp", "4", "--t_emb_dim", "256",
        "--batch_size", str(args.batch_size),
        "--lr_g", "1.6e-4", "--lr_d", "1.25e-4",
        "--beta1_g", "0.5", "--beta2_g", "0.9",
        "--r1_gamma", "0.02", "--lazy_reg", "15",
        "--use_ema", "--ema_decay", "0.9999",
        "--compute_dtype", "bfloat16",
        "--to_tensor_transform", "yes", "--use_normalize", "yes",
        "--exp", "soak", "--seed", str(args.seed),
        "--save_content", "--save_content_every", str(args.content_every),
        "--save_ckpt_every", str(args.ckpt_every),
        "--num_workers", "2",
        "--num_epoch", str(num_epoch),
    ]
    if resume:
        cmd.append("--resume")
    return cmd


def n_logged_epochs(exp_path: Path) -> int:
    f = exp_path / "losses.json"
    if not f.exists():
        return 0
    try:
        return len(json.load(open(f)))
    except Exception:
        return 0


def snapshot_raw_netg(exp_path: Path) -> int:
    """content.ckpt's RAW params_G → netG_{90000+e}.ckpt AND its EMA tree
    → netG_{80000+e}.ckpt; returns e.

    Both trees come from the SAME content.ckpt, so the raw-vs-EMA FID
    comparison is at the identical training epoch (segment boundaries
    don't land on save_ckpt_every multiples, so the regular netG_e.ckpt
    EMA curve has no entry at e). content.ckpt's epoch field is the
    RESUME epoch (the train loop stores loop_epoch+1 before saving —
    loop.py:257 vs :279), so the params correspond to the end of loop
    epoch `field-1`.
    """
    from flax import serialization

    restored = serialization.msgpack_restore(
        open(exp_path / "content.ckpt", "rb").read()
    )
    epoch = int(np.asarray(restored["epoch"])) - 1
    from ddgan_tpu.train.checkpoint import save_netg

    save_netg(exp_path, 90000 + epoch, restored["params_G"],
              restored.get("buffers_G") or None)
    if restored.get("ema_G"):
        save_netg(exp_path, 80000 + epoch, restored["ema_G"],
                  restored.get("buffers_G") or None)
    return epoch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/ddgan_soak")
    ap.add_argument("--n-train", type=int, default=20000)
    ap.add_argument("--n-real", type=int, default=2048)
    ap.add_argument("--nf", type=int, default=128)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--segments", type=int, nargs="+", default=[100, 200, 300],
                    help="cumulative num_epoch targets; each boundary is a "
                         "natural resume + raw-G snapshot")
    ap.add_argument("--kill-after-epochs", type=int, default=12,
                    help="hard-SIGKILL the first segment once losses.json "
                         "shows this many epochs, then --resume")
    ap.add_argument("--ckpt-every", type=int, default=10)
    ap.add_argument("--content-every", type=int, default=5,
                    help="save_content_every for the train CLI (each content "
                         "save costs ~1-3 min of device→host transfer through "
                         "the chip tunnel)")
    ap.add_argument("--resume-first", action="store_true",
                    help="first segment starts with --resume (continue a soak "
                         "whose driver process died); the kill+resume already "
                         "in train_log.txt is recorded as a prior event")
    ap.add_argument("--fid-samples", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--train-timeout", type=int, default=14400)
    args = ap.parse_args()

    root = Path(args.root)
    root.mkdir(parents=True, exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    env.setdefault("DDGAN_TPU_INCEPTION_RANDOM", "0")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    if not (root / "data" / "cifar-10-batches-py").exists():
        make_cifar_pickles(root, args.n_train, args.n_real, args.seed)

    os.chdir(root)
    exp_path = root / "saved_info" / "dd_gan" / "cifar10" / "soak"
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

    # ---- losses.json continuity across kill + resumes
    losses = json.load(open(exp_path / "losses.json"))
    continuity_ok = len(losses) >= args.segments[-1]

    # ---- FID sweeps through the real sampling CLI (in-process)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    os.environ.setdefault("DDGAN_TPU_INCEPTION_RANDOM", "0")
    from ddgan_tpu.cli import test_cli

    # cache the real-set Fréchet stats once: recomputing them per point
    # costs 2x fid_samples inception forwards each time (the bulk of a
    # CPU-fallback point); .npz stats give IDENTICAL FID values (the
    # feature fn and real set are deterministic)
    real_ref = root / "real_stats.npz"
    if not real_ref.exists():
        from ddgan_tpu.eval import fid as fid_mod

        fid_mod.main(["--save-stats", str(root / "real"), str(real_ref)])

    # ---- the floor: FID between a held-out draw of the REAL distribution
    # and the real stats, in the same feature space — the best score any
    # generator could reach (finite-sample noise included); contextualizes
    # the final EMA number (r2's quality evidence carried the same floor)
    floor_file = root / "fid_floor.txt"
    if not floor_file.exists():
        from PIL import Image

        from ddgan_tpu.eval.fid import calculate_fid_given_paths

        hold = root / "real_holdout"
        hold.mkdir(exist_ok=True)
        if len(list(hold.glob("*.png"))) < args.fid_samples:
            for i in range(args.fid_samples):
                rng = np.random.RandomState(
                    args.seed * 1_000_003 + args.n_train + args.n_real + i)
                arr = (toy_image(rng, 32) * 255).astype(np.uint8)
                Image.fromarray(arr).save(hold / f"img_{i:05d}.png")
        floor = float(calculate_fid_given_paths(
            [str(hold), str(real_ref)], batch_size=50, dims=2048))
        floor_file.write_text(f"{floor}\n")
    fid_floor = float(floor_file.read_text().strip())

    def fid_of(epoch_id: int) -> float:
        # resumable: a completed point's fid_{e}.txt is reused, so an
        # interrupted sweep (e.g. a tunnel outage mid-FID) restarts where
        # it stopped instead of redoing ~2 min per point
        done = root / f"fid_{epoch_id}.txt"
        if done.exists():
            return float(done.read_text().strip())
        # sub-point resume: samples already generated → score them directly
        gen_dir = root / f"gen_{epoch_id}" / "generated_samples" / "cifar10"
        if gen_dir.exists() and len(list(gen_dir.glob("*.png"))) >= args.fid_samples:
            from ddgan_tpu.eval.fid import calculate_fid_given_paths

            fid = float(calculate_fid_given_paths(
                [str(gen_dir), str(real_ref)], batch_size=50, dims=2048))
            done.write_text(f"{fid}\n")
            return fid
        return float(test_cli.main([
            "--dataset", "cifar10", "--exp", "soak", "--epoch_id", str(epoch_id),
            "--compute_fid", "--real_img_dir", str(real_ref),
            "--num_fid_samples", str(args.fid_samples),
            "--batch_size", "256", "--seed", str(args.seed),
            "--generated_samples_dir", str(root / f"gen_{epoch_id}"),
            "--fid_output_path", str(root / f"fid_{epoch_id}.txt"),
        ]))

    # discover raw snapshots from disk so --skip-train reruns work too
    disk_raw = sorted(
        int(p.stem.split("_")[1]) - 90000
        for p in exp_path.glob("netG_9????.ckpt")
        if int(p.stem.split("_")[1]) >= 90000
    )
    raw_snapshots = sorted(set(raw_snapshots) | set(disk_raw))

    ema_curve = []
    ema_vs_raw = []

    def write_artifact(complete: bool):
        # incremental: the artifact exists with best-so-far evidence even
        # if the sweep is interrupted (tunnel outage, round end)
        out = {
            "recipe": "flagship width: nf=128, ch_mult 1 2 2 2, blocks 2, T=4, "
                      "batch 64, bf16 (readme.md:29-36) on 1 chip",
            "dataset": f"{args.n_train} toy 32x32 imgs in CIFAR pickle format",
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
        tmp = REPO / "QUALITY_r03.json.tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=2)
        tmp.replace(REPO / "QUALITY_r03.json")
        return out

    # boundaries FIRST (raw-vs-EMA is the headline evidence), then the EMA
    # curve late-to-early — under interruption (tunnel outage / round end)
    # the incremental artifact keeps the most informative points
    for e in raw_snapshots:
        raw_fid = fid_of(90000 + e)
        if (exp_path / f"netG_{80000 + e}.ckpt").exists():
            ema_fid = fid_of(80000 + e)  # EMA tree from the same content.ckpt
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
            if int(p.stem.split("_")[1]) < 80000  # 8/9xxxx are snapshots
        ),
        # cached points first (instant — they land in the artifact even if
        # the sweep is stopped early), then new ones latest-first
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
