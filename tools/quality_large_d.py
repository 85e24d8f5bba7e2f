#!/usr/bin/env python
"""DiscriminatorLarge end-to-end train→sample→FID at 64² (r3 VERDICT item 6).

The 256² recipes (readme.md:39-54) use `disc_small=no` + ch_mult
1 1 2 2 4 4; that path had only ever been step-benched. This drives the
REAL CLIs — train_ddgan.py with the large-D config at reduced scale
(64², nf 64, T=2) on a toy JPEG folder through DatasetCustom (the
`custom` dataset path, custom.py:426-459), then the sampling CLI for a
random-feature FID sweep over the EMA checkpoints — proving the
DiscriminatorLarge training loop actually LEARNS (FID descends), not
just that its step compiles.

Zero egress ⇒ FID is the Fréchet distance in a FIXED seeded
random-feature Inception space (valid monotone signal, not comparable
to published FID). Writes QUALITY_LARGED_r04.json at the repo root.

Run:  python tools/quality_large_d.py --root /tmp/ddgan_larged
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from quality_e2e import toy_image  # noqa: E402  (sibling tool)


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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/ddgan_larged")
    ap.add_argument("--n-train", type=int, default=4096)
    ap.add_argument("--n-real", type=int, default=1024)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--nf", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--num-epoch", type=int, default=40)
    ap.add_argument("--ckpt-every", type=int, default=10)
    ap.add_argument("--fid-samples", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--train-timeout", type=int, default=10800)
    ap.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                    help="force the backend (DDGAN_TPU_FORCE_PLATFORM hook) "
                         "for both the train subprocess and the FID sweep — "
                         "cpu keeps the evidence producible during TPU "
                         "tunnel outages (note it in the artifact)")
    ap.add_argument("--out", default="QUALITY_LARGED_r04.json",
                    help="artifact filename at the repo root (use a distinct "
                         "name for non-default --size runs, e.g. "
                         "QUALITY_256_r04.json for the full-resolution recipe)")
    ap.add_argument("--exp", default="larged",
                    help="experiment name under saved_info/dd_gan/custom/")
    args = ap.parse_args()

    if args.platform:
        os.environ["DDGAN_TPU_FORCE_PLATFORM"] = args.platform
        from ddgan_tpu._platform import apply_force_platform

        apply_force_platform()

    root = Path(args.root)
    root.mkdir(parents=True, exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    env.setdefault("DDGAN_TPU_INCEPTION_RANDOM", "0")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

    if not (root / "data" / "train").exists():
        make_jpeg_folder(root, args.n_train, args.n_real, args.size, args.seed)

    os.chdir(root)
    exp_path = root / "saved_info" / "dd_gan" / "custom" / args.exp

    if not args.skip_train:
        cmd = [
            sys.executable, str(REPO / "train_ddgan.py"),
            "--dataset", "custom", "--data_dir", "./data", "--mode", "train",
            "--image_size", str(args.size), "--num_channels", "3",
            "--num_channels_dae", str(args.nf),
            "--ch_mult", "1", "1", "2", "2", "4", "4",
            "--num_res_blocks", "2", "--attn_resolutions", "16",
            "--num_timesteps", "2", "--nz", "100",
            "--z_emb_dim", "256", "--n_mlp", "4", "--t_emb_dim", "256",
            "--batch_size", str(args.batch_size),
            "--lr_g", "1.6e-4", "--lr_d", "1e-4",
            "--beta1_g", "0.5", "--beta2_g", "0.9",
            "--r1_gamma", "1.0", "--lazy_reg", "10",
            "--disc_small", "no",
            "--use_ema", "--ema_decay", "0.999",
            "--compute_dtype", "bfloat16",
            "--to_tensor_transform", "yes", "--use_normalize", "yes",
            "--exp", args.exp, "--seed", str(args.seed),
            "--save_content", "--save_content_every", "10",
            "--save_ckpt_every", str(args.ckpt_every),
            "--num_workers", "2",
            "--num_epoch", str(args.num_epoch),
        ]
        t0 = time.time()
        rc = subprocess.run(
            cmd, env=env, cwd=root,
            stdout=open(root / "train_log.txt", "ab"),
            stderr=subprocess.STDOUT, timeout=args.train_timeout,
        ).returncode
        if rc != 0:
            raise RuntimeError(f"train rc={rc}; see {root}/train_log.txt")
        train_wall = round(time.time() - t0, 1)
    else:
        train_wall = None

    losses = json.load(open(exp_path / "losses.json"))

    # ---- FID sweep through the real sampling CLI (in-process)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    os.environ.setdefault("DDGAN_TPU_INCEPTION_RANDOM", "0")
    from ddgan_tpu.cli import test_cli

    # floor: FID between a held-out real draw and the real dir, same
    # feature space — the best reachable score (finite-sample noise incl.)
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
                arr = (toy_image(rng, args.size) * 255).astype(np.uint8)
                Image.fromarray(arr).save(hold / f"img_{i:05d}.png")
        floor = float(calculate_fid_given_paths(
            [str(hold), str(root / "real")], batch_size=50, dims=2048))
        floor_file.write_text(f"{floor}\n")
    fid_floor = float(floor_file.read_text().strip())

    curve = []
    ckpts = sorted(
        (int(p.stem.split("_")[1]) for p in exp_path.glob("netG_*.ckpt")),
    )
    for e in ckpts:
        t0 = time.time()
        done = root / f"fid_{e}.txt"
        if done.exists():  # resumable sweep (tunnel-outage tolerant)
            curve.append({"epoch": e, "fid_ema": float(done.read_text().strip())})
            continue
        fid = float(test_cli.main([
            "--dataset", "custom", "--exp", args.exp, "--epoch_id", str(e),
            "--compute_fid", "--real_img_dir", str(root / "real"),
            "--num_fid_samples", str(args.fid_samples),
            "--batch_size", "128", "--seed", str(args.seed),
            "--generated_samples_dir", str(root / f"gen_{e}"),
            "--fid_output_path", str(root / f"fid_{e}.txt"),
        ]))
        curve.append({"epoch": e, "fid_ema": fid})
        print(f"epoch {e}: FID(EMA, random-feature) = {fid:.3f} "
              f"[{time.time() - t0:.0f}s]", flush=True)

    descending = len(curve) >= 2 and curve[-1]["fid_ema"] < curve[0]["fid_ema"]
    out = {
        "recipe": f"DiscriminatorLarge (disc_small=no), ch_mult 1 1 2 2 4 4, "
                  f"nf={args.nf}, T=2, batch {args.batch_size}, bf16, "
                  f"{args.size}² (the 256² recipes' D/width axes at reduced "
                  "scale, readme.md:39-54)",
        "dataset": f"{args.n_train} toy jpgs via DatasetCustom (custom path)",
        "feature_space": "seeded random FID-Inception "
                         "(DDGAN_TPU_INCEPTION_RANDOM=0)",
        "backend": jax.default_backend(),
        "train_wall_s": train_wall,
        "epochs": len(losses),
        "final_losses": losses[-1],
        "fid_curve_ema": curve,
        "fid_floor_two_real_draws": fid_floor,
        "fid_descending": bool(descending),
        "config": {k: getattr(args, k) for k in vars(args)},
    }
    with open(REPO / args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
