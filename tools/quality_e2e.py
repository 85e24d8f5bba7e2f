#!/usr/bin/env python
"""End-to-end sample-quality demonstration at toy scale.

Closes the loop the reference's README describes (train → sample → FID,
/root/reference/test_ddgan.py:180-225) inside this zero-egress environment:

  1. synthesize a structured toy image distribution (colored Gaussian
     blobs over gradient backgrounds, 32x32) into a DatasetCustom-shaped
     train dir + a real-images dir for FID;
  2. train the DDGAN through the real `train_ddgan` CLI for N epochs,
     checkpointing netG every --ckpt-every epochs;
  3. for every saved epoch, run the real `test_ddgan` CLI with
     --compute_fid against the real dir.

Pretrained Inception weights cannot be downloaded here, so FID runs in a
FIXED seeded random-feature space (DDGAN_TPU_INCEPTION_RANDOM=0; see
eval/inception.default_feature_fn). Such scores are not comparable to
published FID, but they are a valid monotonic quality signal for ONE
fixed feature space: as p_gen approaches p_real, the Fréchet distance in
any fixed feature space decreases. The deliverable is the downward trend
across epochs, recorded to quality_e2e.json.

Run:  python tools/quality_e2e.py --root /tmp/ddgan_quality
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


# --------------------------------------------------------------------------
# toy distribution: 1-2 colored gaussian blobs on a smooth gradient background
PALETTE = np.array(
    [
        [0.95, 0.35, 0.25],  # red-orange
        [0.30, 0.75, 0.95],  # sky blue
        [0.45, 0.90, 0.40],  # green
        [0.95, 0.85, 0.30],  # yellow
    ],
    np.float32,
)


def toy_image(rng: np.random.RandomState, size: int = 32) -> np.ndarray:
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / (size - 1)
    base = rng.uniform(0.05, 0.25, size=3).astype(np.float32)
    tilt = rng.uniform(-0.15, 0.15, size=3).astype(np.float32)
    img = base[None, None, :] + yy[:, :, None] * tilt[None, None, :]
    for _ in range(rng.randint(1, 3)):
        color = PALETTE[rng.randint(len(PALETTE))] * rng.uniform(0.8, 1.0)
        cy, cx = rng.uniform(0.25, 0.75, size=2)
        rad = rng.uniform(0.10, 0.22)
        blob = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * rad**2)))
        img = img + blob[:, :, None] * color[None, None, :]
    return np.clip(img, 0.0, 1.0)


def make_dataset(root: Path, n_train: int, n_real: int, size: int, seed: int):
    from PIL import Image

    train_dir = root / "data" / "train" / "0"
    real_dir = root / "real"
    train_dir.mkdir(parents=True, exist_ok=True)
    real_dir.mkdir(parents=True, exist_ok=True)
    for i in range(n_train + n_real):
        rng = np.random.RandomState(seed * 1_000_003 + i)
        arr = (toy_image(rng, size) * 255).astype(np.uint8)
        if i < n_train:
            Image.fromarray(arr).save(train_dir / f"img_{i:05d}.jpg", quality=95)
        else:
            Image.fromarray(arr).save(real_dir / f"img_{i:05d}.png")
    print(f"dataset: {n_train} train jpgs, {n_real} real pngs under {root}")


# --------------------------------------------------------------------------
def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/ddgan_quality")
    ap.add_argument("--n-train", type=int, default=2000)
    ap.add_argument("--n-real", type=int, default=1024)
    ap.add_argument("--image-size", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--ckpt-every", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--nf", type=int, default=32)
    ap.add_argument("--num-timesteps", type=int, default=2)
    ap.add_argument("--fid-samples", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--skip-train", action="store_true",
                    help="reuse existing checkpoints; only run the FID sweep")
    args = ap.parse_args()

    root = Path(args.root)
    root.mkdir(parents=True, exist_ok=True)

    # persistent XLA compile cache: per-epoch eval re-jits identical
    # sampler/inception programs — dedupe them across calls
    os.environ.setdefault("DDGAN_TPU_INCEPTION_RANDOM", "0")
    import jax

    jax.config.update("jax_compilation_cache_dir", str(root / "jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if not (root / "data" / "train" / "0").exists():
        make_dataset(root, args.n_train, args.n_real, args.image_size, args.seed)

    os.chdir(root)  # train/test CLIs write ./saved_info relative to cwd
    exp = "quality_e2e"
    dataset = "custom"

    common = [
        "--dataset", dataset, "--data_dir", str(root / "data"), "--mode", "train",
        "--image_size", str(args.image_size), "--num_channels", "3",
        "--num_channels_dae", str(args.nf), "--ch_mult", "1", "2", "2",
        "--num_res_blocks", "1", "--attn_resolutions", "16",
        "--num_timesteps", str(args.num_timesteps), "--nz", "50",
        "--z_emb_dim", "128", "--t_emb_dim", "128",
        "--batch_size", str(args.batch_size),
        "--exp", exp, "--seed", str(args.seed),
        "--do_resize", "yes", "--to_tensor_transform", "yes",
        "--use_normalize", "yes",
    ]

    if not args.skip_train:
        from ddgan_tpu.cli import train_cli

        t0 = time.time()
        train_cli.main(common + [
            "--num_epoch", str(args.epochs),
            "--lr_g", "1.6e-4", "--lr_d", "1.25e-4",
            "--lazy_reg", "15", "--r1_gamma", "0.2",
            "--use_ema", "--ema_decay", "0.999",
            "--save_content", "--save_ckpt_every", str(args.ckpt_every),
            "--num_workers", "0",
        ])
        print(f"training: {args.epochs} epochs in {time.time() - t0:.1f}s")

    from ddgan_tpu.cli import test_cli

    exp_path = root / "saved_info" / "dd_gan" / dataset / exp
    epochs = sorted(
        int(p.stem.split("_")[1]) for p in exp_path.glob("netG_*.ckpt")
    )
    if not epochs:
        sys.exit(
            f"no netG_*.ckpt checkpoints under {exp_path} — wrong --root, "
            "or training died before the first --ckpt-every boundary"
        )
    results = []
    for e in epochs:
        t0 = time.time()
        fid = test_cli.main([
            "--dataset", dataset, "--exp", exp, "--epoch_id", str(e),
            "--compute_fid", "--real_img_dir", str(root / "real"),
            "--num_fid_samples", str(args.fid_samples),
            "--batch_size", "256", "--seed", str(args.seed),
            "--generated_samples_dir", str(root / f"gen_epoch{e}"),
            "--fid_output_path", str(root / f"fid_epoch{e}.txt"),
        ])
        results.append({"epoch": e, "fid_random_feature": float(fid)})
        print(f"epoch {e}: FID(random-feature) = {fid:.3f}  [{time.time()-t0:.0f}s]")

    # context for the curve: the FID floor (two draws from the TRUE
    # distribution — the train jpgs vs the held-out real pngs)
    from ddgan_tpu.eval import calculate_fid_given_paths

    floor = calculate_fid_given_paths(
        [str(root / "data" / "train" / "0"), str(root / "real")],
        batch_size=50, dims=2048,
    )
    print(f"FID floor (train vs held-out real): {floor:.3f}")

    out = {
        "protocol": "train_ddgan CLI -> test_ddgan --compute_fid CLI",
        "fid_floor_real_vs_train": float(floor),
        "feature_space": "seeded random FID-Inception (DDGAN_TPU_INCEPTION_RANDOM=0)",
        "config": {k: getattr(args, k) for k in vars(args)},
        "results": results,
    }
    with open(root / "quality_e2e.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(results))
    first, last = results[0]["fid_random_feature"], results[-1]["fid_random_feature"]
    print(f"FID trend: {first:.3f} (epoch {results[0]['epoch']}) -> "
          f"{last:.3f} (epoch {results[-1]['epoch']})"
          + ("  [DOWNWARD — quality improving]" if last < first else "  [NOT downward]"))


if __name__ == "__main__":
    main()
