"""Sampling + FID evaluation CLI — the reference test_ddgan.py.

Protocol parity (test_ddgan.py:128-250):
  * recover training args from the experiment's saved content (ours:
    content_args.json; torch: content.pth via compat), overridden by CLI;
  * load netG_{epoch_id} (ours .ckpt msgpack, or reference .pth with
    `module.` stripping via the compat importer);
  * batched generation of num_fid_samples with the T-step lax.scan
    sampler, fresh z per step; PNGs (+ optional NPY) to
    generated_samples/{dataset};
  * optional FID vs real_img_dir written to fid_output_path.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="DDGAN Testing Parameters")
    p.add_argument("--seed", type=int, default=1024)
    p.add_argument("--normalize", default=False)
    p.add_argument("--compute_fid", action="store_true")
    p.add_argument("--epoch_id", type=int, default=109)
    p.add_argument("--real_img_dir", default="./real_images")
    p.add_argument("--fid_output_path", default="./fid_score.txt")
    p.add_argument("--dataset", default="luna16")
    p.add_argument("--exp", default="exp1")
    p.add_argument("--num_fid_samples", type=int, default=5000)
    p.add_argument("--save_npy", action="store_true")
    p.add_argument("--generated_samples_dir", type=str, default=".")
    p.add_argument("--batch_size", type=int, default=None)
    return p


def sample_and_test(args):
    import jax
    import jax.numpy as jnp
    from functools import partial

    from ..config import Config
    from ..diffusion import PosteriorCoefficients, make_sharded_sampler
    from ..models import NCSNpp
    from ..parallel import make_mesh
    from ..train import checkpoint as ckpt
    from ..utils import save_image, to_range_0_1

    exp_path = Path(f"./saved_info/dd_gan/{args.dataset}/{args.exp}")

    # ---- recover training args (ours, or a torch content.pth)
    if (exp_path / "content_args.json").exists():
        saved = ckpt.load_content_args(exp_path)
    elif (exp_path / "content.pth").exists():
        from ..compat import load_torch_content

        saved = dict(load_torch_content(str(exp_path / "content.pth"))["args"])
    else:
        raise FileNotFoundError(f"No training content found under {exp_path}")
    saved.update({k: v for k, v in vars(args).items() if v is not None})
    cfg = Config.from_dict(saved)

    gen = NCSNpp.from_config(cfg)
    key = jax.random.PRNGKey(int(args.seed))
    kinit, key = jax.random.split(key)
    template = gen.init(
        {"params": kinit, "dropout": kinit},
        jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.num_channels)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, cfg.nz)),
    )

    # ---- load generator weights (ours or torch)
    our_path = exp_path / f"netG_{args.epoch_id}.ckpt"
    torch_path = exp_path / f"netG_{args.epoch_id}.pth"
    if our_path.exists():
        payload = ckpt.load_netg(our_path)
        params, buffers = payload["params"], payload.get("buffers", {})
    elif torch_path.exists():
        from ..compat import load_torch_netg

        params, buffers = load_torch_netg(
            str(torch_path), template["params"], template.get("buffers")
        )
    else:
        raise FileNotFoundError(f"Checkpoint netG_{args.epoch_id} not found in {exp_path}")

    variables = {"params": params}
    if buffers:
        variables["buffers"] = buffers

    pos_coeff = PosteriorCoefficients.create(
        cfg.num_timesteps, cfg.beta_min, cfg.beta_max, cfg.use_geometric
    )

    @partial(jax.jit, static_argnums=())
    def generator(x, t, z):
        return gen.apply(variables, x, t, z, train=False)

    # batch_size is PER DEVICE (same semantics as training); generation is
    # sharded over the same 1-D data mesh as the train step, so the FID set
    # scales linearly with chips (single-process gathers to host for PNGs)
    batch_size = int(args.batch_size or cfg.batch_size)
    mesh = make_mesh()
    n_dev = mesh.size
    # FID sets want throughput: batch_size PER DEVICE, output scales with
    # chips. The plain-sampling branch wants exactly batch_size images, so
    # size the per-device batch down instead of sampling n_dev× and
    # discarding all but one device's work.
    per_device_batch = (
        batch_size if args.compute_fid else max(1, -(-batch_size // n_dev))
    )
    sampler = make_sharded_sampler(
        pos_coeff, generator, cfg.num_timesteps,
        (cfg.image_size, cfg.image_size, cfg.num_channels), cfg.nz,
        mesh, per_device_batch=per_device_batch,
    )

    def generate(key):
        """One sharded call → (per_device_batch * n_dev, H, W, C) on host."""
        key, ks = jax.random.split(key)
        out = sampler(ks)
        return np.asarray(to_range_0_1(out)), key

    save_dir = Path(args.generated_samples_dir) / "generated_samples" / str(args.dataset)
    save_dir.mkdir(parents=True, exist_ok=True)

    if args.compute_fid:
        if not os.path.exists(args.real_img_dir):
            raise FileNotFoundError(f"Real image directory {args.real_img_dir} not found.")
        from concurrent.futures import ThreadPoolExecutor

        total = int(args.num_fid_samples)
        per_call = batch_size * n_dev
        iters_needed = (total + per_call - 1) // per_call

        # Pipelined generation (r2 VERDICT item 4): batch k+1 is DISPATCHED
        # before batch k's device→host transfer, so the device never idles
        # behind the relay round-trip; PNG/NPY encoding runs in worker
        # threads off the dispatch path (PIL's zlib drops the GIL). The
        # reference loop (test_ddgan.py:180-208) is fully serial.
        def encode_batch(host_arr: np.ndarray, index0: int) -> None:
            for j, x in enumerate(host_arr):
                if args.save_npy:
                    np.save(save_dir / f"{index0 + j}.npy", x.transpose(2, 0, 1))
                save_image(
                    x, save_dir / f"{index0 + j}.png", normalize=bool(args.normalize)
                )

        from collections import deque

        pool = ThreadPoolExecutor(max_workers=2)
        encode_futs: deque = deque()

        def submit_encode(batch):
            # Backpressure: each queued future pins a full host batch, so
            # bound the outstanding window instead of letting generation
            # outrun the 2 encode workers (OOM at 50k × 256² otherwise).
            while len(encode_futs) >= 4:
                encode_futs.popleft().result()  # propagate encode errors
            dev, n_p, idx0 = batch
            encode_futs.append(pool.submit(encode_batch, np.asarray(dev)[:n_p], idx0))

        # Keys pre-split OUTSIDE the dispatch loop: an eager per-batch
        # jax.random.split serializes a tunnel round-trip into EVERY
        # sampler call — measured 51-64 samples/s at 256² batch 16 vs
        # 230 with keys pre-split (the device itself runs the call in
        # 66.8 ms = 240/s; perf/r5_prof_sampler256.txt). The split and
        # the per-key slices all dispatch up front, so sampler calls
        # then stream back-to-back.
        batch_keys = list(jax.random.split(key, iters_needed))

        try:
            pending = None  # (device_array, n_keep, index0) of the in-flight batch
            index = 0
            for i in range(iters_needed):
                n = min(per_call, total - i * per_call)
                cur = to_range_0_1(sampler(batch_keys[i]))  # async dispatch
                if pending is not None:
                    submit_encode(pending)
                pending = (cur, n, index)
                index += n
                if (i + 1) % max(1, iters_needed // 2) == 0:
                    print(f"Generated {index}/{total} samples for {args.exp}")
            if pending is not None:
                submit_encode(pending)
            for f in encode_futs:
                f.result()  # propagate encode errors
        finally:
            # Stop encode workers deterministically even when a worker or
            # the dispatch loop raises — no threads keep writing PNGs
            # after the exception surfaces.
            pool.shutdown(wait=True, cancel_futures=True)

        from ..eval import calculate_fid_given_paths

        fid = calculate_fid_given_paths([str(save_dir), args.real_img_dir],
                                        batch_size=50, dims=2048)
        print(f"FID = {fid}")
        if args.fid_output_path:
            out_dir = os.path.dirname(args.fid_output_path)
            if out_dir:
                os.makedirs(out_dir, exist_ok=True)
            with open(args.fid_output_path, "w") as f:
                f.write(f"{fid}\n")
            print(f"FID score saved to {args.fid_output_path}")
        return fid
    else:
        fake, key = generate(key)
        fake = fake[:batch_size]  # one per-device batch of samples, as before
        if args.save_npy:
            np.save("file.npy", fake.transpose(0, 3, 1, 2))
            print("file.npy")
        else:
            for i, x in enumerate(fake):
                save_image(
                    x, save_dir / f"sample_{i}.png", normalize=bool(args.normalize)
                )
            print(f"Sample images saved to {save_dir}")
        return None


def main(argv=None):
    from .._platform import apply_force_platform

    apply_force_platform()
    args = build_parser().parse_args(argv)
    return sample_and_test(args)


def entry() -> int:
    """Console-script wrapper: main() returns the FID (a float) for
    programmatic callers; exit codes must stay 0-on-success."""
    main()
    return 0


if __name__ == "__main__":
    main()
