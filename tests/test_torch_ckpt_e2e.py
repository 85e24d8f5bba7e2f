"""End-to-end torch-checkpoint migration: a reference-format content.pth +
netG_{e}.pth written by torch must load through the sampling CLI
(test_ddgan.py protocol: args from content, weights from netG with
module.-prefix stripping) and produce images.
"""

import argparse
import os

import numpy as np
import pytest
import torch

from torch_ref import install_reference

install_reference()

from score_sde.models.ncsnpp_generator_adagn import NCSNpp as TorchNCSNpp  # noqa: E402
from test_model_parity import tiny_gen_args  # noqa: E402


def test_sample_cli_from_torch_checkpoint(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = tiny_gen_args(num_timesteps=2)

    torch.manual_seed(0)
    tm = TorchNCSNpp(args)

    exp_path = tmp_path / "saved_info" / "dd_gan" / "synthetic" / "texp"
    exp_path.mkdir(parents=True)
    # reference content.pth layout (ddgan.py:545-561)
    content = {
        "epoch": 6,
        "global_step": 42,
        "args": {**vars(args), "dataset": "synthetic", "exp": "texp",
                 "num_timesteps": 2, "batch_size": 4, "seed": 7},
        "netG_dict": {"module." + k: v for k, v in tm.state_dict().items()},
        "optimizerG": {}, "netD_dict": {}, "optimizerD": {},
    }
    torch.save(content, exp_path / "content.pth")
    torch.save(
        {"module." + k: v for k, v in tm.state_dict().items()},
        exp_path / "netG_5.pth",
    )

    from ddgan_tpu.cli.test_cli import sample_and_test

    # Spy on the sampler construction: the plain-sampling branch must size
    # the per-device batch to ceil(batch_size / n_dev) instead of sampling
    # batch_size on EVERY device and discarding all but one device's work.
    import ddgan_tpu.diffusion as diffusion_mod

    built = {}
    real_make = diffusion_mod.make_sharded_sampler

    def spy(pos, gen_fn, n_time, shape, nz, mesh, per_device_batch):
        built["per_device_batch"] = per_device_batch
        built["n_dev"] = mesh.size
        return real_make(pos, gen_fn, n_time, shape, nz, mesh,
                         per_device_batch=per_device_batch)

    monkeypatch.setattr(diffusion_mod, "make_sharded_sampler", spy)

    cli_args = argparse.Namespace(
        seed=7, normalize=False, compute_fid=False, epoch_id=5,
        real_img_dir="./real_images", fid_output_path="./fid.txt",
        dataset="synthetic", exp="texp", num_fid_samples=4,
        save_npy=False, generated_samples_dir=".", batch_size=4,
    )
    sample_and_test(cli_args)
    expected_per_dev = max(1, -(-4 // built["n_dev"]))
    assert built["per_device_batch"] == expected_per_dev

    out_dir = tmp_path / "generated_samples" / "synthetic"
    pngs = sorted(out_dir.glob("sample_*.png"))
    assert len(pngs) == 4
    from PIL import Image

    arr = np.asarray(Image.open(pngs[0]))
    assert arr.shape[:2] == (args.image_size, args.image_size)


def test_fid_generation_loop_pipelined(tmp_path, monkeypatch):
    """The --compute_fid generation loop (pipelined in r3: batch k+1
    dispatched before batch k's transfer, PNGs encoded in worker threads)
    must still write EXACTLY num_fid_samples contiguously-indexed files
    and call FID over the generated dir (test_ddgan.py:180-214 protocol)."""
    monkeypatch.chdir(tmp_path)
    args = tiny_gen_args(num_timesteps=2)

    torch.manual_seed(0)
    tm = TorchNCSNpp(args)
    exp_path = tmp_path / "saved_info" / "dd_gan" / "synthetic" / "fexp"
    exp_path.mkdir(parents=True)
    content = {
        "epoch": 6,
        "global_step": 42,
        "args": {**vars(args), "dataset": "synthetic", "exp": "fexp",
                 "num_timesteps": 2, "batch_size": 2, "seed": 7},
        "netG_dict": {"module." + k: v for k, v in tm.state_dict().items()},
        "optimizerG": {}, "netD_dict": {}, "optimizerD": {},
    }
    torch.save(content, exp_path / "content.pth")
    torch.save(
        {"module." + k: v for k, v in tm.state_dict().items()},
        exp_path / "netG_5.pth",
    )

    real_dir = tmp_path / "real_images"
    real_dir.mkdir()
    (real_dir / "0.png").write_bytes(b"")  # existence is all the loop checks

    import ddgan_tpu.eval as eval_mod

    fid_calls = {}

    def fake_fid(paths, batch_size, dims):
        fid_calls["paths"] = paths
        return 123.5

    monkeypatch.setattr(eval_mod, "calculate_fid_given_paths", fake_fid)

    from ddgan_tpu.cli.test_cli import sample_and_test

    # 10 samples, per-call = batch_size(2) * 8 devices = 16 → one call,
    # trimmed; then 26 → two calls, second trimmed to 10.
    for total in (10, 26):
        cli_args = argparse.Namespace(
            seed=7, normalize=False, compute_fid=True, epoch_id=5,
            real_img_dir=str(real_dir), fid_output_path="./fid.txt",
            dataset="synthetic", exp="fexp", num_fid_samples=total,
            save_npy=True, generated_samples_dir=".", batch_size=2,
        )
        fid = sample_and_test(cli_args)
        assert fid == 123.5
        out_dir = tmp_path / "generated_samples" / "synthetic"
        pngs = {p.name for p in out_dir.glob("*.png")}
        npys = {p.name for p in out_dir.glob("*.npy")}
        assert pngs >= {f"{i}.png" for i in range(total)}
        assert npys >= {f"{i}.npy" for i in range(total)}
        assert fid_calls["paths"][0].endswith("generated_samples/synthetic")
        assert open("fid.txt").read().strip() == "123.5"
        import numpy as np_

        arr = np_.load(out_dir / "0.npy")
        assert arr.shape == (args.num_channels, args.image_size, args.image_size)
