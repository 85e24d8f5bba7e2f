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
