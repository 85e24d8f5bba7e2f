"""Smoke coverage for auxiliary surfaces that had no direct tests:
the loss-log inspector (pso/vali_show), the config-first main CLI wrapper
(cli/main_cli), NIfTI converters (data/converters), and the folder-level
simple metrics (eval/simple_metrics). Reference counterparts:
additionals/vali_show.py, main.py:9-69, the additionals convert helpers
(images.py), additionals/simple_fid_and_incep.py.
"""

import json
import os
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent


def test_vali_show_parses_iteration_log():
    from ddgan_tpu.pso.vali_show import SimpleShow

    log = "\n".join(
        [
            "header line",
            "Epoch 1, Iteration 0, G Loss: 0.5, D Loss: 1.5",
            "Epoch 1, Iteration 1, G Loss: 1.0, D Loss: 2.0",
            "trailing line",
        ]
    )
    s = SimpleShow(log)
    assert s.G == [0.5, 1.0]
    assert s.D == [1.5, 2.0]
    g_mae, g_mse, d_mae, d_mse = s.get_loss()
    assert g_mae == pytest.approx(0.75)
    assert g_mse == pytest.approx((0.25 + 1.0) / 2)
    assert d_mae == pytest.approx(1.75)
    assert d_mse == pytest.approx((2.25 + 4.0) / 2)


def test_main_cli_merges_flags_into_config(tmp_path, monkeypatch):
    """main.py semantics: CLI values are written over configs/config.json
    in place, then training runs from the merged file (reference
    main.py:9-69). Training itself is stubbed — this tests the merge."""
    monkeypatch.chdir(tmp_path)
    import ddgan_tpu.train as train_mod
    from ddgan_tpu.cli import main_cli

    captured = {}
    monkeypatch.setattr(
        train_mod, "train", lambda cfg: captured.update(vars(cfg).copy())
    )

    main_cli.main(["--exp", "merged", "--batch_size", "16", "--num_epoch", "2"])

    with open("configs/config.json") as f:
        merged = json.load(f)
    assert merged["exp"] == "merged"
    assert merged["batch_size"] == 16
    assert merged["num_epoch"] == 2
    assert captured["exp"] == "merged"
    assert captured["batch_size"] == 16


def test_nii_converters_roundtrip(tmp_path):
    from ddgan_tpu.data.nifti import write_nifti
    from ddgan_tpu.data.converters import (
        nii_to_npy_simple,
        nii_to_png_simple,
        npy_to_image,
    )

    vol = (np.random.RandomState(0).rand(8, 8, 6) * 200).astype(np.float32)
    nii = tmp_path / "vol.nii.gz"
    write_nifti(str(nii), vol)

    png_dir = tmp_path / "pngs"
    npy_dir = tmp_path / "npys"
    png_dir.mkdir()
    npy_dir.mkdir()
    nii_to_png_simple(str(nii), "z", 2, save_dir=str(png_dir))
    nii_to_npy_simple(str(nii), "z", 2, save_dir=str(npy_dir))
    pngs = list(png_dir.glob("*.png"))
    npys = list(npy_dir.glob("*.npy"))
    assert pngs and npys
    got = np.load(npys[0])
    np.testing.assert_allclose(got, vol[:, :, 2], rtol=1e-6)

    img_dir = tmp_path / "imgs"
    npy_to_image(str(npy_dir), save_dir=str(img_dir))
    assert list(img_dir.glob("*.png"))


def test_simple_metrics_fid_same_vs_noise(tmp_path, monkeypatch):
    """Folder-level FID wrapper (simple_fid_and_incep.py:48-78 analog)
    discriminates same-dist vs noise in the seeded random-feature space
    (zero-egress fallback)."""
    from PIL import Image

    monkeypatch.setenv("DDGAN_TPU_INCEPTION_RANDOM", "0")
    monkeypatch.delenv("DDGAN_TPU_INCEPTION_PATH", raising=False)
    from ddgan_tpu.eval.simple_metrics import calculate_fid

    rng = np.random.RandomState(0)

    def write_blobs(d, n, noise=False):
        d.mkdir()
        yy, xx = np.mgrid[0:32, 0:32].astype(np.float32) / 31.0
        for i in range(n):
            if noise:
                img = rng.rand(32, 32, 3)
            else:
                cy, cx = rng.uniform(0.3, 0.7, size=2)
                g = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / 0.02))
                img = np.stack([g] * 3, -1)
            Image.fromarray((img * 255).astype(np.uint8)).save(d / f"{i}.png")

    a, b, c = tmp_path / "a", tmp_path / "b", tmp_path / "c"
    write_blobs(a, 16)
    write_blobs(b, 16)
    write_blobs(c, 16, noise=True)

    same = calculate_fid(str(a), str(b), batch_size=8)
    diff = calculate_fid(str(a), str(c), batch_size=8)
    assert np.isfinite(same) and np.isfinite(diff)
    assert diff > same


def test_quality_soak_snapshots_raw_and_ema(tmp_path):
    """The soak's EMA-vs-raw FID evidence hinges on snapshot_raw_netg
    writing BOTH trees out of the same content.ckpt with matching epoch
    labels (segment boundaries never land on save_ckpt_every multiples,
    so the regular netG_e.ckpt curve can't supply the EMA side)."""
    import sys as _sys

    _sys.path.insert(0, str(REPO / "tools"))
    from flax import serialization

    from quality_soak import snapshot_raw_netg

    raw = {"w": np.full((3,), 2.0, np.float32)}
    ema = {"w": np.full((3,), 5.0, np.float32)}
    content = {
        "epoch": np.asarray(13, np.int32),  # resume epoch = loop epoch 12
        "params_G": raw,
        "ema_G": ema,
        "buffers_G": {},
    }
    with open(tmp_path / "content.ckpt", "wb") as f:
        f.write(serialization.msgpack_serialize(content))

    e = snapshot_raw_netg(tmp_path)
    assert e == 12

    from ddgan_tpu.train.checkpoint import load_netg

    got_raw = load_netg(tmp_path / "netG_90012.ckpt")["params"]
    got_ema = load_netg(tmp_path / "netG_80012.ckpt")["params"]
    np.testing.assert_array_equal(got_raw["w"], raw["w"])
    np.testing.assert_array_equal(got_ema["w"], ema["w"])


@pytest.mark.skipif(
    os.environ.get("DDGAN_TPU_MULTIHOST") != "1",
    reason="launches 2 jax.distributed processes (serialize with the "
    "one-core rule); set DDGAN_TPU_MULTIHOST=1 to run — or use "
    "`python tools/multihost_dryrun.py` (evidence: MULTIHOST_r05.json)",
)
def test_multihost_two_process_dryrun():
    """Real multi-process execution: rendezvous via init_processes, loader
    shard partition, make_array_from_process_local_data assembly,
    cross-process pmean + sampler equality vs single-process same-size
    meshes (2x1 and 2x2 topologies), loader-failure regression."""
    import subprocess
    import sys as _sys

    out = str(REPO / "MULTIHOST_r05.json")
    subprocess.run(
        [_sys.executable, str(REPO / "tools" / "multihost_dryrun.py"),
         "--out", out],
        check=True, timeout=1800,
    )
    with open(out) as f:
        assert json.load(f)["ok"] is True
