"""Config schema + CLI merge semantics + checkpoint roundtrip tests."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from ddgan_tpu.config import Config, load_json_to_dict, modify_json_file
from ddgan_tpu.cli.train_cli import build_parser, resolve_config


def test_config_roundtrip(tmp_path):
    cfg = Config(dataset="cifar10", lr_g=1.6e-4, ch_mult=[1, 2, 2, 2])
    cfg.save(tmp_path / "c.json")
    back = Config.load(tmp_path / "c.json")
    assert back.dataset == "cifar10"
    assert back.lr_g == 1.6e-4
    assert back.ch_mult == [1, 2, 2, 2]


def test_config_keeps_unknown_keys():
    cfg = Config.from_dict({"dataset": "luna16", "with_FID": True, "save_dir": "/x"})
    assert cfg.with_FID is True
    assert cfg.save_dir == "/x"


def test_modify_json_file(tmp_path):
    p = tmp_path / "c.json"
    with open(p, "w") as f:
        json.dump({"a": 1, "b": 2}, f)
    out = modify_json_file(p, {"b": 3, "c": 4})
    assert out == {"a": 1, "b": 3, "c": 4}
    assert load_json_to_dict(p) == out


def test_cli_merge_writes_back(tmp_path, monkeypatch):
    """CLI overrides are written back into configs/config.json
    (train_ddgan.py:198-222 semantics)."""
    monkeypatch.chdir(tmp_path)
    args = build_parser().parse_args(
        ["--use_config_file", "True", "--batch_size", "7", "--dataset", "synthetic"]
    )
    cfg = resolve_config(args)
    assert cfg.batch_size == 7
    assert cfg.dataset == "synthetic"
    on_disk = load_json_to_dict("configs/config.json")
    assert on_disk["batch_size"] == 7
    assert on_disk["dataset"] == "synthetic"
    # and defaults survive
    assert on_disk["beta_min"] == 0.1


def test_cli_no_config_file_uses_flags_only(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    args = build_parser().parse_args(["--batch_size", "9"])
    cfg = resolve_config(args)
    assert cfg.batch_size == 9
    assert not os.path.exists("configs/config.json")


def test_checkpoint_roundtrip(tmp_path):
    from flax import serialization
    from ddgan_tpu.train import checkpoint as ckpt
    from ddgan_tpu.train.state import TrainState

    state = TrainState(
        params_G={"w": jnp.ones((2, 3))},
        params_D={"v": jnp.zeros((4,))},
        buffers_G={},
        opt_G={"count": jnp.zeros((), jnp.int32)},
        opt_D={"count": jnp.zeros((), jnp.int32)},
        ema_G={"w": jnp.full((2, 3), 0.5)},
        step=jnp.asarray(7, jnp.int32),
        epoch=jnp.asarray(2, jnp.int32),
    )
    ckpt.save_content(tmp_path, state, {"dataset": "synthetic", "seed": 1})
    template = TrainState(
        params_G={"w": jnp.zeros((2, 3))},
        params_D={"v": jnp.ones((4,))},
        buffers_G={},
        opt_G={"count": jnp.zeros((), jnp.int32)},
        opt_D={"count": jnp.zeros((), jnp.int32)},
        ema_G={"w": jnp.zeros((2, 3))},
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
    )
    back = ckpt.load_content(tmp_path, template)
    assert int(back.step) == 7
    assert int(back.epoch) == 2
    np.testing.assert_array_equal(np.asarray(back.params_G["w"]), np.ones((2, 3)))
    np.testing.assert_array_equal(np.asarray(back.ema_G["w"]), np.full((2, 3), 0.5))
    assert ckpt.load_content_args(tmp_path)["dataset"] == "synthetic"

    ckpt.save_netg(tmp_path, 5, {"w": jnp.ones((2,))})
    payload = ckpt.load_netg(tmp_path / "netG_5.ckpt")
    np.testing.assert_array_equal(payload["params"]["w"], np.ones((2,)))


def test_resolve_compute_dtype_validation():
    """Unknown compute_dtype names must raise, not silently train f32
    (the 'modules silently running f32' pitfall; review r3)."""
    from ddgan_tpu.models.ncsnpp import resolve_compute_dtype

    assert resolve_compute_dtype("float32") is None
    assert resolve_compute_dtype("bf16") == jnp.bfloat16
    assert resolve_compute_dtype("bfloat16") == jnp.bfloat16
    with pytest.raises(ValueError, match="compute_dtype"):
        resolve_compute_dtype("float16")
    with pytest.raises(ValueError, match="compute_dtype"):
        resolve_compute_dtype("bfloat_16")


def test_force_platform_env_hook(tmp_path):
    """DDGAN_TPU_FORCE_PLATFORM=cpu must pin the backend in a fresh
    process even with the axon sitecustomize on PYTHONPATH (which
    force-registers the remote TPU and overrides JAX_PLATFORMS) —
    the hook every CLI main() applies before its first device query."""
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # prove the hook, not the env var
    env["DDGAN_TPU_FORCE_PLATFORM"] = "cpu"
    env["DDGAN_TPU_FORCE_NUM_CPU_DEVICES"] = "2"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    site = "/root/.axon_site"
    env["PYTHONPATH"] = f"{repo}:{site}" if os.path.isdir(site) else repo
    out = subprocess.run(
        [sys.executable, "-c",
         "from ddgan_tpu._platform import apply_force_platform\n"
         "apply_force_platform()\n"
         "import jax\n"
         "print(jax.default_backend(), jax.device_count())\n"],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().split()[-2:] == ["cpu", "2"], out.stdout


def test_perf_knobs_flow_from_config_file(tmp_path, monkeypatch):
    """VERDICT r4 item 6: the perf knobs are declared schema keys — a
    config FILE's settings reach the model/step/optimizer builders with NO
    env vars involved (env vars remain documented overrides)."""
    from ddgan_tpu.config import Config
    from ddgan_tpu.models import NCSNpp
    from ddgan_tpu.train.loop import resolve_optimizer_sharding
    from ddgan_tpu.train.step import make_train_step

    for var in ("DDGAN_TPU_S2D_CONV", "DDGAN_TPU_R1_SHARED", "DDGAN_TPU_ZERO1",
                "DDGAN_TPU_REMAT_POLICY"):
        monkeypatch.delenv(var, raising=False)

    # every knob is part of the written schema now
    p = tmp_path / "config.json"
    Config().save(p)
    on_disk = json.loads(p.read_text())
    for key in ("s2d_conv", "use_remat", "remat_policy", "r1_shared",
                "optimizer_sharding"):
        assert key in on_disk, key

    on_disk.update(
        s2d_conv="off", use_remat="yes", remat_policy="save-convs",
        r1_shared="yes", optimizer_sharding="zero1", image_size=32,
    )
    p.write_text(json.dumps(on_disk))
    cfg = Config.load(p)

    m = NCSNpp.from_config(cfg)
    assert m.s2d_conv == "off"
    assert m.use_remat is True  # "yes" forces remat below the 256² auto line
    assert m.remat_policy == "save-convs"
    assert resolve_optimizer_sharding(cfg) == "zero1"
    # r1_shared reaches make_train_step as a validated tri-state
    with pytest.raises(ValueError, match="r1_shared"):
        make_train_step(
            None, None, None, None, num_timesteps=1, nz=4, r1_gamma=0.0,
            lazy_reg=None, ema_decay=0.9, use_ema=False, tx_g=None, tx_d=None,
            r1_shared="bogus",
        )
