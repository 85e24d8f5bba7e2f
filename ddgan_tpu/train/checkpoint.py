"""Checkpointing: the two artifact kinds of the reference (SURVEY.md §5).

  1. `content.ckpt` every epoch — full training state (epoch, global_step,
     args dict, G/D params, both optimizer states, EMA) — the analog of
     content.pth (ddgan.py:545-561). Serialized with flax msgpack; args as
     sidecar JSON (`content_args.json`) so eval can recover the training
     config (test_ddgan.py:135-146).
  2. `netG_{epoch}.ckpt` every save_ckpt_every epochs — generator params
     with EMA swapped in (ddgan.py:563-569), achieved functionally by just
     writing the EMA tree.

Only process 0 writes (ddgan.py:536). Torch-format .pth import lives in
ddgan_tpu.compat.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any

import jax
import numpy as np
from flax import serialization

from .state import TrainState


def _to_host(tree):
    # ONE batched device→host gather: jax.device_get starts every leaf's
    # async copy before blocking. Mapping np.asarray over leaves paid a
    # full relay round-trip PER LEAF (hundreds for NCSNpp), inflating
    # epoch-boundary saves to minutes through the chip tunnel.
    return jax.tree.map(np.asarray, jax.device_get(tree))


def save_content(exp_path: str | Path, state: TrainState, args: Any) -> None:
    exp_path = Path(exp_path)
    exp_path.mkdir(parents=True, exist_ok=True)
    payload = serialization.to_bytes(_to_host(state))
    tmp = exp_path / "content.ckpt.tmp"
    with open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, exp_path / "content.ckpt")
    args_dict = args if isinstance(args, dict) else vars(args)
    with open(exp_path / "content_args.json", "w") as f:
        json.dump(
            {k: v for k, v in args_dict.items() if _json_ok(v)}, f, indent=4
        )


def _json_ok(v) -> bool:
    try:
        json.dumps(v)
        return True
    except TypeError:
        return False


def load_content(exp_path: str | Path, template: TrainState) -> TrainState:
    exp_path = Path(exp_path)
    with open(exp_path / "content.ckpt", "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_content_args(exp_path: str | Path) -> dict:
    with open(Path(exp_path) / "content_args.json") as f:
        return json.load(f)


def save_netg(exp_path: str | Path, epoch: int, params_g, buffers_g=None) -> None:
    """EMA-swapped generator snapshot (ddgan.py:563-569)."""
    exp_path = Path(exp_path)
    exp_path.mkdir(parents=True, exist_ok=True)
    payload = {"params": _to_host(params_g)}
    if buffers_g:
        payload["buffers"] = _to_host(buffers_g)
    with open(exp_path / f"netG_{epoch}.ckpt", "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_netg(path: str | Path) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())
