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


class CheckpointShardingError(ValueError):
    """Raised when a content.ckpt cannot be adapted to the configured
    optimizer_sharding mode / device count (train/zero1.py)."""


def _is_zero1_state_dict(d) -> bool:
    return (
        isinstance(d, dict)
        and set(d.keys()) == {"mu", "nu", "count"}
        and np.ndim(d.get("mu")) == 2
    )


def _find_adam_state_dict(opt_dict: dict):
    """Locate the scale_by_adam element inside a serialized optax chain
    state ({"0": {}, "1": {"count","mu","nu"}, ...})."""
    if not isinstance(opt_dict, dict):
        return None
    for v in opt_dict.values():
        if isinstance(v, dict) and {"count", "mu", "nu"} <= set(v.keys()):
            return v
    return None


def _flatten_np_f32(tree) -> np.ndarray:
    leaves = jax.tree.leaves(tree)
    if not leaves:
        return np.zeros((0,), np.float32)
    return np.concatenate(
        [np.ravel(np.asarray(l)).astype(np.float32) for l in leaves]
    )


def _pack_rows(flat: np.ndarray, num_shards: int, total: int) -> np.ndarray:
    """Flat P-vector → the (num_shards, ceil(P/n)) zero-padded row layout of
    Zero1OptState (zero1.py Zero1Optimizer.init)."""
    shard = -(-total // num_shards)
    pad = num_shards * shard - total
    if pad:
        flat = np.concatenate([flat[:total], np.zeros((pad,), np.float32)])
    return flat[: num_shards * shard].reshape(num_shards, shard)


def _unflatten_like(flat: np.ndarray, params_template) -> Any:
    leaves, treedef = jax.tree.flatten(params_template)
    out, off = [], 0
    for l in leaves:
        n = int(np.prod(l.shape)) if l.shape else 1
        out.append(np.asarray(flat[off : off + n]).reshape(l.shape))
        off += n
    return jax.tree.unflatten(treedef, out)


def _adapt_one_opt(raw_opt, opt_template, params_template, name: str):
    """Return a state dict for `raw_opt` compatible with `opt_template`,
    converting between the replicated optax layout and the zero1
    device-count-dependent (num_shards, shard_len) layout.

    The reference's content.pth optimizer state is layout-independent
    (ddgan.py:545-561); zero1 bakes the mesh size into the moment rows, so
    resuming across optimizer_sharding modes or a different device count
    needs this adaptation (flax from_bytes does not shape-check ndarray
    leaves — without it a mismatched resume only fails later, deep inside
    device_put/reshape; ADVICE r4).
    """
    from .zero1 import Zero1OptState

    t_is_z = isinstance(opt_template, Zero1OptState)
    r_is_z = _is_zero1_state_dict(raw_opt)
    total = sum(int(np.prod(l.shape)) if l.shape else 1
                for l in jax.tree.leaves(params_template))

    if t_is_z and r_is_z:
        want = tuple(opt_template.mu.shape)
        have = tuple(np.shape(raw_opt["mu"]))
        if want == have:
            return raw_opt
        if int(np.prod(have)) < total:
            raise CheckpointShardingError(
                f"{name}: zero1 checkpoint moments {have} hold fewer "
                f"elements than the {total} parameters they must cover"
            )
        print(
            f"=> {name}: resharding zero1 moments {have} -> {want} "
            f"(checkpoint saved under a different device count)"
        )
        return {
            "mu": _pack_rows(np.asarray(raw_opt["mu"]).reshape(-1), want[0], total),
            "nu": _pack_rows(np.asarray(raw_opt["nu"]).reshape(-1), want[0], total),
            "count": raw_opt["count"],
        }

    if t_is_z and not r_is_z:
        adam = _find_adam_state_dict(raw_opt)
        if adam is None:
            raise CheckpointShardingError(
                f"{name}: optimizer_sharding='zero1' is configured but the "
                "checkpoint holds neither a zero1 state nor a recognizable "
                "replicated Adam state — cannot adapt. Resume with the "
                "optimizer_sharding the checkpoint was written under, or "
                "delete content.ckpt to restart the optimizer."
            )
        n = opt_template.mu.shape[0]
        print(f"=> {name}: converting replicated Adam moments to zero1 ({n} shards)")
        return {
            "mu": _pack_rows(_flatten_np_f32(adam["mu"]), n, total),
            "nu": _pack_rows(_flatten_np_f32(adam["nu"]), n, total),
            "count": adam["count"],
        }

    if (not t_is_z) and r_is_z:
        skeleton = serialization.to_state_dict(opt_template)
        adam_skel = _find_adam_state_dict(skeleton)
        if adam_skel is None:
            raise CheckpointShardingError(
                f"{name}: checkpoint holds zero1 moments but the configured "
                "replicated optimizer has no Adam state to receive them"
            )
        flat_mu = np.asarray(raw_opt["mu"]).reshape(-1)
        flat_nu = np.asarray(raw_opt["nu"]).reshape(-1)
        if flat_mu.size < total:
            raise CheckpointShardingError(
                f"{name}: zero1 checkpoint moments ({flat_mu.size}) hold "
                f"fewer elements than the {total} parameters they must cover"
            )
        print(f"=> {name}: converting zero1 moments back to the replicated Adam layout")
        adam_skel["count"] = raw_opt["count"]
        adam_skel["mu"] = serialization.to_state_dict(
            _unflatten_like(flat_mu, params_template)
        )
        adam_skel["nu"] = serialization.to_state_dict(
            _unflatten_like(flat_nu, params_template)
        )
        return skeleton

    return raw_opt


def adapt_content_state_dict(raw: dict, template: TrainState) -> dict:
    """Adapt a restored content.ckpt state dict across optimizer_sharding
    modes and device counts before from_state_dict (see _adapt_one_opt)."""
    out = dict(raw)
    for opt_name, params_name in (("opt_G", "params_G"), ("opt_D", "params_D")):
        t_opt = getattr(template, opt_name, None)
        if opt_name in raw and t_opt is not None:
            out[opt_name] = _adapt_one_opt(
                raw[opt_name], t_opt, getattr(template, params_name), opt_name
            )
    return out


def load_content(exp_path: str | Path, template: TrainState) -> TrainState:
    exp_path = Path(exp_path)
    with open(exp_path / "content.ckpt", "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    raw = adapt_content_state_dict(raw, template)
    return serialization.from_state_dict(template, raw)


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
