"""Map reference torch state_dicts onto the flax parameter trees.

The NCSNpp flax model (ddgan_tpu.models.ncsnpp) builds the SAME flat
module list as the reference's nn.ModuleList walk, so torch key
`all_modules.{i}.*` maps mechanically onto flax path `all_modules_{i}/*`.
Remaining differences are systematic:

  * layout: torch Conv2d weight (O, I, kh, kw) → flax HWIO (kh, kw, I, O);
    torch Linear weight (out, in) → flax kernel (in, out).
  * leaf names: weight→kernel (or `weight` for FirConv2d), 1-d GroupNorm
    weight→scale; NIN keeps W/b verbatim.
  * wrapper modules: our Conv3x3/Dense wrappers introduce one extra level
    ('conv' / 'linear' / 'dense'), resolved by search against the target
    tree rather than hardcoding.
  * torch Sequential indices: z_transform.{2j+1} → z_transform_layers_{j};
    t_embed.main.{0,2} → t_embed.dense{0,1}; DownConvBlock's
    conv1.0/conv2.0/skip.0 collapse to conv1/conv2/skip.
  * `module.` DDP prefixes are stripped (ddgan.py:377-386).

The converter asserts FULL coverage: every torch tensor lands somewhere
and every flax leaf is assigned — silent partial imports are bugs.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import jax


def strip_module_prefix(state_dict: Mapping[str, Any]) -> dict[str, Any]:
    """Remove DDP 'module.' prefixes. (ddgan.py:377-386)"""
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in state_dict.items()
    }


def _flatten(tree, prefix=()) -> dict[tuple, np.ndarray]:
    out = {}
    if isinstance(tree, Mapping):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: dict[tuple, Any]):
    root: dict = {}
    for path, v in flat.items():
        node = root
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return root


_WRAPPERS = ("conv", "linear", "dense")


def _translate_path(parts: list[str]) -> list[str]:
    """Apply the systematic segment renames (module structure, not leaves)."""
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("all_modules",) and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"all_modules_{parts[i + 1]}")
            i += 2
        elif p == "z_transform" and i + 1 < len(parts) and parts[i + 1].isdigit():
            # Sequential [PixelNorm, dense, act, dense, act, ...] → dense at odd idx
            j = (int(parts[i + 1]) - 1) // 2
            out.append(f"z_transform_layers_{j}")
            i += 2
        elif p == "main" and i + 1 < len(parts) and parts[i + 1].isdigit():
            # t_embed.main.{0,2} → dense{0,1} (discriminator.py:27-31)
            out.append(f"dense{int(parts[i + 1]) // 2}")
            i += 2
        elif p.isdigit():
            # bare Sequential wrapper index (conv1.0.weight → conv1.weight)
            i += 1
        else:
            out.append(p)
            i += 1
    return out


def _leaf_candidates(name: str, arr: np.ndarray):
    """(leaf names to try, transformed array) for one torch tensor."""
    if name == "weight":
        if arr.ndim == 4:
            return ("kernel", "weight"), arr.transpose(2, 3, 1, 0)
        if arr.ndim == 2:
            return ("kernel",), arr.T
        return ("scale",), arr  # affine GroupNorm
    if name == "bias":
        return ("bias", "b"), arr
    return (name,), arr  # NIN W/b, Fourier W, etc.


def convert_torch_state_dict(
    state_dict: Mapping[str, Any],
    params_template,
    buffers_template=None,
) -> tuple[Any, Any]:
    """Convert a torch state_dict into (params, buffers) matching templates.

    Raises if any torch tensor cannot be placed or any template leaf is
    left unassigned.
    """
    state_dict = strip_module_prefix(state_dict)
    flat_p = _flatten(jax.tree.map(np.asarray, params_template))
    flat_b = (
        _flatten(jax.tree.map(np.asarray, buffers_template))
        if buffers_template
        else {}
    )
    assigned_p: dict[tuple, np.ndarray] = {}
    assigned_b: dict[tuple, np.ndarray] = {}

    for key, value in state_dict.items():
        arr = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value,
            dtype=np.float32,
        )
        parts = _translate_path(key.split("."))
        prefix, torch_leaf = parts[:-1], parts[-1]
        leaf_names, transformed = _leaf_candidates(torch_leaf, arr)

        candidates = []
        for leaf in leaf_names:
            base = tuple(prefix) + (leaf,)
            candidates.append((base, leaf))
            for w in _WRAPPERS:
                candidates.append((tuple(prefix) + (w, leaf), leaf))

        placed = False
        for path, leaf in candidates:
            target = flat_p if path in flat_p else (flat_b if path in flat_b else None)
            if target is None:
                continue
            expect = target[path].shape
            # pick the orientation that matches the template shape
            for cand in (transformed, arr):
                if cand.shape == expect:
                    if target is flat_p:
                        assigned_p[path] = cand
                    else:
                        assigned_b[path] = cand
                    placed = True
                    break
            if placed:
                break
        if not placed:
            raise KeyError(
                f"torch key {key!r} (shape {arr.shape}) has no home; tried "
                f"{[c[0] for c in candidates]}"
            )

    missing = set(flat_p) - set(assigned_p)
    if missing:
        raise KeyError(f"flax params not covered by torch checkpoint: {sorted(missing)[:10]}")
    missing_b = set(flat_b) - set(assigned_b)
    if missing_b:
        raise KeyError(f"flax buffers not covered: {sorted(missing_b)}")

    params = _unflatten(assigned_p)
    buffers = _unflatten(assigned_b) if assigned_b else (buffers_template or {})
    return params, buffers


def load_torch_netg(path: str, params_template, buffers_template=None):
    """Load a reference netG_{epoch}.pth into flax trees. (test_ddgan.py:156-162)"""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return convert_torch_state_dict(sd, params_template, buffers_template)


def load_torch_content(path: str) -> dict:
    """Load a reference content.pth; returns the raw dict (args + state dicts).
    (ddgan.py:545-561, test_ddgan.py:135-146)"""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


# ---------------------------------------------------------------------------
# Export: flax params → reference torch state_dict (inverse of the importer),
# so checkpoints trained here remain loadable by the reference's
# test_ddgan.py / pytorch tooling.
def _invert_path(path: tuple) -> list[str]:
    """flax path segments → torch dotted-key segments."""
    parts: list[str] = []
    for seg in path[:-1]:
        if seg.startswith("all_modules_"):
            parts.extend(["all_modules", seg[len("all_modules_"):]])
        elif seg.startswith("z_transform_layers_"):
            j = int(seg[len("z_transform_layers_"):])
            parts.extend(["z_transform", str(2 * j + 1)])
        elif seg == "dense0":
            parts.extend(["main", "0"])
        elif seg == "dense1":
            parts.extend(["main", "2"])
        elif seg in _WRAPPERS:
            continue  # our wrapper level has no torch counterpart
        else:
            parts.append(seg)
    return parts


def _leaf_to_torch(leaf_name: str, arr: np.ndarray, parent: str):
    """(torch leaf name, transformed array)."""
    if leaf_name == "kernel":
        if arr.ndim == 4:
            return "weight", arr.transpose(3, 2, 0, 1)  # HWIO → OIHW
        return "weight", arr.T
    if leaf_name == "weight" and arr.ndim == 4:  # FirConv2d raw weight
        return "weight", arr.transpose(3, 2, 0, 1)
    if leaf_name == "scale":
        return "weight", arr
    return leaf_name, arr  # bias, W, b


def export_torch_state_dict(params, buffers=None) -> dict:
    """Convert flax (params, buffers) to a reference-named torch state_dict.

    Values are torch tensors. Sequential-wrapper indices that the reference
    inserts around bare convs in DownConvBlock (conv1.0.*, conv2.0.*,
    skip.0.*) are reinstated for the discriminators.
    """
    import torch

    flat = _flatten(jax.tree.map(np.asarray, params))
    if buffers:
        flat.update(_flatten(jax.tree.map(np.asarray, buffers)))
    out: dict[str, "torch.Tensor"] = {}
    for path, arr in flat.items():
        parts = _invert_path(path)
        leaf, value = _leaf_to_torch(path[-1], np.asarray(arr, np.float32),
                                     parts[-1] if parts else "")
        # reference DownConvBlock wraps convs in 1-element Sequentials
        # (discriminator.py:56-72)
        if parts and parts[-1] in ("conv1", "conv2", "skip") and "all_modules" not in parts:
            parts = parts + ["0"]
        key = ".".join(parts + [leaf])
        out[key] = torch.from_numpy(np.ascontiguousarray(value))
    return out


def save_torch_netg(path: str, params, buffers=None) -> None:
    """Write a reference-format netG_{epoch}.pth loadable by test_ddgan.py."""
    import torch

    torch.save(export_torch_state_dict(params, buffers), path)
