"""Misc utilities: image saving + the file/shell helpers of the
reference's additionals/utilities.py (copy/move, subprocess runner)."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np
from PIL import Image


def save_image(x: np.ndarray, path: str | Path, normalize: bool = False) -> None:
    """torchvision save_image semantics for one HWC image in [0,1].

    normalize=True min-max rescales; otherwise clamp to [0,1]. uint8 via
    mul(255).add_(0.5).clamp_(0,255) rounding (torchvision's formula).
    """
    x = np.asarray(x, dtype=np.float32)
    if x.ndim == 2:
        x = x[:, :, None]
    if normalize:
        lo, hi = float(x.min()), float(x.max())
        x = (x - lo) / max(hi - lo, 1e-5)
    x = np.clip(x, 0.0, 1.0)
    arr = np.clip(x * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if arr.shape[-1] == 1:
        arr = arr[:, :, 0]
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(path)


def to_range_0_1(x):
    """[-1,1] → [0,1] (test_ddgan.py:149)."""
    return (x + 1.0) / 2.0


# ---- file/shell helpers (additionals/utilities.py:10-177 parity) ----------
def copy_file(src, dst, replace=False, rename=None):
    dst = Path(dst)
    if rename:
        dst = dst.parent / rename
    if dst.exists() and not replace:
        return str(dst)
    dst.parent.mkdir(parents=True, exist_ok=True)
    shutil.copy2(src, dst)
    return str(dst)


def copy_directory(src, dst, replace=False, rename=None):
    dst = Path(dst)
    if rename:
        dst = dst.parent / rename
    if dst.exists():
        if not replace:
            return str(dst)
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
    return str(dst)


def move_file(src, dst, replace=False, rename=None):
    dst = Path(dst)
    if rename:
        dst = dst.parent / rename
    if dst.exists() and not replace:
        return str(dst)
    dst.parent.mkdir(parents=True, exist_ok=True)
    shutil.move(src, dst)
    return str(dst)


def run_bash_command(command: str, stream_output: bool = False) -> str:
    """Run a shell command, optionally streaming output line by line
    (pso.py:94-116 protocol)."""
    if stream_output:
        proc = subprocess.Popen(
            command, shell=True, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        lines = []
        assert proc.stdout is not None
        for line in proc.stdout:
            print(line, end="")
            lines.append(line)
        proc.wait()
        return "".join(lines)
    result = subprocess.run(
        command, shell=True, capture_output=True, text=True, check=False
    )
    return result.stdout


def find_python_command() -> str:
    return sys.executable or "python"


def install_package(package_name: str) -> None:
    """Reference API parity (additionals/utilities.py:165-177). This
    environment forbids runtime installs; surfaces the instruction
    instead of silently shelling out to pip."""
    print(
        f"install_package('{package_name}'): runtime pip installs are "
        "disabled in this environment; add the package to the image instead."
    )
