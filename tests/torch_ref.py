"""Import the reference torch models with the CUDA op package stubbed.

The reference JIT-compiles CUDA extensions at `score_sde.op` import time
(op/__init__.py), which cannot work here (no CUDA). We pre-seed
sys.modules with a stub exposing the same API implemented in pure torch
(the semantics of upfirdn2d_native, score_sde/op/upfirdn2d.py:184-225),
then import the real model code from /root/reference for golden-parity
testing. Reference code is used READ-ONLY as a test oracle.
"""

import sys
import types
import math

import torch
import torch.nn.functional as F

REFERENCE_ROOT = "/root/reference"


def torch_upfirdn2d_native(
    x, kernel, up_x, up_y, down_x, down_y, pad_x0, pad_x1, pad_y0, pad_y1
):
    """Zero-stuff -> pad -> convolve(kernel) -> stride, NCHW."""
    n, c, in_h, in_w = x.shape
    kh, kw = kernel.shape
    out = x.reshape(-1, in_h, 1, in_w, 1)
    out = F.pad(out, [0, up_x - 1, 0, 0, 0, up_y - 1])
    out = out.reshape(-1, in_h * up_y, in_w * up_x)
    out = F.pad(
        out, [max(pad_x0, 0), max(pad_x1, 0), max(pad_y0, 0), max(pad_y1, 0)]
    )
    out = out[
        :,
        max(-pad_y0, 0) : out.shape[1] - max(-pad_y1, 0),
        max(-pad_x0, 0) : out.shape[2] - max(-pad_x1, 0),
    ]
    out = out[:, None]
    w = torch.flip(kernel, [0, 1])[None, None]
    out = F.conv2d(out, w)
    out = out[:, 0, ::down_y, ::down_x]
    out_h = (in_h * up_y + pad_y0 + pad_y1 - kh) // down_y + 1
    out_w = (in_w * up_x + pad_x0 + pad_x1 - kw) // down_x + 1
    return out.reshape(n, c, out_h, out_w)


def _stub_upfirdn2d(input, kernel, up=1, down=1, pad=(0, 0)):
    return torch_upfirdn2d_native(
        input, kernel, up, up, down, down, pad[0], pad[1], pad[0], pad[1]
    )


def _stub_fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2**0.5):
    if bias is not None:
        x = x + bias.reshape((1, -1) + (1,) * (x.ndim - 2))
    return F.leaky_relu(x, negative_slope) * scale


def install_reference():
    """Put /root/reference on sys.path with score_sde.op stubbed."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    if "score_sde.op" not in sys.modules:
        import score_sde  # the real package __init__ (empty)

        op = types.ModuleType("score_sde.op")
        op.upfirdn2d = _stub_upfirdn2d
        op.fused_leaky_relu = _stub_fused_leaky_relu

        class FusedLeakyReLU(torch.nn.Module):
            def __init__(self, channel, negative_slope=0.2, scale=2**0.5):
                super().__init__()
                self.bias = torch.nn.Parameter(torch.zeros(channel))
                self.negative_slope = negative_slope
                self.scale = scale

            def forward(self, x):
                return _stub_fused_leaky_relu(
                    x, self.bias, self.negative_slope, self.scale
                )

        op.FusedLeakyReLU = FusedLeakyReLU
        upfirdn_mod = types.ModuleType("score_sde.op.upfirdn2d")
        upfirdn_mod.upfirdn2d = _stub_upfirdn2d
        op.upfirdn2d_module = upfirdn_mod
        sys.modules["score_sde.op"] = op
        sys.modules["score_sde.op.upfirdn2d"] = upfirdn_mod
        score_sde.op = op

    # stubs for packages absent from this image that reference
    # entrypoint modules import at top level (torchvision, pytorch_fid
    # chain) — enough to import test_ddgan.py as a math oracle.
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            tv = types.ModuleType("torchvision")
            tv.utils = types.SimpleNamespace(save_image=lambda *a, **k: None)
            sys.modules["torchvision"] = tv
    if "pytorch_fid.fid_score" not in sys.modules:
        try:
            import pytorch_fid.fid_score  # noqa: F401
        except ImportError:
            pf = types.ModuleType("pytorch_fid")
            fs = types.ModuleType("pytorch_fid.fid_score")
            fs.calculate_fid_given_paths = lambda *a, **k: float("nan")
            pf.fid_score = fs
            sys.modules["pytorch_fid"] = pf
            sys.modules["pytorch_fid.fid_score"] = fs
