"""upfirdn2d + FIR resampling tests.

Golden model: a torch implementation of the reference's CPU-exact
`upfirdn2d_native` semantics (score_sde/op/upfirdn2d.py:184-225), written
here independently. Both sides get identical inputs; outputs must match to
float32 tolerance. Second-order gradients are checked because the R1
penalty differentiates through the discriminator's FIR downsampling.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from ddgan_tpu.ops import (
    conv_downsample_2d,
    downsample_2d,
    naive_downsample_2d,
    naive_upsample_2d,
    setup_kernel,
    upsample_2d,
    upsample_conv_2d,
)
from ddgan_tpu.ops.upfirdn2d import upfirdn2d_nchw


def torch_upfirdn2d_native(x, kernel, up_x, up_y, down_x, down_y, pad_x0, pad_x1, pad_y0, pad_y1):
    """Zero-stuff -> pad -> convolve(kernel) -> stride, NCHW."""
    n, c, in_h, in_w = x.shape
    kh, kw = kernel.shape
    out = x.reshape(-1, in_h, 1, in_w, 1)
    out = F.pad(out, [0, up_x - 1, 0, 0, 0, up_y - 1])
    out = out.reshape(-1, in_h * up_y, in_w * up_x)
    out = F.pad(out, [max(pad_x0, 0), max(pad_x1, 0), max(pad_y0, 0), max(pad_y1, 0)])
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


FIR = (1.0, 3.0, 3.0, 1.0)


@pytest.mark.parametrize(
    "up,down,pad,ksize",
    [
        (1, 1, (1, 1), 4),  # plain FIR
        (1, 1, (2, 1), 4),
        (2, 1, (2, 1), 4),  # upsample path (upsample_2d pads (p+1)//2+f-1, p//2)
        (1, 2, (1, 1), 4),  # downsample path
        (2, 2, (1, 1), 3),
        (1, 1, (0, 0), 3),
        (1, 2, (2, 2), 2),
        (4, 1, (3, 1), 4),
        (1, 4, (2, 1), 4),
        (1, 1, (-1, 2), 3),  # negative pad (crop)
    ],
)
def test_upfirdn2d_matches_golden(up, down, pad, ksize):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 12, 12).astype(np.float32)
    k = setup_kernel(rng.rand(ksize).astype(np.float32) + 0.5)

    ours = upfirdn2d_nchw(jnp.asarray(x), jnp.asarray(k), up=up, down=down, pad=pad)
    golden = torch_upfirdn2d_native(
        torch.from_numpy(x), torch.from_numpy(k), up, up, down, down,
        pad[0], pad[1], pad[0], pad[1],
    )
    np.testing.assert_allclose(
        np.asarray(ours), golden.numpy(), rtol=1e-5, atol=1e-5
    )


def test_upsample_downsample_2d_match_golden():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 16, 16).astype(np.float32)
    k2 = setup_kernel(FIR)

    # upsample_2d: k * factor^2, pad ((p+1)//2 + f - 1, p//2), p = ksize - f
    f = 2
    ku = k2 * (f**2)
    p = ku.shape[0] - f
    golden_up = torch_upfirdn2d_native(
        torch.from_numpy(x), torch.from_numpy(ku), f, f, 1, 1,
        (p + 1) // 2 + f - 1, p // 2, (p + 1) // 2 + f - 1, p // 2,
    )
    ours_up = upsample_2d(jnp.asarray(x.transpose(0, 2, 3, 1)), FIR, factor=2)
    np.testing.assert_allclose(
        np.asarray(ours_up).transpose(0, 3, 1, 2), golden_up.numpy(), rtol=1e-5, atol=1e-5
    )
    assert ours_up.shape == (2, 32, 32, 4)

    pd = k2.shape[0] - f
    golden_down = torch_upfirdn2d_native(
        torch.from_numpy(x), torch.from_numpy(k2), 1, 1, f, f,
        (pd + 1) // 2, pd // 2, (pd + 1) // 2, pd // 2,
    )
    ours_down = downsample_2d(jnp.asarray(x.transpose(0, 2, 3, 1)), FIR, factor=2)
    np.testing.assert_allclose(
        np.asarray(ours_down).transpose(0, 3, 1, 2), golden_down.numpy(), rtol=1e-5, atol=1e-5
    )
    assert ours_down.shape == (2, 8, 8, 4)


def test_naive_resample():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    up = naive_upsample_2d(x, 2)
    assert up.shape == (1, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(up[0, :2, :2, 0]), np.zeros((2, 2)))
    np.testing.assert_allclose(np.asarray(up[0, 2, 2, 0]), 5.0)
    down = naive_downsample_2d(up, 2)
    np.testing.assert_allclose(np.asarray(down), np.asarray(x), rtol=1e-6)


def test_conv_downsample_2d_matches_golden():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 3, 16, 16).astype(np.float32)
    w = rng.randn(5, 3, 3, 3).astype(np.float32)  # OIHW
    k2 = setup_kernel(FIR)
    f = 2
    p = (k2.shape[0] - f) + (3 - 1)
    pre = torch_upfirdn2d_native(
        torch.from_numpy(x), torch.from_numpy(k2), 1, 1, 1, 1,
        (p + 1) // 2, p // 2, (p + 1) // 2, p // 2,
    )
    golden = F.conv2d(pre, torch.from_numpy(w), stride=2, padding=0)

    ours = conv_downsample_2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(w.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
        FIR,
        factor=2,
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), golden.numpy(), rtol=1e-4, atol=1e-4
    )


def test_upsample_conv_2d_matches_transposed_conv():
    """upsample_conv_2d == StyleGAN2 intent: conv_transpose(stride=f) + FIR."""
    rng = np.random.RandomState(3)
    x = rng.randn(1, 3, 8, 8).astype(np.float32)
    w = rng.randn(4, 3, 3, 3).astype(np.float32)  # OIHW (outC, inC)
    f = 2
    k2 = setup_kernel(FIR) * (f**2)
    p = (k2.shape[0] - f) - (3 - 1)

    wt = torch.from_numpy(w)
    wt2 = torch.flip(wt, [2, 3]).permute(1, 0, 2, 3)  # (inC, outC, kh, kw)
    pre = F.conv_transpose2d(torch.from_numpy(x), wt2, stride=f, padding=0)
    golden = torch_upfirdn2d_native(
        pre, torch.from_numpy(k2), 1, 1, 1, 1,
        (p + 1) // 2 + f - 1, p // 2 + 1, (p + 1) // 2 + f - 1, p // 2 + 1,
    )

    ours = upsample_conv_2d(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(w.transpose(2, 3, 1, 0)),
        FIR,
        factor=2,
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), golden.numpy(), rtol=1e-4, atol=1e-4
    )
    assert ours.shape == (1, 16, 16, 4)


def test_gradients_first_and_second_order():
    """R1 requires grad-of-grad through FIR downsampling."""
    from jax.test_util import check_grads

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))

    def f(x):
        return jnp.sum(downsample_2d(x, FIR, factor=2) ** 2)

    check_grads(f, (x,), order=2, modes=["rev"], atol=1e-2, rtol=1e-2)

    # explicit grad-of-grad (the exact R1 pattern)
    def r1(x):
        g = jax.grad(f)(x)
        return jnp.sum(g**2)

    gg = jax.grad(r1)(x)
    assert gg.shape == x.shape and bool(jnp.all(jnp.isfinite(gg)))


def test_fused_leaky_relu_matches_torch():
    from ddgan_tpu.ops import fused_leaky_relu

    rng = np.random.RandomState(5)
    x = rng.randn(2, 4, 4, 3).astype(np.float32)
    b = rng.randn(3).astype(np.float32)
    ours = fused_leaky_relu(jnp.asarray(x), jnp.asarray(b))
    golden = (
        F.leaky_relu(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
            + torch.from_numpy(b).view(1, 3, 1, 1),
            negative_slope=0.2,
        )
        * (2**0.5)
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), golden.numpy(), rtol=1e-6, atol=1e-6
    )


def test_fused_bias_act_modes():
    """The CUDA switch's act modes (fused_bias_act_kernel.cu:20-51)."""
    from ddgan_tpu.ops.fused_act import fused_bias_act, fused_leaky_relu

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 4, 4, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(3).astype(np.float32))

    # linear, kernel-default scale 1.0 == plain bias add
    lin = fused_bias_act(x, b, act="linear", scale=1.0)
    np.testing.assert_allclose(
        np.asarray(lin), np.asarray(x + b.reshape(1, 1, 1, 3)), rtol=1e-6
    )
    # lrelu mode delegates to fused_leaky_relu
    np.testing.assert_allclose(
        np.asarray(fused_bias_act(x, b, act="lrelu")),
        np.asarray(fused_leaky_relu(x, b)),
        rtol=1e-6,
    )
    # differentiable to 2nd order in both modes (the CUDA grad/grad2 entries)
    for act in ("linear", "lrelu"):
        f = lambda v: jnp.sum(fused_bias_act(v, b, act=act) ** 2)
        gg = jax.grad(lambda v: jnp.sum(jax.grad(f)(v) ** 2))(x)
        assert gg.shape == x.shape and bool(jnp.all(jnp.isfinite(gg)))
    with pytest.raises(ValueError):
        fused_bias_act(x, b, act="selu")


@pytest.mark.parametrize(
    "up,down,pad",
    [(1, 2, (1, 1)), (2, 1, (2, 1)), (1, 1, (1, 1)), (2, 2, (2, 1))],
)
def test_upfirdn2d_matmul_matches_conv(up, down, pad):
    """The banded-matmul (MXU) formulation must agree with the dilated-conv
    formulation for separable kernels at every up/down/pad pattern DDGAN
    uses (both are golden-tested against the torch reference elsewhere)."""
    from ddgan_tpu.ops.upfirdn2d import upfirdn2d_matmul, upfirdn2d_ref

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    k1 = np.array([1.0, 3.0, 3.0, 1.0])
    k2 = jnp.asarray(np.outer(k1, k1) / np.outer(k1, k1).sum() * 1.7)
    ref = np.asarray(upfirdn2d_ref(x, k2, up=up, down=down, pad=pad))
    got = np.asarray(upfirdn2d_matmul(x, k2, up=up, down=down, pad=pad))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)

    # non-separable kernels fall back to the conv path
    k_ns = jnp.asarray(rng.rand(4, 4).astype(np.float32))
    ref2 = np.asarray(upfirdn2d_ref(x, k_ns, up=up, down=down, pad=pad))
    got2 = np.asarray(upfirdn2d_matmul(x, k_ns, up=up, down=down, pad=pad))
    np.testing.assert_allclose(got2, ref2, rtol=1e-6)


def test_upfirdn2d_matmul_grad_of_grad():
    """R1 needs second-order grads through the FIR path."""
    from ddgan_tpu.ops.upfirdn2d import upfirdn2d_matmul

    k1 = np.array([1.0, 3.0, 3.0, 1.0])
    k2 = jnp.asarray(np.outer(k1, k1) / np.outer(k1, k1).sum())
    x = jnp.asarray(np.random.RandomState(1).randn(1, 8, 8, 2).astype(np.float32))

    def f(v):
        return jnp.sum(upfirdn2d_matmul(v, k2, up=1, down=2, pad=(1, 1)) ** 3)

    g = jax.grad(f)(x)
    gg = jax.grad(lambda v: jnp.sum(jax.grad(f)(v) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all() and np.isfinite(np.asarray(gg)).all()
