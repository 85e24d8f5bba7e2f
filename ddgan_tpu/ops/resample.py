"""StyleGAN2-style FIR resampling built on `upfirdn2d` (NHWC, TPU-native).

Reference semantics: score_sde/models/up_or_down_sampling.py. The fused
up/down convolutions are re-expressed with `lax.conv_general_dilated`
(transposed conv == lhs-dilated conv) instead of torch's conv_transpose2d.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from .upfirdn2d import upfirdn2d


def _pallas_fir_enabled() -> bool:
    """Pallas path for the 2x separable FIR patterns (DDGAN_TPU_PALLAS_FIR
    = '1' to enable).

    MEASURED OFF by default: on v5e the banded-matmul default measures
    220 GB/s at the (64,32,32,128) roundtrip vs 203 for the round-2 fused
    Pallas MXU kernel (a tie within the ~±8% run spread at the smaller
    shapes; round-1's polyphase VPU kernels were at 87-160). See
    bench_ops.py. The kernels live under ops/experimental and stay
    golden-tested for future tuning.
    """
    import os

    return os.environ.get("DDGAN_TPU_PALLAS_FIR", "0") == "1"


def _pallas_2x_ok(x, k1d) -> bool:
    from .experimental import pallas_upfirdn

    n, h, w, c = x.shape
    return (
        len(k1d) == 4
        and h % 2 == 0
        and w % 2 == 0
        and (c % 128 == 0 or c <= 512)
        and pallas_upfirdn.fits_vmem(n, h, w, c, x.dtype)
    )


def setup_kernel(k) -> np.ndarray:
    """Normalize a 1-D (separable) or 2-D FIR kernel to sum 1.

    Reference: up_or_down_sampling.py:186-193 `_setup_kernel`.
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / np.sum(k)
    assert k.ndim == 2 and k.shape[0] == k.shape[1]
    return k


def naive_upsample_2d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbour upsample (NHWC). Reference: up_or_down_sampling.py:64-68."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, 1, w, 1, c)
    x = jnp.tile(x, (1, 1, factor, 1, factor, 1))
    return x.reshape(n, h * factor, w * factor, c)


def naive_downsample_2d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Mean-pool downsample (NHWC). Reference: up_or_down_sampling.py:71-74."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    return jnp.mean(x, axis=(2, 4))


def upsample_2d(x: jnp.ndarray, k=None, factor: int = 2, gain: float = 1.0) -> jnp.ndarray:
    """FIR upsample by `factor` (NHWC). Reference: up_or_down_sampling.py:200-229."""
    assert isinstance(factor, int) and factor >= 1
    if k is None:
        k = [1] * factor
    k1d = np.asarray(k, np.float64)
    if (
        factor == 2
        and k1d.ndim == 1
        and _pallas_fir_enabled()
        and _pallas_2x_ok(x, k1d)
    ):
        from .experimental.pallas_upfirdn import up2x

        # separable: outer(k,k)/sum * gain*4 == outer(k', k') with
        # k' = k/sum(k) * sqrt(gain)*2
        k_sep = tuple((k1d / k1d.sum() * (gain**0.5) * factor).tolist())
        return up2x(x, k_sep)
    k = setup_kernel(k) * (gain * (factor**2))
    p = k.shape[0] - factor
    return upfirdn2d(
        x,
        jnp.asarray(k),
        up=factor,
        pad=((p + 1) // 2 + factor - 1, p // 2),
    )


def downsample_2d(x: jnp.ndarray, k=None, factor: int = 2, gain: float = 1.0) -> jnp.ndarray:
    """FIR downsample by `factor` (NHWC). Reference: up_or_down_sampling.py:232-262."""
    assert isinstance(factor, int) and factor >= 1
    if k is None:
        k = [1] * factor
    k1d = np.asarray(k, np.float64)
    if (
        factor == 2
        and k1d.ndim == 1
        and _pallas_fir_enabled()
        and _pallas_2x_ok(x, k1d)
    ):
        from .experimental.pallas_upfirdn import down2x

        k_sep = tuple((k1d / k1d.sum() * (gain**0.5)).tolist())
        return down2x(x, k_sep)
    k = setup_kernel(k) * gain
    p = k.shape[0] - factor
    return upfirdn2d(x, jnp.asarray(k), down=factor, pad=((p + 1) // 2, p // 2))


def upsample_conv_2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    k=None,
    factor: int = 2,
    gain: float = 1.0,
) -> jnp.ndarray:
    """Fused upsample + conv2d (NHWC x, HWIO w).

    Reference: up_or_down_sampling.py:77-146 (conv_transpose2d + upfirdn2d).
    NOTE: the reference passes a 4-element stride to conv_transpose2d, which
    raises in torch — that path is dead code under shipped configs. This
    implements the original StyleGAN2 intent: transposed conv with
    stride=factor, which (after the reference's double spatial flip cancels)
    is exactly a cross-correlation of the factor-dilated input with the
    original kernel under full (kh-1) padding — one XLA op.
    """
    assert isinstance(factor, int) and factor >= 1
    kh, kw, in_c, out_c = w.shape
    assert kh == kw

    if k is None:
        k = [1] * factor
    k = setup_kernel(k) * (gain * (factor**2))
    p = (k.shape[0] - factor) - (kw - 1)

    out = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return upfirdn2d(
        out,
        jnp.asarray(k),
        pad=((p + 1) // 2 + factor - 1, p // 2 + 1),
    )


def conv_downsample_2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    k=None,
    factor: int = 2,
    gain: float = 1.0,
) -> jnp.ndarray:
    """Fused conv2d + downsample (NHWC x, HWIO w).

    Reference: up_or_down_sampling.py:149-183 (upfirdn2d + strided conv).
    """
    assert isinstance(factor, int) and factor >= 1
    kh, kw, _, _ = w.shape
    assert kh == kw
    if k is None:
        k = [1] * factor
    k = setup_kernel(k) * gain
    p = (k.shape[0] - factor) + (kw - 1)
    x = upfirdn2d(x, jnp.asarray(k), pad=((p + 1) // 2, p // 2))
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(factor, factor),
        padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
