"""upfirdn2d — upsample, FIR filter, downsample in one fused op (TPU-native).

Semantics match the reference CUDA kernel's golden CPU model
(score_sde/op/upfirdn2d.py:184-225 `upfirdn2d_native`):

    1. zero-stuff: insert `up - 1` zeros after every input sample (per axis)
    2. zero-pad by (pad0, pad1) per axis (negative pads crop)
    3. convolve with the 2-D FIR `kernel` (true convolution, i.e.
       cross-correlation with the flipped kernel)
    4. keep every `down`-th sample

    out_size = (in * up + pad0 + pad1 - k) // down + 1

TPU design: instead of translating the CUDA tile scheduler, the whole op is
expressed as ONE `lax.conv_general_dilated` — `lhs_dilation` performs the
zero-stuffing, the conv `padding` absorbs both the user pad and the
trailing dilation fix-up, and `window_strides` performs the down-sampling.
XLA lowers this to a fused depthwise conv; it is differentiable to arbitrary
order, which the R1 gradient penalty requires (grad-of-grad through the
discriminator's FIR downsampling; reference relied on a hand-written
double-backward, upfirdn2d.py:27-150).

Layout is NHWC (TPU-native). Inputs of any channel count share one 2-D FIR
kernel (depthwise, feature_group_count=C).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _as_pair(v) -> tuple[int, int]:
    if isinstance(v, (tuple, list)):
        if len(v) == 1:
            return (int(v[0]), int(v[0]))
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def upfirdn2d_ref(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up=1,
    down=1,
    pad=(0, 0),
) -> jnp.ndarray:
    """Reference XLA implementation (NHWC).

    Args:
      x: (N, H, W, C) input.
      kernel: (kh, kw) 2-D FIR filter, applied depthwise to every channel.
      up: int or (up_y, up_x) upsampling factor.
      down: int or (down_y, down_x) downsampling factor.
      pad: (pad0, pad1) applied to both spatial axes, or
           (pad_x0, pad_x1, pad_y0, pad_y1).

    Returns:
      (N, H_out, W_out, C) with H_out = (H*up_y + pad_y0 + pad_y1 - kh)//down_y + 1.
    """
    up_y, up_x = _as_pair(up)
    down_y, down_x = _as_pair(down)
    if len(pad) == 2:
        pad_x0, pad_x1 = int(pad[0]), int(pad[1])
        pad_y0, pad_y1 = int(pad[0]), int(pad[1])
    else:
        pad_x0, pad_x1, pad_y0, pad_y1 = (int(p) for p in pad)

    n, h, w, c = x.shape
    kh, kw = kernel.shape
    kernel = kernel.astype(x.dtype)

    # True convolution == cross-correlation with the flipped kernel.
    k = jnp.flip(kernel, (0, 1))
    rhs = jnp.tile(k[:, :, None, None], (1, 1, 1, c))

    # lhs_dilation zero-stuffs BETWEEN samples: length (h-1)*up + 1. The
    # reference stuffs AFTER each sample (length h*up), so the missing
    # (up - 1) trailing zeros are folded into the high-side padding.
    padding = (
        (pad_y0, pad_y1 + up_y - 1),
        (pad_x0, pad_x1 + up_x - 1),
    )

    out = lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(down_y, down_x),
        padding=padding,
        lhs_dilation=(up_y, up_x),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up=1,
    down=1,
    pad=(0, 0),
) -> jnp.ndarray:
    """Fused upsample-FIR-downsample (NHWC). Public entry point.

    Uses the XLA dilated-conv formulation (measured faster than the
    hand-written Pallas kernels on v5e — see ops/resample.py dispatcher
    and ddgan_tpu.ops.pallas_upfirdn for the gated Pallas 2x paths; both
    share these exact semantics and are golden-tested against each other).
    """
    return upfirdn2d_ref(x, kernel, up=up, down=down, pad=pad)


def upfirdn2d_nchw(x, kernel, up=1, down=1, pad=(0, 0)):
    """NCHW convenience wrapper (reference layout) for parity tests."""
    x = jnp.transpose(x, (0, 2, 3, 1))
    out = upfirdn2d(x, kernel, up=up, down=down, pad=pad)
    return jnp.transpose(out, (0, 3, 1, 2))
