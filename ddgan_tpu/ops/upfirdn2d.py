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


def _fir_matrix(n_in: int, up: int, down: int, p0: int, p1: int, taps) -> "np.ndarray":
    """Banded operator matrix M (n_out, n_in) of 1-D upfirdn:
    out[o] = sum_i M[o, i] * x[i], with M[o, i] = kf[i*up + p0 - o*down]
    (kf = flipped kernel; entry 0 when the tap index is out of range)."""
    import numpy as np

    k = len(taps)
    kf = np.asarray(taps, np.float64)[::-1]
    n_out = (n_in * up + p0 + p1 - k) // down + 1
    M = np.zeros((n_out, n_in), np.float32)
    for o in range(n_out):
        # t = i*up + p0 - o*down in [0, k) → i in [ceil((o*d - p0)/u), ...]
        for i in range(n_in):
            t = i * up + p0 - o * down
            if 0 <= t < k:
                M[o, i] = kf[t]
    return M


def _separable_factors(kernel) -> tuple["np.ndarray", "np.ndarray"] | None:
    """Rank-1 (separable) factorization k2d = outer(ky, kx), or None.

    DDGAN's FIR kernels are all built as outer products of a 1-D window
    (up_or_down_sampling.py:186-193), so this always succeeds on the hot
    paths; exact to fp tolerance via SVD."""
    import numpy as np

    k = np.asarray(kernel, np.float64)
    if k.ndim != 2:
        return None
    u, s, vt = np.linalg.svd(k)
    if s[0] == 0.0 or (len(s) > 1 and s[1] > 1e-10 * s[0]):
        return None
    ky = u[:, 0] * np.sqrt(s[0])
    kx = vt[0] * np.sqrt(s[0])
    if ky.sum() < 0:  # sign convention: positive-sum factors
        ky, kx = -ky, -kx
    return ky, kx


def upfirdn2d_matmul(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up=1,
    down=1,
    pad=(0, 0),
) -> jnp.ndarray:
    """Separable upfirdn2d as two banded MATMULS (MXU formulation).

    out[n,ho,wo,c] = Σ_{hi,wi} Mh[ho,hi] · Mw[wo,wi] · x[n,hi,wi,c] — the
    1-D up/filter/down pipelines become dense banded operator matrices
    contracted on the MXU, instead of a strided depthwise conv on the VPU.
    Exactly linear in x and built from dot_generals, so it differentiates
    to arbitrary order (R1 grad-of-grad safe). Falls back to the dilated
    conv for non-separable kernels.
    """
    import numpy as np

    try:  # kernel must be concrete (host constant) to factorize
        factors = _separable_factors(np.asarray(kernel))
    except (TypeError, jax.errors.TracerArrayConversionError):
        factors = None
    if factors is None:
        return upfirdn2d_ref(x, kernel, up=up, down=down, pad=pad)
    ky, kx = factors
    up_y, up_x = _as_pair(up)
    down_y, down_x = _as_pair(down)
    if len(pad) == 2:
        pad_x0, pad_x1 = int(pad[0]), int(pad[1])
        pad_y0, pad_y1 = int(pad[0]), int(pad[1])
    else:
        pad_x0, pad_x1, pad_y0, pad_y1 = (int(p) for p in pad)

    n, h, w, c = x.shape
    Mh = jnp.asarray(_fir_matrix(h, up_y, down_y, pad_y0, pad_y1, ky), x.dtype)
    Mw = jnp.asarray(_fir_matrix(w, up_x, down_x, pad_x0, pad_x1, kx), x.dtype)
    # contract H then W; (w*c) resp. (n*h_out) ride the MXU lanes
    tmp = jnp.einsum("oh,nhwc->nowc", Mh, x,
                     preferred_element_type=x.dtype)
    out = jnp.einsum("pw,nowc->nopc", Mw, tmp,
                     preferred_element_type=x.dtype)
    return out


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up=1,
    down=1,
    pad=(0, 0),
) -> jnp.ndarray:
    """Fused upsample-FIR-downsample (NHWC). Public entry point.

    Dispatch (measured on v5e, bench_ops.py chained-roundtrip timing):
    separable kernels take the banded-MATMUL MXU formulation; non-separable
    or traced kernels fall back to the dilated-conv formulation. At the
    (64,32,32,128) up/down roundtrip matmul/conv/Pallas measure
    220/218/203 GB/s (round-2 numbers; run-to-run spread is ~±8%) — the
    fused Pallas MXU kernel in ops/experimental/pallas_upfirdn (v2,
    transpose-free dot_generals) ties within noise but does not win, so
    it stays gated behind DDGAN_TPU_PALLAS_FIR=1. All three share these
    exact semantics and are golden-tested against each other and the
    torch reference.
    """
    return upfirdn2d_matmul(x, kernel, up=up, down=down, pad=pad)


def upfirdn2d_nchw(x, kernel, up=1, down=1, pad=(0, 0)):
    """NCHW convenience wrapper (reference layout) for parity tests."""
    x = jnp.transpose(x, (0, 2, 3, 1))
    out = upfirdn2d(x, kernel, up=up, down=down, pad=pad)
    return jnp.transpose(out, (0, 3, 1, 2))
