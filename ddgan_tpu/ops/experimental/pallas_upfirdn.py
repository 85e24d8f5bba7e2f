"""Pallas TPU kernels for the hot upfirdn2d specializations.

The reference ships 6 CUDA tile-scheduler specializations
(upfirdn2d_kernel.cu:247-368); on TPU the two patterns that actually run
hot in DDGAN are the separable 4-tap FIR at factor 2:

  * down2x: up=1, down=2, pad=(1,1)   (downsample_2d, discriminator path)
  * up2x:   up=2, down=1, pad=(2,1)   (upsample_2d, generator up path)

Design v2 (round 2): the same banded-matmul formulation that made the XLA
path win (ops/upfirdn2d.upfirdn2d_matmul) — out = Mh · X · Mwᵀ with banded
operator matrices per axis — but with BOTH matmuls fused into one kernel,
so the (H_out, W, C) intermediate lives in VMEM instead of making an HBM
round-trip. Both contractions run on the MXU (jnp.dot with lane-aligned
(axis, rest·C) operands); the only VPU work is two sublane transposes of
the intermediate. The round-1 polyphase VPU kernels (phase-split reshapes
→ Mosaic relayouts, measured 87-160 GB/s) are superseded.

Grid: (N, C-blocks); each program handles a full (H, W, Cb) slab — the
DDGAN resolutions (≤64² at FIR sites for the shipped recipes, 16/8/4 after
downs) fit VMEM comfortably. Larger slabs fall back to XLA via the
dispatcher in ops.upfirdn2d.

Gradients: wrapped in jax.custom_vjp. The VJP of upfirdn(up,down,pad) is
upfirdn(down,up,g_pad) with the flipped kernel (g_pad math from the
reference, upfirdn2d.py:119-124), expressed through the SAME dispatcher —
so the backward also hits Pallas, and because it is itself built from
differentiable ops the R1 grad-of-grad works to arbitrary order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """Run in interpreter mode off-TPU (CPU correctness tests)."""
    return jax.default_backend() != "tpu"


def _cb(c: int) -> int:
    """Channel block: multiples of 128 lanes when possible."""
    if c % 128 == 0:
        return 128
    return c


# --------------------------------------------------------------------------
# fused separable upfirdn: one VMEM round-trip, two MXU banded matmuls
def _sep_mxu_kernel(mh_ref, mw_ref, x_ref, out_ref):
    x = x_ref[0]                                    # (H, W, Cb)
    mh = mh_ref[...]                                # (Ho, H)
    mw = mw_ref[...]                                # (Wo, W)
    # Columns first, then rows, both as dot_generals contracting the
    # MIDDLE dim of the image operand — the output of each pass lands
    # directly in (new_axis, other_axis, C) order, so NO transposes or
    # relayouts are needed anywhere:
    #   s[wo,h,c] = Σ_w mw[wo,w] x[h,w,c]
    #   o[ho,wo,c] = Σ_h mh[ho,h] s[wo,h,c]
    s = jax.lax.dot_general(
        mw, x, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                               # (Wo, H, Cb)
    o = jax.lax.dot_general(
        mh, s, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                               # (Ho, Wo, Cb)
    out_ref[0] = o.astype(out_ref.dtype)


def _sep_mxu_pallas(
    x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray
) -> jnp.ndarray:
    n, h, w, c = x.shape
    ho, wo = mh.shape[0], mw.shape[0]
    cb = _cb(c)
    mh_a = jnp.asarray(mh, x.dtype)
    mw_a = jnp.asarray(mw, x.dtype)
    return pl.pallas_call(
        _sep_mxu_kernel,
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, c), x.dtype),
        grid=(n, c // cb),
        in_specs=[
            pl.BlockSpec((ho, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wo, w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, h, w, cb), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, ho, wo, cb), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
        ),
        interpret=_interpret(),
    )(mh_a, mw_a, x)


def _down2x_pallas(x: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    """x: (N, H, W, C) with H, W even; k: 4-tap 1-D kernel (row of the
    separable 2-D FIR), applied as TRUE convolution (band matrices are
    built from the flipped kernel, matching upfirdn2d_ref)."""
    from ..upfirdn2d import _fir_matrix

    n, h, w, c = x.shape
    mh = _fir_matrix(h, 1, 2, 1, 1, k)
    mw = _fir_matrix(w, 1, 2, 1, 1, k)
    return _sep_mxu_pallas(x, mh, mw)


def _up2x_pallas(x: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    """Fused separable FIR upsample by 2 (up=2, down=1, pad=(2,1))."""
    from ..upfirdn2d import _fir_matrix

    n, h, w, c = x.shape
    mh = _fir_matrix(h, 2, 1, 2, 1, k)
    mw = _fir_matrix(w, 2, 1, 2, 1, k)
    return _sep_mxu_pallas(x, mh, mw)


# --------------------------------------------------------------------------
# differentiable wrappers: VJP = transposed FIR via the XLA dispatcher
# (itself differentiable → R1 grad-of-grad works)
def _xla_upfirdn(x, kernel2d, up, down, pad):
    from ..upfirdn2d import upfirdn2d_ref

    return upfirdn2d_ref(x, kernel2d, up=up, down=down, pad=pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def down2x(x, k1d):
    """Fused separable FIR downsample by 2 (up=1, down=2, pad=(1,1))."""
    return _down2x_pallas(x, np.asarray(k1d))


def _down2x_fwd(x, k1d):
    return down2x(x, k1d), x.shape


def _down2x_bwd(k1d, shape, g):
    # grad of upfirdn(up=1,down=2,pad=(1,1)) = upfirdn(up=2,down=1,
    # g_pad=(k-pad0-1, in*up - out*down + pad0 - up + 1)) with flipped k
    # (reference upfirdn2d.py:119-124); for the 4-tap/factor-2 case
    # g_pad = (2, 1) — exactly the up2x pattern with the flipped kernel.
    k = np.asarray(k1d, np.float32)
    k2 = np.outer(k, k)
    kflip = jnp.asarray(k2[::-1, ::-1])
    dx = _xla_upfirdn(g, kflip, up=2, down=1, pad=(2, 1))
    return (dx,)


down2x.defvjp(_down2x_fwd, _down2x_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def up2x(x, k1d):
    """Fused separable FIR upsample by 2 (up=2, down=1, pad=(2,1))."""
    return _up2x_pallas(x, np.asarray(k1d))


def _up2x_fwd(x, k1d):
    return up2x(x, k1d), x.shape


def _up2x_bwd(k1d, shape, g):
    # grad of upfirdn(up=2,down=1,pad=(2,1)) = upfirdn(up=1,down=2,
    # g_pad=(k-pad0-1, ...)) = the down2x pattern with flipped kernel:
    # g_pad0 = 4-2-1 = 1, g_pad1 = in*1 - out*2 + 2 - 1 + ... = 1.
    k = np.asarray(k1d, np.float32)
    k2 = np.outer(k, k)
    kflip = jnp.asarray(k2[::-1, ::-1])
    dx = _xla_upfirdn(g, kflip, up=1, down=2, pad=(1, 1))
    return (dx,)


up2x.defvjp(_up2x_fwd, _up2x_bwd)


def fits_vmem(n, h, w, c, dtype, budget_bytes=14 * 1024 * 1024) -> bool:
    """Conservative VMEM check for the fused MXU kernel, sized for the
    worst case (up2x): DOUBLE-buffered input and output DMA blocks (the
    grid pipeline keeps two of each in flight), the two dot_general
    intermediates s (Wo·H·Cb = 2HWC) and o (Ho·Wo·Cb = 4HWC) in f32
    REGARDLESS of input dtype (preferred_element_type), the band
    matrices, with 1.3x headroom for Mosaic temporaries."""
    cb = _cb(c)
    itemsize = jnp.dtype(dtype).itemsize
    slab = h * w * cb
    # band matrices: mh (Ho, H) and mw (W, Wo) in f32, worst case up2x
    bands = (2 * h) * h * 4 + w * (2 * w) * 4
    need = (
        2 * slab * itemsize      # input block, double-buffered DMA
        + 2 * slab * 4           # s  (up to 2HWC, f32)
        + 4 * slab * 4           # o  (up to 4HWC, f32)
        + 2 * 4 * slab * itemsize  # output block (up to 4HWC), double-buffered
        + bands
    )
    return need * 1.3 < budget_bytes
