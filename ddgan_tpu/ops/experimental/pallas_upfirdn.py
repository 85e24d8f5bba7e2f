"""Pallas TPU kernels for the hot upfirdn2d specializations.

The reference ships 6 CUDA tile-scheduler specializations
(upfirdn2d_kernel.cu:247-368); on TPU the two patterns that actually run
hot in DDGAN are the separable 4-tap FIR at factor 2:

  * down2x: up=1, down=2, pad=(1,1)   (downsample_2d, discriminator path)
  * up2x:   up=2, down=1, pad=(2,1)   (upsample_2d, generator up path)

Design: ONE VMEM round-trip per image block — pad in VMEM, filter rows
then columns (separable: 2x4 MACs instead of 16 per output), polyphase
decomposition for the up path (each output phase is a 2-tap filter, no
zero-stuffing materialized). The XLA dilated-conv formulation
(ops/upfirdn2d.py) issues the same math as a depthwise conv through HBM;
fusing both passes and the pad into one kernel halves HBM traffic on this
bandwidth-bound op.

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
# down2x: out[i] = sum_t k[t] * xpad[2i + t], pad=(1,1), separable
def _down2x_kernel(x_ref, out_ref, *, kvec):
    """Strided taps expressed as contiguous reshape phase-splits (Mosaic
    lowers strided slices as unsupported gathers)."""
    x = x_ref[0]  # (H, W, Cb)
    h, w, cb = x.shape
    xp = jnp.pad(x, ((1, 1), (0, 0), (0, 0)))
    # rows: r[i] = k0 xp[2i] + k1 xp[2i+1] + k2 xp[2i+2] + k3 xp[2i+3]
    a = xp[0:h].reshape(h // 2, 2, w, cb)          # a[:,0]=xp[2i], a[:,1]=xp[2i+1]
    bb = xp[2 : h + 2].reshape(h // 2, 2, w, cb)   # b[:,0]=xp[2i+2], b[:,1]=xp[2i+3]
    r = (
        kvec[0] * a[:, 0]
        + kvec[1] * a[:, 1]
        + kvec[2] * bb[:, 0]
        + kvec[3] * bb[:, 1]
    )
    rp = jnp.pad(r, ((0, 0), (1, 1), (0, 0)))
    aw = rp[:, 0:w].reshape(h // 2, w // 2, 2, cb)
    bw = rp[:, 2 : w + 2].reshape(h // 2, w // 2, 2, cb)
    out = (
        kvec[0] * aw[:, :, 0]
        + kvec[1] * aw[:, :, 1]
        + kvec[2] * bw[:, :, 0]
        + kvec[3] * bw[:, :, 1]
    )
    out_ref[0] = out.astype(out_ref.dtype)


def _down2x_pallas(x: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    """x: (N, H, W, C) with H, W even; k: 4-tap 1-D kernel (row of the
    separable 2-D FIR). upfirdn semantics are TRUE convolution, and the
    kernel taps multiply xp[2i + t] — so the tap vector is the FLIPPED
    kernel (matches upfirdn2d_ref's cross-correlation with flip(k))."""
    n, h, w, c = x.shape
    cb = _cb(c)
    kvec = tuple(float(v) for v in np.asarray(k, np.float64)[::-1])
    kernel = functools.partial(_down2x_kernel, kvec=kvec)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w // 2, c), x.dtype),
        grid=(n, c // cb),
        in_specs=[
            pl.BlockSpec(
                (1, h, w, cb), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, h // 2, w // 2, cb), lambda i, j: (i, 0, 0, j),
            memory_space=pltpu.VMEM,
        ),
        interpret=_interpret(),
    )(x)


# --------------------------------------------------------------------------
# up2x: polyphase — out[2m] = k[0] x[m-1] + k[2] x[m];
#                   out[2m+1] = k[1] x[m] + k[3] x[m+1]
def _up2x_kernel(x_ref, out_ref, *, kvec):
    x = x_ref[0]  # (H, W, Cb)
    h, w, cb = x.shape
    xp = jnp.pad(x, ((1, 1), (0, 0), (0, 0)))
    even = kvec[0] * xp[0:h] + kvec[2] * xp[1 : h + 1]
    odd = kvec[1] * xp[1 : h + 1] + kvec[3] * xp[2 : h + 2]
    r = jnp.stack([even, odd], axis=1).reshape(2 * h, w, cb)

    rp = jnp.pad(r, ((0, 0), (1, 1), (0, 0)))
    even_w = kvec[0] * rp[:, 0:w] + kvec[2] * rp[:, 1 : w + 1]
    odd_w = kvec[1] * rp[:, 1 : w + 1] + kvec[3] * rp[:, 2 : w + 2]
    out = jnp.stack([even_w, odd_w], axis=2).reshape(2 * h, 2 * w, cb)
    out_ref[0] = out.astype(out_ref.dtype)


def _up2x_pallas(x: jnp.ndarray, k: np.ndarray) -> jnp.ndarray:
    """Polyphase taps derived for true convolution: with kf = flip(k),
    out[2m] = kf[0] x[m-1] + kf[2] x[m]; out[2m+1] = kf[1] x[m] + kf[3] x[m+1]."""
    n, h, w, c = x.shape
    cb = _cb(c)
    kvec = tuple(float(v) for v in np.asarray(k, np.float64)[::-1])
    kernel = functools.partial(_up2x_kernel, kvec=kvec)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), x.dtype),
        grid=(n, c // cb),
        in_specs=[
            pl.BlockSpec(
                (1, h, w, cb), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * h, 2 * w, cb), lambda i, j: (i, 0, 0, j),
            memory_space=pltpu.VMEM,
        ),
        interpret=_interpret(),
    )(x)


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
    """Conservative check. Mosaic materializes ~8-10 block-sized
    temporaries for these kernels (pad/phase-split/accumulate chains), so
    the multiplier is 10x the input slab (empirically a (1,64,64,128) f32
    slab OOMs the 16M scoped vmem)."""
    cb = _cb(c)
    itemsize = jnp.dtype(dtype).itemsize
    return (h + 2) * (w + 2) * cb * itemsize * 10 < budget_bytes
