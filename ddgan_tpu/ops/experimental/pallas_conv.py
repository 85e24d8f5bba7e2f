"""Pallas TPU kernel: paired-pixel 3×3 convolution for narrow-channel levels.

Why: the r3 celeba256 batch-8 profile showed the generator's 256²/128²
3×3 convs (C=64) running at 46-110 TFLOP/s while DiscriminatorLarge's
C≥128 convs hit ~190 — with only 64 output channels, half of the MXU's
128 lanes idle. XLA cannot widen N on its own (tried: an XLA-level
widened-kernel formulation regressed, tools/exp_conv256.py).

Formulation: view the padded input in PAIRED columns —
x_pp[b, h, J, p·C+c] = x_pad[b, h, 2J+p, c] (a pure reshape) — and emit
TWO adjacent output pixels as one 2·F=128-lane matmul row:

  y[b, h, 2j+p_out, f] = Σ_{ky,dj,p_in,c} x_pp[b, h+ky, j+dj, p_in·C+c]
                         · W6[(ky,dj), p_in·C+c, p_out·F+f]

where W6[(ky,dj)][p_in·C+c, p_out·F+f] = W3[ky, 2dj+p_in−p_out, c, f]
(zero when the tap 2dj+p_in−p_out ∉ [0,2]). The kernel runs 6
accumulating dot_generals per block — each M=(bh·W/2), K=2C, N=2F, all
MXU-aligned — at 4/3× the useful FLOPs but ~2× the lane utilization.
The halo rows are materialized by an XLA stack of shifted slices (grid
blocks can't overlap), which fuses with the pad.

Backward: custom_vjp — dx is the SAME paired kernel with the
spatially-flipped, transposed weights; dW/db fall back to XLA (weight
grads contract over B·H·W and are already efficient there).

MEASURED DISPOSITION (r3, v5e chip, kept for the record — this kernel
LOSES and stays gated off by default):
  * v1 (in-kernel 2-axis slices): celeba256 batch-8 step 229.1 ms vs
    175.8 XLA — Mosaic emitted a relayout per dot for the non-contiguous
    (bh, wp, 2C) slice-reshape.
  * v2 (this file: both column alignments staged outside, leading-axis
    slices only): isolated chained microbench (tools/exp_conv256.py,
    8×256²×64) fwd 2.94 ms/conv vs XLA conv 0.95 ms — still 3× slower.
    The residual cost is the pair/unpair LANE relayouts at the kernel
    boundary: the model keeps activations in 64-channel layout, so every
    call pays 64→128-lane repacking of a 67 MB tensor on the way in and
    the inverse on the way out, which exceeds the half-lane MXU waste it
    was built to recover. The XLA-level widened-kernel 'pair' variant
    loses the same way (1.12 vs 0.95 ms).
  Conclusion: for C=64 at 256², XLA's native conv (~41 TF/s isolated,
  46-61 TF/s fused in-model) IS the op-level ceiling on this hardware
  unless the whole level (convs + elementwise between them) is rewritten
  in paired layout — measured, documented, not pursued (est. ≤15 ms/step
  on a 175.8 ms step for a deeply invasive change).

Reference counterpart: the CUDA conv path this replaces is torch's cudnn
conv used throughout /root/reference/score_sde/models; no CUDA source to
mirror — this is a TPU-native formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def supported(x_shape, w_shape, dtype) -> bool:
    """Gate: square ≥128² maps, C_out=64 (the half-lane case), even C_in."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    n, h, w, c = x_shape
    kh, kw, ci, co = w_shape
    return (
        (kh, kw) == (3, 3)
        and ci == c
        and co == 64
        and c % 2 == 0
        and c <= 128
        and h == w
        and h >= 128
        and h % 32 == 0  # _pair_conv_raw tiles H in block_h=32 rows
        and dtype in (jnp.bfloat16, jnp.dtype("bfloat16"))
    )


def _widen_weights(w3: jnp.ndarray) -> jnp.ndarray:
    """[3,3,C,F] → [6, 2C, 2F] indexed by (ky·2+dj): the paired operator."""
    kh, kw, c, f = w3.shape
    w6 = jnp.zeros((6, 2 * c, 2 * f), w3.dtype)
    for ky in range(3):
        for dj in range(2):
            for p_in in range(2):
                for p_out in range(2):
                    dx = 2 * dj + p_in - p_out
                    if 0 <= dx <= 2:
                        w6 = w6.at[
                            ky * 2 + dj,
                            p_in * c : (p_in + 1) * c,
                            p_out * f : (p_out + 1) * f,
                        ].set(w3[ky, dx])
    return w6


def _pair_kernel(w_ref, b_ref, x0_ref, x1_ref, out_ref, acc_ref):
    """One (batch, H-block): 6 accumulating MXU dot_generals.

    x0/x1 blocks: (1, 1, bh+2, W/2, 2C) — padded rows with a 1-row halo
    each side; x0 holds the dj=0 column pairs, x1 the dj=1 pairs (shifted
    by one pair). Staging BOTH alignments outside the kernel means every
    in-kernel slice is on the LEADING axis only, so the (bh, wp, 2C) →
    (bh·wp, 2C) reshape is a free contiguous view — the v1 kernel sliced
    the second axis too (xv[ky:ky+bh, dj:dj+wp]) and Mosaic emitted a
    relayout copy per dot, which is why v1 LOST end-to-end (229 vs 176
    ms/step).
    out block:   (1, 1, bh, W/2, 2F).
    """
    bh = out_ref.shape[2]
    wp = out_ref.shape[3]          # W/2 output pairs
    c2 = x0_ref.shape[-1]          # 2C
    f2 = out_ref.shape[-1]         # 2F = 128
    x0 = x0_ref[0, 0]              # (bh+2, W/2, 2C)
    x1 = x1_ref[0, 0]

    acc_ref[...] = jnp.broadcast_to(
        b_ref[...].reshape(1, f2), (bh * wp, f2)
    ).astype(jnp.float32)
    for ky in range(3):
        for dj, xv in ((0, x0), (1, x1)):
            a = xv[ky : ky + bh].reshape(bh * wp, c2)
            acc_ref[...] += jax.lax.dot_general(
                a,
                w_ref[ky * 2 + dj],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    out_ref[0, 0] = acc_ref[...].reshape(bh, wp, f2).astype(out_ref.dtype)


def _pair_conv_raw(
    x: jnp.ndarray, w6: jnp.ndarray, bias2: jnp.ndarray, block_h: int = 32
) -> jnp.ndarray:
    """x (B,H,W,C) bf16 → (B,H,W,F=64); w6 (6,2C,128), bias2 (128,)."""
    n, h, w, c = x.shape
    f2 = w6.shape[-1]
    bh = min(block_h, h)
    n_hb = h // bh
    wp = w // 2

    # pad + both pair alignments + halo-stack (XLA side, fuses with the
    # pad): x0 pairs padded cols (2j, 2j+1), x1 pairs (2j+2, 2j+3)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x0 = xp[:, :, : w, :].reshape(n, h + 2, wp, 2 * c)
    x1 = xp[:, :, 2 :, :].reshape(n, h + 2, wp, 2 * c)

    def stack_h(v):
        return jnp.stack(
            [v[:, i * bh : i * bh + bh + 2] for i in range(n_hb)], axis=1
        )  # (B, n_hb, bh+2, W/2, 2C)

    xblk = pl.BlockSpec(
        (1, 1, bh + 2, wp, 2 * c),
        lambda i, j: (i, j, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        _pair_kernel,
        out_shape=jax.ShapeDtypeStruct((n, n_hb, bh, wp, f2), x.dtype),
        grid=(n, n_hb),
        in_specs=[
            pl.BlockSpec(
                (6, 2 * c, f2), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, f2), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            xblk,
            xblk,
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bh, wp, f2),
            lambda i, j: (i, j, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((bh * wp, f2), jnp.float32)],
        interpret=_interpret(),
    )(w6, bias2, stack_h(x0), stack_h(x1))
    return out.reshape(n, h, w, f2 // 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def pair_conv3x3(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """3×3 same-pad conv (NHWC · HWIO + bias) via the paired-pixel kernel."""
    w6 = _widen_weights(w.astype(x.dtype))
    bias2 = jnp.concatenate([b, b]).astype(jnp.float32).reshape(1, -1)
    return _pair_conv_raw(x, w6, bias2)


def _ref_conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(y.dtype)


def _fwd(x, w, b):
    return pair_conv3x3(x, w, b), (x, w)


def _bwd(res, g):
    x, w = res
    # dx: correlate g with the flipped kernel, in/out channels swapped —
    # same shape class (C_out = C of x may be 128; the pair kernel needs
    # C_out=64) → use the pair kernel when it qualifies, XLA otherwise.
    w_flip = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)  # (3,3,F,C)
    zeros = jnp.zeros((w_flip.shape[-1],), jnp.float32)
    if supported(g.shape, w_flip.shape, g.dtype):
        dx = pair_conv3x3(g, w_flip, zeros)
    else:
        dx = _ref_conv(g, w_flip.astype(g.dtype), zeros)
    # dW, db via XLA (contraction over B·H·W — efficient as-is); keep the
    # conv math in the activation dtype, cotangent flows back to w.dtype
    _, vjp = jax.vjp(
        lambda w_: _ref_conv(x, w_.astype(x.dtype), jnp.zeros((), x.dtype)), w
    )
    (dw,) = vjp(g)
    db = g.astype(jnp.float32).sum(axis=(0, 1, 2))
    return dx, dw, db


pair_conv3x3.defvjp(_fwd, _bwd)
