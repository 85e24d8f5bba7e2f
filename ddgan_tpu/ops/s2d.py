"""Width-only space-to-depth conv formulation for small-C levels.

Motivation (measured, r3→r4): the 256²/128² generator levels run at C=64
— half the MXU's 128 lanes — and XLA's 3×3 conv ceiling for that shape
is 46-61 TFLOP/s vs ~190 for C≥128 (tools/exp_conv256.py). Packing
adjacent WIDTH pixel pairs into channels maps those levels onto
[3,3,2C,2C] convs at (H, W/2) spatial — 2C = 128 lanes exactly — whose
algebra reproduces the original conv EXACTLY (weights are a sparse
scatter of the 3×3 kernel, so parameters/checkpoints are unchanged and
the transform is applied inside the step). Dense FLOPs inflate 2×
(the widened kernel is half zeros), but lane-full convs run ~3-4×
faster per dense FLOP at this shape, netting ~1.5-2×.

Full 2×2 space-to-depth would inflate dense FLOPs 4× (kernel 3×3 over
blocks, 1/4 dense) for the same lane-filling — width-only is the right
granularity at C=64.

The layout is CLOSED under 3×3 stride-1 convs (output layout == input
layout), so whole stages chain with ZERO per-kernel relayout — the
measured killer of the r3 paired-pixel Pallas kernels
(ops/experimental/pallas_conv.py). Entering/leaving the layout is a
free reshape on NHWC.

Layout convention: packed channel index = dj*C + c, dj ∈ {0,1} the
width sub-position (reshape (B,H,W/2,2,C) → (B,H,W/2,2C) gives exactly
this).

Reference surface this accelerates: the 3×3 convs of
ncsnpp_generator_adagn.py ResnetBlockBigGANpp_Adagn at image_size 256
(readme.md 256² recipes).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def s2d_width(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) → (B, H, W/2, 2C), channel = dj*C + c. Free reshape."""
    b, h, w, c = x.shape
    assert w % 2 == 0, w
    return x.reshape(b, h, w // 2, 2 * c)


def un_s2d_width(y: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W', 2C) → (B, H, 2W', C). Inverse of s2d_width."""
    b, h, wp, c2 = y.shape
    assert c2 % 2 == 0, c2
    return y.reshape(b, h, wp * 2, c2 // 2)


def widen_s2d_kernel(w3, out_dtype=None):
    """HWIO [3,3,C,F] → s2d-width HWIO [3,3,2C,2F].

    Derivation: the original output pixel O[y, 2x'+eo, f] reads input
    column 2x'+eo+kx-1 = 2(x'+q)+dj, i.e. kx = 2q + dj - eo + 1.
    For every (eo, kx) exactly one (q, dj) is valid, so the widened
    kernel holds each original tap once and is half zeros:

        w'[ky, q+1, dj*C+c, eo*F+f] = w3[ky, 2q+dj-eo+1, c, f]
                                       (0 where kx ∉ [0,2])

    A stride-1 pad-(1,1) conv with w' on the s2d layout equals the
    original conv exactly (the padded block column only contributes its
    in-range sub-pixel, which the zero pattern selects).

    Works on np or jnp arrays; differentiable (pure gather/pad), so the
    underlying [3,3,C,F] parameters keep training unchanged.
    """
    xp = jnp if isinstance(w3, jnp.ndarray) else np
    kh, kw, c, f = w3.shape
    assert (kh, kw) == (3, 3), w3.shape
    blocks = []
    for q in (-1, 0, 1):
        cols = []
        for eo in (0, 1):
            rows = []
            for dj in (0, 1):
                kx = 2 * q + dj - eo + 1
                if 0 <= kx <= 2:
                    rows.append(w3[:, kx])  # (3, C, F)
                else:
                    rows.append(xp.zeros_like(w3[:, 0]))
            cols.append(xp.concatenate(rows, axis=1))  # (3, 2C, F)
        blocks.append(xp.concatenate(cols, axis=2))  # (3, 2C, 2F)
    out = xp.stack(blocks, axis=1)  # (3, 3, 2C, 2F)
    if out_dtype is not None:
        out = out.astype(out_dtype)
    return out


def widen_s2d_kernel_stride2(w3, out_dtype=None):
    """HWIO [3,3,C,F] → s2d-width stride-(2,2) kernel [3,3,2C,2F].

    For a stride-2 pad-(1,1) downsampling conv whose INPUT and OUTPUT
    both live in the width-s2d layout ((H,W/2,2C) → (H/2,W/4,2F)):
    output O[2yo', 2(2xo'+eo), f]... i.e. original output col
    xo = 2xo'+eo reads input col 2xo+kx-1 = 4xo'+2eo+kx-1 = 2(2xo'+q)+dj
    with the s2d x'-conv at stride 2, giving kx = 2q + dj - 2eo + 1.

        w'[ky, q+1, dj*C+c, eo*F+f] = w3[ky, 2q+dj-2eo+1, c, f]

    (eo=0 uses q ∈ {-1,0}; eo=1 uses q ∈ {0,1}; pad x' by (1,1).)
    """
    xp = jnp if isinstance(w3, jnp.ndarray) else np
    kh, kw, c, f = w3.shape
    assert (kh, kw) == (3, 3), w3.shape
    blocks = []
    for q in (-1, 0, 1):
        cols = []
        for eo in (0, 1):
            rows = []
            for dj in (0, 1):
                kx = 2 * q + dj - 2 * eo + 1
                if 0 <= kx <= 2:
                    rows.append(w3[:, kx])
                else:
                    rows.append(xp.zeros_like(w3[:, 0]))
            cols.append(xp.concatenate(rows, axis=1))
        blocks.append(xp.concatenate(cols, axis=2))
    out = xp.stack(blocks, axis=1)
    if out_dtype is not None:
        out = out.astype(out_dtype)
    return out


def widen_s2d_kernel_splits(w3, splits, out_dtype=None):
    """Widen [3,3,C_total,F] for a packed input that is a CONCAT of
    independently packed tensors: layout [2C_1 | 2C_2 | ...], each block
    dj-major (the up-path skip concats of ncsnpp_generator_adagn.py:215-230
    produce exactly this when both operands live in the s2d layout —
    concat(pack(a), pack(b)) permutes channels relative to
    pack(concat(a, b)), and the permutation is absorbed here instead of
    paying a relayout on the activations).

    widen_s2d_kernel is linear and dj-major per input block, so the
    split-aware kernel is just the per-split widenings concatenated on
    the input-channel axis. sum(splits) must equal C_total.
    """
    xp = jnp if isinstance(w3, jnp.ndarray) else np
    assert sum(splits) == w3.shape[2], (splits, w3.shape)
    parts = []
    off = 0
    for cs in splits:
        parts.append(widen_s2d_kernel(w3[:, :, off : off + cs, :]))
        off += cs
    out = xp.concatenate(parts, axis=2)
    if out_dtype is not None:
        out = out.astype(out_dtype)
    return out


def widen_1x1_kernel_splits(w1, splits):
    """[C_total, F] → [2C_total, 2F] for a (possibly concat-of-packed)
    packed input. A 1×1 conv mixes no pixels, so its widened form is
    block-diagonal over the width sub-position: per split s,
    w'[dj*C_s + c, eo*F + f] = w1[off_s + c, f] · [dj == eo].
    """
    xp = jnp if isinstance(w1, jnp.ndarray) else np
    c_total, f = w1.shape
    assert sum(splits) == c_total, (splits, w1.shape)
    rows = []
    off = 0
    for cs in splits:
        blk = w1[off : off + cs]
        z = xp.zeros_like(blk)
        rows.append(xp.concatenate([blk, z], axis=1))  # dj=0 → eo=0
        rows.append(xp.concatenate([z, blk], axis=1))  # dj=1 → eo=1
        off += cs
    return xp.concatenate(rows, axis=0)


def conv3x3_s2d(y: jnp.ndarray, w_s2d: jnp.ndarray) -> jnp.ndarray:
    """Stride-1 3×3 conv in the width-s2d layout (layout-closed)."""
    return lax.conv_general_dilated(
        y, w_s2d, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv3x3_s2d_down(y: jnp.ndarray, w_s2d: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 3×3 downsampling conv, s2d layout in AND out."""
    return lax.conv_general_dilated(
        y, w_s2d, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _plain_conv3x3(x: jnp.ndarray, w3: jnp.ndarray) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x, w3, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv3x3_s2d_packed(p: jnp.ndarray, w3: jnp.ndarray, splits=None) -> jnp.ndarray:
    """3×3 stride-1 pad-1 conv, packed [B,H,W',2C] in → packed [B,H,W',2F]
    out, differentiated by PLAIN AD through the widened kernel. Equals
    _plain_conv3x3(un_s2d_width(p), w3) in packed form.

    Keeping every AD piece in the widened space is a MEASURED decision
    (celeba256 recipe, v5e, r4):

      * forward + d/dp contract over 2C/2F = 128 full MXU lanes;
      * d/dW is the widened correlation — 2× dense FLOPs (half land on
        the widened kernel's structural zeros) but lane-full at
        ~190 TF/s ⇒ ~95 TF/s per USEFUL flop, still ~1.7× the 46-61
        TF/s XLA ceiling of the original-space C=64 weight-grad conv.

    A custom_vjp variant (conv3x3_s2d_packed_cvjp below) that routes
    d/dW through the original space benched 208.2 ms/step vs 200.4 for
    plain AD (boxed, vs 176.9 no-s2d baseline): the "saved" zero-FLOPs
    cost more as lost lane-fill plus the residual unpack relayouts.

    splits: channel-block sizes when p is a concat of packed tensors
    (see widen_s2d_kernel_splits); None ⇒ single block.
    """
    if splits is not None and len(splits) > 1:
        return conv3x3_s2d(p, widen_s2d_kernel_splits(w3, splits))
    return conv3x3_s2d(p, widen_s2d_kernel(w3))


@jax.custom_vjp
def conv3x3_s2d_packed_cvjp(p: jnp.ndarray, w3: jnp.ndarray) -> jnp.ndarray:
    """MEASURED-AND-REJECTED variant of conv3x3_s2d_packed: d/dW computed
    in the ORIGINAL [3,3,C,F] space (no widened zeros). On-chip (r4,
    celeba256 batch 8): 208.2 ms/step vs 200.4 plain-AD — the
    original-space C=64 weight-grad conv runs at XLA's 46-61 TF/s
    small-channel ceiling and loses to the lane-full widened correlation
    despite doing half the dense FLOPs. Kept for the record + tests;
    p and w3 must share a dtype."""
    return conv3x3_s2d(p, widen_s2d_kernel(w3))


def _conv3x3_s2d_packed_fwd(p, w3):
    return conv3x3_s2d_packed_cvjp(p, w3), (p, w3)


def _conv3x3_s2d_packed_bwd(res, dy):
    p, w3 = res
    wide = widen_s2d_kernel(w3)
    # data-grad: correlation with the spatially-flipped, I/O-swapped
    # widened kernel, entirely inside the s2d layout (lane-full).
    w_t = jnp.flip(wide, axis=(0, 1)).swapaxes(2, 3)
    dp = conv3x3_s2d(dy, w_t)
    # weight-grad: transpose of the ORIGINAL conv (no widened zeros).
    _, vjp_w = jax.vjp(
        lambda w: _plain_conv3x3(un_s2d_width(p), w), w3
    )
    (dw,) = vjp_w(un_s2d_width(dy))
    return dp, dw


conv3x3_s2d_packed_cvjp.defvjp(_conv3x3_s2d_packed_fwd, _conv3x3_s2d_packed_bwd)


def conv3x3_s2d_auto(x: jnp.ndarray, w3: jnp.ndarray) -> jnp.ndarray:
    """Unpacked-layout wrapper over conv3x3_s2d_packed (== the plain conv;
    the pack/unpack reshapes differentiate exactly)."""
    return un_s2d_width(conv3x3_s2d_packed(s2d_width(x), w3))
