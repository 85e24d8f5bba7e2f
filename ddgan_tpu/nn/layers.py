"""Shared primitives: initializers, dense/conv constructors, embeddings.

Reference semantics:
  * `default_init` — JAX-style variance_scaling(fan_avg, uniform), scale 0
    mapped to 1e-10 (score_sde/models/layers.py:101-105). Round-trips back
    to `jax.nn.initializers.variance_scaling` exactly.
  * `dense_init` — the reference's dense_layer init
    (score_sde/models/dense_layer.py:63-66 `variance_scaling_init_` →
    `kaiming_uniform_(mode='fan_avg')`). QUIRK preserved: the reference's
    `_calculate_correct_fan` returns **fan_out** for mode='fan_avg'
    (dense_layer.py:23-33 — `fan_in if mode == 'fan_in' else fan_out`), so
    despite its name this is uniform(±sqrt(3*scale/fan_out)).
  * `get_timestep_embedding` — DDPM sinusoidal embedding
    (score_sde/models/layers.py:475-486).
  * `NIN` — 1x1 channel mixing (layers.py:489-512); in NHWC this is just a
    Dense over the trailing axis with default_init(0.1).
  * `PixelNorm` — latent normalization (ncsnpp_generator_adagn.py:51-56).

Layout: NHWC; channel axis is always the trailing axis.
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

Initializer = Callable[..., jnp.ndarray]


def name_conv_out(y: jnp.ndarray) -> jnp.ndarray:
    """Tag a conv output for the selective remat policy.

    Under `remat_policy="save-convs"` (models/ncsnpp.py) the per-resblock
    `jax.checkpoint` saves exactly these tensors instead of recomputing
    the block's convs in the backward pass — the MXU-bound 3×3/1×1 convs
    are the expensive part of a rematerialized forward, while the
    elementwise chain (adaGN/SiLU/dropout) recomputes nearly for free.
    Identity (and fused away) outside a policy-bearing checkpoint.
    """
    return checkpoint_name(y, "conv_out")


def default_init(scale: float = 1.0) -> Initializer:
    """DDPM initializer: variance_scaling(scale, fan_avg, uniform); 0 → 1e-10."""
    scale = 1e-10 if scale == 0 else scale
    return jax.nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


def dense_init(scale: float = 1.0) -> Initializer:
    """dense_layer.py init — uniform(±sqrt(3*scale/fan_out)); 0 → 1e-10.

    See module docstring for the fan_avg→fan_out quirk being preserved.
    """
    scale = 1e-10 if scale == 0 else scale
    return jax.nn.initializers.variance_scaling(scale, "fan_out", "uniform")


def get_timestep_embedding(
    timesteps: jnp.ndarray, embedding_dim: int, max_positions: int = 10000
) -> jnp.ndarray:
    """Sinusoidal positional embedding, cat(sin, cos). (layers.py:475-486)"""
    assert timesteps.ndim == 1
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class Dense(nn.Module):
    """Linear layer with the reference dense_layer init and zero bias."""

    features: int
    init_scale: float = 1.0
    use_bias: bool = True
    dtype: Any = None  # compute dtype (params stay float32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=dense_init(self.init_scale),
            bias_init=jax.nn.initializers.zeros,
            name="linear",
        )(x)


class ConvLayer(nn.Module):
    """Conv2d with the reference dense_layer init (dense_layer.py:69-80)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Any = 1
    use_bias: bool = True
    init_scale: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=pad,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=dense_init(self.init_scale),
            bias_init=jax.nn.initializers.zeros,
            name="conv",
        )(x)


class _PairConv(nn.Module):
    """Same params as nn.Conv (kernel/bias, identical shapes+inits) but the
    forward runs the paired-pixel Pallas MXU kernel — used by Conv3x3 for
    the narrow-channel (C_out=64) high-resolution levels where XLA leaves
    half the MXU lanes idle (r3 celeba256 profile)."""

    features: int
    init_scale: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.experimental.pallas_conv import pair_conv3x3

        kernel = self.param(
            "kernel", default_init(self.init_scale),
            (3, 3, x.shape[-1], self.features),
        )
        bias = self.param("bias", jax.nn.initializers.zeros, (self.features,))
        return pair_conv3x3(x.astype(self.dtype), kernel, bias)


class _S2DConv(nn.Module):
    """Same params as nn.Conv (kernel/bias, identical shapes+inits) but the
    forward runs in the width-s2d layout (ops/s2d.py): pack width pixel
    pairs into channels so a C=64 level contracts over 128 = full MXU
    lanes. The [3,3,C,F] parameter is widened to [3,3,2C,2F] inside the
    step (a differentiable gather — checkpoints unchanged); dense FLOPs
    double but lane-full convs run ~3-4x faster per dense FLOP at the
    256²/C=64 shape (tools/exp_conv256.py)."""

    features: int
    init_scale: float = 1.0
    dtype: Any = None
    use_bias: bool = True
    packed_io: bool = False  # input AND output already in s2d layout
    packed_splits: tuple | None = None  # input channel blocks (concat-of-packed)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.s2d import conv3x3_s2d_auto, conv3x3_s2d_packed

        in_ch = x.shape[-1] // 2 if self.packed_io else x.shape[-1]
        kernel = self.param(
            "kernel", default_init(self.init_scale),
            (3, 3, in_ch, self.features),
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        # plain AD through the widened kernel — the custom_vjp that routed
        # d/dW through the original space was measured SLOWER end-to-end
        # (see ops/s2d.py conv3x3_s2d_packed_cvjp).
        if self.packed_io:
            y = conv3x3_s2d_packed(x, kernel, self.packed_splits)
        else:
            y = conv3x3_s2d_auto(x, kernel)
        if self.use_bias:
            bias = self.param("bias", jax.nn.initializers.zeros, (self.features,))
            b = bias.astype(y.dtype)
            if self.packed_io:
                b = jnp.concatenate([b, b], axis=0)  # packed channel = dj*F+f
            y = y + b
        return y


class _S2D1x1(nn.Module):
    """Packed-layout 1×1 conv: same params as nn.Conv ([1,1,C,F] kernel +
    [F] bias, same inits/names) but input AND output live in the width-s2d
    layout. The widened matrix is block-diagonal over the width
    sub-position (ops/s2d.py widen_1x1_kernel_splits), so the skip-path
    Conv_2 of a BigGAN resblock stays inside a packed region with zero
    activation relayout. Ref: layers.py:114-120 (ddpm_conv1x1)."""

    features: int
    init_scale: float = 1.0
    dtype: Any = None
    use_bias: bool = True
    packed_splits: tuple | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from ..ops.s2d import widen_1x1_kernel_splits

        in_ch = x.shape[-1] // 2
        splits = self.packed_splits or (in_ch,)
        kernel = self.param(
            "kernel", default_init(self.init_scale), (1, 1, in_ch, self.features)
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        wide = widen_1x1_kernel_splits(kernel.reshape(in_ch, self.features), splits)
        y = jnp.tensordot(x, wide, axes=1)
        if self.use_bias:
            bias = self.param("bias", jax.nn.initializers.zeros, (self.features,))
            y = y + jnp.concatenate([bias, bias], axis=0).astype(y.dtype)
        return y


def _s2d_eligible(x: jnp.ndarray, features: int) -> bool:
    """Width-s2d pays off when the conv underfills the 128 MXU lanes and
    the spatial extent is large enough for the relayout to amortize."""
    b, h, w, c = x.shape
    return (
        c <= 64 and features <= 64 and w % 2 == 0 and h * w >= 128 * 128
    )


class Conv3x3(nn.Module):
    """ddpm_conv3x3: 3x3 conv, default_init(init_scale), zero bias. (layers.py:131-138)"""

    features: int
    stride: int = 1
    use_bias: bool = True
    dilation: int = 1
    init_scale: float = 1.0
    padding: int = 1
    dtype: Any = None
    packed_io: bool = False  # caller keeps x in s2d layout (blocks.py closure)
    packed_splits: tuple | None = None  # input channel blocks when packed_io

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, packed_io: bool | None = None
    ) -> jnp.ndarray:
        # packedness may be decided per CALL (the head/stem convs of the
        # flat all_modules list are constructed once but run packed only
        # when the region closure reaches them); None defers to the
        # constructed attribute. Both paths share the param tree.
        if packed_io if packed_io is not None else self.packed_io:
            # caller guarantees eligibility; params identical to the
            # default path ([3,3,C,F] kernel under "conv")
            return name_conv_out(_S2DConv(
                self.features, self.init_scale, self.dtype,
                use_bias=self.use_bias, packed_io=True,
                packed_splits=self.packed_splits, name="conv",
            )(x))
        if (
            # Per-conv boxing (pack→conv→unpack around ONE conv) is a
            # measured NET LOSS on the 256² recipes (celeba256 200.4 ms vs
            # 176.9 baseline, r4): every box pays 2 tile-relayout copies ×
            # remat. Kept ONLY as an opt-in experiment knob; the production
            # path is whole-region closure driven by models/ncsnpp.py
            # under DDGAN_TPU_S2D_CONV=1.
            os.environ.get("DDGAN_TPU_S2D_BOXED") == "1"
            and self.stride == 1
            and self.dilation == 1
            and self.padding == 1
            and _s2d_eligible(x, self.features)
        ):
            # identical param tree (conv/kernel + conv/bias, same
            # shapes+inits) → checkpoints are flag-agnostic
            return name_conv_out(_S2DConv(
                self.features, self.init_scale, self.dtype,
                use_bias=self.use_bias, name="conv",
            )(x))
        if (
            os.environ.get("DDGAN_TPU_PALLAS_CONV") == "1"
            and self.stride == 1
            and self.dilation == 1
            and self.padding == 1
            and self.use_bias
            and self.dtype == jnp.bfloat16
        ):
            from ..ops.experimental.pallas_conv import supported

            if supported(
                x.shape, (3, 3, x.shape[-1], self.features), jnp.bfloat16
            ):
                # identical param tree (conv/kernel + conv/bias, same
                # shapes+inits) → checkpoints are flag-agnostic
                return name_conv_out(_PairConv(
                    self.features, self.init_scale, self.dtype, name="conv"
                )(x))
        return name_conv_out(nn.Conv(
            self.features,
            kernel_size=(3, 3),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=default_init(self.init_scale),
            bias_init=jax.nn.initializers.zeros,
            name="conv",
        )(x))


class Conv1x1(nn.Module):
    """ddpm_conv1x1: 1x1 conv, default_init(init_scale), zero bias. (layers.py:114-120)"""

    features: int
    stride: int = 1
    use_bias: bool = True
    init_scale: float = 1.0
    padding: int = 0
    dtype: Any = None
    packed_io: bool = False  # x in width-s2d layout (blocks.py region closure)
    packed_splits: tuple | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.packed_io:
            assert self.stride == 1 and self.padding == 0
            return name_conv_out(_S2D1x1(
                self.features, self.init_scale, self.dtype,
                use_bias=self.use_bias, packed_splits=self.packed_splits,
                name="conv",
            )(x))
        return name_conv_out(nn.Conv(
            self.features,
            kernel_size=(1, 1),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=default_init(self.init_scale),
            bias_init=jax.nn.initializers.zeros,
            name="conv",
        )(x))


class NIN(nn.Module):
    """1x1 channel mixing via a (C_in, C_out) matrix. (layers.py:489-512)

    In NHWC the reference's permute→tensordot→permute collapses to one
    Dense on the trailing axis.
    """

    features: int
    init_scale: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "W", default_init(self.init_scale), (x.shape[-1], self.features)
        )
        b = self.param("b", jax.nn.initializers.zeros, (self.features,))
        if self.dtype is not None:
            x, w, b = x.astype(self.dtype), w.astype(self.dtype), b.astype(self.dtype)
        return jnp.tensordot(x, w, axes=1) + b


class PixelNorm(nn.Module):
    """x / sqrt(mean(x^2, channel) + 1e-8). (ncsnpp_generator_adagn.py:51-56)

    The reference normalizes over dim=1; for the 2-D latent (B, nz) this is
    the feature axis — trailing axis here.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return x * jax.lax.rsqrt(jnp.mean(x**2, axis=-1, keepdims=True) + 1e-8)
