"""NCSN++ building blocks as Flax modules (NHWC).

Reference semantics: score_sde/models/layerspp.py and
score_sde/models/up_or_down_sampling.py:28-61 (the fused FIR Conv2d).
All GroupNorms use eps=1e-6 and num_groups=min(C//4, 32) as in the
reference; skip connections rescale by 1/sqrt(2) when `skip_rescale`.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import resample
from .layers import Conv1x1, Conv3x3, NIN, default_init, dense_init

Act = Callable[[jnp.ndarray], jnp.ndarray]


def _num_groups(channels: int) -> int:
    return min(channels // 4, 32)


class AdaptiveGroupNorm(nn.Module):
    """GroupNorm(affine=False) modulated by a style vector. (layerspp.py:46-63)

    style = Dense(zemb) → (gamma, beta); bias initialized so gamma starts at
    1 and beta at 0 (layerspp.py:53-54).
    """

    num_groups: int
    style_dim: int  # kept for API clarity; inferred from input at call time
    dtype: Any = None
    # x is in width-s2d layout (ops/s2d.py). None = plain; a tuple gives the
    # true-channel block sizes when x is a concat of packed tensors
    # [2C_1 | 2C_2 | ...] (up-path skip concats).
    packed_splits: tuple | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
        packed = self.packed_splits is not None
        channels = x.shape[-1] // 2 if packed else x.shape[-1]

        def style_bias_init(key, shape, dtype=jnp.float32):
            del key
            return jnp.concatenate(
                [jnp.ones((channels,), dtype), jnp.zeros((channels,), dtype)]
            )

        s = nn.Dense(
            channels * 2,
            dtype=self.dtype,
            kernel_init=dense_init(1.0),
            bias_init=style_bias_init,
            name="style",
        )(style)
        gamma, beta = jnp.split(s, 2, axis=-1)
        # Folded normalize: gamma·GN(x)+beta ≡ (x−μ)·a+b with
        # per-(batch,channel) a = gamma·rstd precomputed in f32 from the
        # group stats. The r3 256² profile showed the unfolded chain
        # (full-tensor f32 normalize → cast → scale → shift) fused into
        # every conv PROLOGUE, stalling the MXU at 46 vs 110 TFLOP/s for
        # otherwise identical convs; folding leaves a compute-dtype
        # subtract-multiply-add on the tensor. Same math as
        # GroupNorm(affine=False) reassociated (eps=1e-6, biased variance),
        # parity-guarded by the model tests.
        g = self.num_groups
        b_, c = x.shape[0], channels
        cpg = c // g
        # stats via two lane-aligned [B,C] reductions (channels ride the
        # 128-lane axis; reducing a [B,HW,G,cpg] view instead was measured
        # 35% SLOWER end-to-end — cpg-wide trailing dims wreck the reduce),
        # then combined per group: var = E[x²] − E[x]², flax's own trick
        xf = x.astype(jnp.float32)
        s1 = jnp.mean(xf, axis=(1, 2))  # [B, C] ([B, 2C] packed)
        s2 = jnp.mean(jnp.square(xf), axis=(1, 2))
        if packed:
            # within each split, packed channel = dj*C_s + c; the two dj
            # halves carry equal pixel counts, so averaging them IS the
            # full-row mean. Splits re-concatenate in ORIGINAL channel
            # order so the group structure is unchanged.
            s1 = _unpack_channel_vec(s1, self.packed_splits)
            s2 = _unpack_channel_vec(s2, self.packed_splits)
        mean = s1.reshape(b_, g, cpg).mean(-1)
        var = s2.reshape(b_, g, cpg).mean(-1) - jnp.square(mean)
        rstd = jax.lax.rsqrt(var + 1e-6)  # [B, G]
        a_f = gamma.astype(jnp.float32) * jnp.repeat(rstd, cpg, axis=1)
        dt = self.dtype if self.dtype is not None else jnp.result_type(
            x.dtype, jnp.float32
        )
        # Center with the COMPUTE-DTYPE-rounded mean and fold its rounding
        # residual into the f32 bias: (x−μ_dt)·a + (β + (μ_dt−μ)·a). The
        # naive x·a + (β−μ·a) form cancels catastrophically in bf16 when
        # |μ| ≫ σ (x·a and b are large near-opposites with 8 mantissa
        # bits); here x−μ_dt is exact-ish where it matters (x≈μ_dt) and
        # the μ-rounding error is repaired exactly in f32, so output error
        # stays O(2⁻⁹) of the output scale regardless of μ/σ. In f32
        # compute the residual is 0 and this reduces to plain centering.
        mu_c = jnp.repeat(mean, cpg, axis=1)  # [B, C] f32
        mu_dt = mu_c.astype(dt)
        b_f = beta.astype(jnp.float32) + (
            mu_dt.astype(jnp.float32) - mu_c
        ) * a_f
        if packed:
            # broadcast the per-channel affine back to the packed axis
            # (per split: duplicate over dj, then re-concatenate splits)
            mu_dt = _pack_channel_vec(mu_dt, self.packed_splits)
            a_f = _pack_channel_vec(a_f, self.packed_splits)
            b_f = _pack_channel_vec(b_f, self.packed_splits)
        return (
            x.astype(dt) - mu_dt[:, None, None, :]
        ) * a_f[:, None, None, :].astype(dt) + b_f[:, None, None, :].astype(dt)


def _unpack_channel_vec(v: jnp.ndarray, splits) -> jnp.ndarray:
    """[B, 2*sum(splits)] per-packed-channel vector → [B, sum(splits)] in
    original channel order, averaging the two dj halves of each split."""
    if len(splits) == 1:
        c = splits[0]
        return 0.5 * (v[:, :c] + v[:, c:])
    parts, off = [], 0
    for cs in splits:
        blk = v[:, off : off + 2 * cs]
        parts.append(0.5 * (blk[:, :cs] + blk[:, cs:]))
        off += 2 * cs
    return jnp.concatenate(parts, axis=1)


def _pack_channel_vec(v: jnp.ndarray, splits) -> jnp.ndarray:
    """[B, sum(splits)] per-true-channel vector → [B, 2*sum(splits)] in the
    concat-of-packed layout (each split duplicated over dj)."""
    if len(splits) == 1:
        return jnp.concatenate([v, v], axis=1)
    parts, off = [], 0
    for cs in splits:
        blk = v[:, off : off + cs]
        parts.append(jnp.concatenate([blk, blk], axis=1))
        off += cs
    return jnp.concatenate(parts, axis=1)


class HeadGroupNorm(nn.Module):
    """Affine GroupNorm(eps=1e-6) whose input may be width-s2d packed.

    Param-compatible with nn.GroupNorm ("scale"/"bias", shape [C], same
    inits) so the head-norm checkpoint keys are unchanged. The packed path
    computes group statistics from lane-aligned [B,2C] moment reductions
    exactly like AdaptiveGroupNorm: the two dj halves of a packed row carry
    equal pixel counts, so averaging them IS the full-row mean. Lets the
    model head (final 'GroupNorm → act → conv3x3',
    ncsnpp_generator_adagn.py:405-417) consume a packed 256² top level
    without a tile-relayout unpack. Normalization math is the same folded
    (x−μ_dt)·a+b form as AdaptiveGroupNorm (see the bf16-cancellation note
    there); with packed=False and f32 it reduces to plain GroupNorm.
    """

    num_groups: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, packed: bool = False) -> jnp.ndarray:
        c = x.shape[-1] // 2 if packed else x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        g = self.num_groups
        cpg = c // g
        b_ = x.shape[0]
        xf = x.astype(jnp.float32)
        s1 = jnp.mean(xf, axis=(1, 2))  # [B, C] ([B, 2C] packed)
        s2 = jnp.mean(jnp.square(xf), axis=(1, 2))
        if packed:
            s1 = _unpack_channel_vec(s1, (c,))
            s2 = _unpack_channel_vec(s2, (c,))
        mean = s1.reshape(b_, g, cpg).mean(-1)
        var = s2.reshape(b_, g, cpg).mean(-1) - jnp.square(mean)
        rstd = jax.lax.rsqrt(var + 1e-6)  # [B, G]
        a_f = scale.astype(jnp.float32)[None, :] * jnp.repeat(rstd, cpg, axis=1)
        dt = self.dtype if self.dtype is not None else jnp.result_type(
            x.dtype, jnp.float32
        )
        mu_c = jnp.repeat(mean, cpg, axis=1)  # [B, C] f32
        mu_dt = mu_c.astype(dt)
        b_f = bias.astype(jnp.float32)[None, :] + (
            mu_dt.astype(jnp.float32) - mu_c
        ) * a_f
        if packed:
            mu_dt = _pack_channel_vec(mu_dt, (c,))
            a_f = _pack_channel_vec(a_f, (c,))
            b_f = _pack_channel_vec(b_f, (c,))
        return (
            x.astype(dt) - mu_dt[:, None, None, :]
        ) * a_f[:, None, None, :].astype(dt) + b_f[:, None, None, :].astype(dt)


class GaussianFourierProjection(nn.Module):
    """Gaussian Fourier embeddings for noise levels. (layerspp.py:65-74)

    W is a fixed (non-trainable) random projection, stored in the
    'buffers' collection.
    """

    embedding_size: int = 256
    scale: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.variable(
            "buffers",
            "W",
            lambda: jax.random.normal(
                self.make_rng("params"), (self.embedding_size,)
            )
            * self.scale,
        )
        x_proj = x[:, None] * w.value[None, :] * 2 * np.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class Combine(nn.Module):
    """Combine skip-pyramid information: conv1x1 then cat or sum. (layerspp.py:77-92)"""

    features: int
    method: str = "cat"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        h = Conv1x1(self.features, dtype=self.dtype, name="Conv_0")(x)
        if self.method == "cat":
            return jnp.concatenate([h, y], axis=-1)
        elif self.method == "sum":
            return h + y
        raise ValueError(f"Method {self.method} not recognized.")


class AttnBlockpp(nn.Module):
    """Full spatial self-attention over H*W. (layerspp.py:95-124)

    q/k/v/out are NIN (1x1) projections; logits scaled by C^-0.5 and
    softmaxed over the flattened key positions. Expressed as einsums, which
    XLA lowers to batched MXU matmuls.
    """

    skip_rescale: bool = False
    init_scale: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, hgt, wid, c = x.shape
        h = nn.GroupNorm(num_groups=_num_groups(c), epsilon=1e-6,
                         dtype=self.dtype, name="GroupNorm_0")(x)
        q = NIN(c, dtype=self.dtype, name="NIN_0")(h)
        k = NIN(c, dtype=self.dtype, name="NIN_1")(h)
        v = NIN(c, dtype=self.dtype, name="NIN_2")(h)

        # Flatten spatial dims BEFORE the contractions: the reference's 4-D
        # einsum (bhwc,bijc->bhwij) leaves 16-wide trailing dims on the
        # (8,128) TPU tile — profiled at ~10 TFLOP/s on v5e. With [B,HW,C]
        # operands the same math is a lane-aligned batched matmul.
        # Logits accumulate and softmax in float32 regardless of dtype.
        q2 = q.reshape(b, hgt * wid, c)
        k2 = k.reshape(b, hgt * wid, c)
        v2 = v.reshape(b, hgt * wid, c)
        w = jnp.einsum(
            "bqc,bkc->bqk", q2, k2, preferred_element_type=jnp.float32
        ) * (int(c) ** (-0.5))
        w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
        h = jnp.einsum(
            "bqk,bkc->bqc", w, v2, preferred_element_type=jnp.float32
        ).astype(v.dtype).reshape(b, hgt, wid, c)
        h = NIN(c, init_scale=self.init_scale, dtype=self.dtype, name="NIN_3")(h)
        if not self.skip_rescale:
            return x + h
        return (x + h) / np.sqrt(2.0)


class FirConv2d(nn.Module):
    """Conv2d fused with FIR up/down resampling. (up_or_down_sampling.py:28-61)

    Weight uses default_init() as passed by Upsample/Downsample
    (layerspp.py:137-141, :172-176); bias is zero-initialized.
    """

    features: int
    kernel: int = 3
    up: bool = False
    down: bool = False
    resample_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert not (self.up and self.down)
        in_c = x.shape[-1]
        w = self.param(
            "weight",
            default_init(),
            (self.kernel, self.kernel, in_c, self.features),
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            w = w.astype(self.dtype)
        if self.up:
            out = resample.upsample_conv_2d(x, w, k=self.resample_kernel)
        elif self.down:
            out = resample.conv_downsample_2d(x, w, k=self.resample_kernel)
        else:
            out = jax.lax.conv_general_dilated(
                x,
                w,
                window_strides=(1, 1),
                padding=(
                    (self.kernel // 2, self.kernel // 2),
                    (self.kernel // 2, self.kernel // 2),
                ),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            b = self.param("bias", jax.nn.initializers.zeros, (self.features,))
            out = out + b.astype(out.dtype).reshape(1, 1, 1, -1)
        return out


class Upsample(nn.Module):
    """2x upsampling, optionally FIR and/or with conv. (layerspp.py:127-159)"""

    features: int | None = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        out_ch = self.features or c
        if not self.fir:
            # nearest-neighbour 2x (F.interpolate 'nearest')
            out = resample.naive_upsample_2d(x, factor=2)
            if self.with_conv:
                out = Conv3x3(out_ch, dtype=self.dtype, name="Conv_0")(out)
        else:
            if not self.with_conv:
                out = resample.upsample_2d(x, self.fir_kernel, factor=2)
            else:
                out = FirConv2d(
                    out_ch,
                    kernel=3,
                    up=True,
                    resample_kernel=self.fir_kernel,
                    use_bias=True,
                    dtype=self.dtype,
                    name="Conv2d_0",
                )(x)
        return out


class Downsample(nn.Module):
    """2x downsampling, optionally FIR and/or with conv. (layerspp.py:162-196)"""

    features: int | None = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        out_ch = self.features or c
        if not self.fir:
            if self.with_conv:
                # F.pad (0,1,0,1) then stride-2 valid conv (layerspp.py:186-188)
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = Conv3x3(out_ch, stride=2, padding=0, dtype=self.dtype, name="Conv_0")(x)
            else:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        else:
            if not self.with_conv:
                x = resample.downsample_2d(x, self.fir_kernel, factor=2)
            else:
                x = FirConv2d(
                    out_ch,
                    kernel=3,
                    down=True,
                    resample_kernel=self.fir_kernel,
                    use_bias=True,
                    dtype=self.dtype,
                    name="Conv2d_0",
                )(x)
        return x


class _TembProj(nn.Module):
    """Per-channel bias from the time embedding: Dense(act(temb)).

    Weight default_init, zero bias (layerspp.py:263-265).
    """

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, temb: jnp.ndarray) -> jnp.ndarray:
        return nn.Dense(
            self.features,
            dtype=self.dtype,
            kernel_init=default_init(),
            bias_init=jax.nn.initializers.zeros,
            name="dense",
        )(temb)


class ResnetBlockDDPMppAdagn(nn.Module):
    """DDPM-style ResBlock with adaptive GroupNorm. (layerspp.py:199-244)"""

    act: Act
    out_ch: int | None = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    skip_rescale: bool = False
    init_scale: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temb: jnp.ndarray | None = None,
        zemb: jnp.ndarray | None = None,
        train: bool = False,
        packed_splits: tuple | None = None,
    ) -> jnp.ndarray:
        assert packed_splits is None, "ddpm blocks have no packed path"
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = self.act(
            AdaptiveGroupNorm(_num_groups(in_ch), 0, dtype=self.dtype, name="GroupNorm_0")(x, zemb)
        )
        h = Conv3x3(out_ch, dtype=self.dtype, name="Conv_0")(h)
        if temb is not None:
            h = h + _TembProj(out_ch, dtype=self.dtype, name="Dense_0")(self.act(temb))[:, None, None, :]
        h = self.act(
            AdaptiveGroupNorm(_num_groups(out_ch), 0, dtype=self.dtype, name="GroupNorm_1")(h, zemb)
        )
        h = nn.Dropout(self.dropout, name="Dropout_0")(h, deterministic=not train)
        h = Conv3x3(out_ch, init_scale=self.init_scale, dtype=self.dtype, name="Conv_1")(h)
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = Conv3x3(out_ch, dtype=self.dtype, name="Conv_2")(x)
            else:
                x = NIN(out_ch, dtype=self.dtype, name="NIN_0")(x)
        if not self.skip_rescale:
            return x + h
        return (x + h) / np.sqrt(2.0)


class ResnetBlockBigGANppAdagn(nn.Module):
    """BigGAN-style ResBlock with in-block FIR up/down. (layerspp.py:247-310)"""

    act: Act
    out_ch: int | None = None
    up: bool = False
    down: bool = False
    dropout: float = 0.1
    fir: bool = False
    fir_kernel: Sequence[int] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temb: jnp.ndarray | None = None,
        zemb: jnp.ndarray | None = None,
        train: bool = False,
        packed_splits: tuple | None = None,
    ) -> jnp.ndarray:
        if packed_splits is not None:
            return self._s2d_packed(x, temb, zemb, train, packed_splits)
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = self.act(
            AdaptiveGroupNorm(_num_groups(in_ch), 0, dtype=self.dtype, name="GroupNorm_0")(x, zemb)
        )
        if self.up:
            if self.fir:
                h = resample.upsample_2d(h, self.fir_kernel, factor=2)
                x = resample.upsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = resample.naive_upsample_2d(h, factor=2)
                x = resample.naive_upsample_2d(x, factor=2)
        elif self.down:
            if self.fir:
                h = resample.downsample_2d(h, self.fir_kernel, factor=2)
                x = resample.downsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = resample.naive_downsample_2d(h, factor=2)
                x = resample.naive_downsample_2d(x, factor=2)

        h = Conv3x3(out_ch, dtype=self.dtype, name="Conv_0")(h)
        if temb is not None:
            h = h + _TembProj(out_ch, dtype=self.dtype, name="Dense_0")(self.act(temb))[:, None, None, :]
        h = self.act(
            AdaptiveGroupNorm(_num_groups(out_ch), 0, dtype=self.dtype, name="GroupNorm_1")(h, zemb)
        )
        h = nn.Dropout(self.dropout, name="Dropout_0")(h, deterministic=not train)
        h = Conv3x3(out_ch, init_scale=self.init_scale, dtype=self.dtype, name="Conv_1")(h)

        if in_ch != out_ch or self.up or self.down:
            x = Conv1x1(out_ch, dtype=self.dtype, name="Conv_2")(x)

        if not self.skip_rescale:
            return x + h
        return (x + h) / np.sqrt(2.0)

    def _s2d_packed(self, x, temb, zemb, train, splits):
        """Width-s2d resblock body: x arrives AND leaves in the packed
        layout [B,H,W/2,2C] — pack/unpack boundaries are managed by the
        whole-REGION closure in models/ncsnpp.py (one entry/exit per
        resolution region, not per block — per-block boxing was measured
        at +34 ms/step of tile-relayout copies on the celeba256 recipe,
        r4 perf/ evidence). `splits` gives the true-channel block sizes
        when x is a concat of packed tensors (up-path skips,
        ncsnpp_generator_adagn.py:215-230). Both adaGNs take lane-aligned
        [B,2C] stats in packed space (2C ≥ 128 full lanes); convs are the
        widened-kernel packed kernels (ops/s2d.py), the 1×1 skip is
        block-diagonal widened. Param tree identical to the default path
        — checkpoints stay flag-agnostic. Stride-1 only (no up/down)."""
        assert not self.up and not self.down
        in_ch = sum(splits)
        out_ch = self.out_ch or in_ch
        # identity skip needs a layout-compatible x: single block, or a
        # Conv_2 rebuild (in_ch != out_ch)
        assert len(splits) == 1 or in_ch != out_ch, (splits, out_ch)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        h = self.act(
            AdaptiveGroupNorm(_num_groups(in_ch), 0, dtype=self.dtype,
                              packed_splits=splits, name="GroupNorm_0")(x, zemb)
        )
        h = Conv3x3(out_ch, dtype=self.dtype, packed_io=True,
                    packed_splits=splits, name="Conv_0")(h)
        if temb is not None:
            tb = _TembProj(out_ch, dtype=self.dtype, name="Dense_0")(self.act(temb))
            h = h + jnp.concatenate([tb, tb], axis=-1)[:, None, None, :]
        h = self.act(
            AdaptiveGroupNorm(_num_groups(out_ch), 0, dtype=self.dtype,
                              packed_splits=(out_ch,), name="GroupNorm_1")(h, zemb)
        )
        h = nn.Dropout(self.dropout, name="Dropout_0")(h, deterministic=not train)
        h = Conv3x3(out_ch, init_scale=self.init_scale, dtype=self.dtype,
                    packed_io=True, packed_splits=(out_ch,), name="Conv_1")(h)
        if in_ch != out_ch:
            x = Conv1x1(out_ch, dtype=self.dtype, packed_io=True,
                        packed_splits=splits, name="Conv_2")(x)
        return x + h if not self.skip_rescale else (x + h) / np.sqrt(2.0)


class ResnetBlockBigGANppAdagnOne(nn.Module):
    """BigGAN ResBlock with adaGN only on the first norm. (layerspp.py:313-379)"""

    act: Act
    out_ch: int | None = None
    up: bool = False
    down: bool = False
    dropout: float = 0.1
    fir: bool = False
    fir_kernel: Sequence[int] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temb: jnp.ndarray | None = None,
        zemb: jnp.ndarray | None = None,
        train: bool = False,
        packed_splits: tuple | None = None,
    ) -> jnp.ndarray:
        assert packed_splits is None, "oneadagn blocks have no packed path"
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = self.act(
            AdaptiveGroupNorm(_num_groups(in_ch), 0, dtype=self.dtype, name="GroupNorm_0")(x, zemb)
        )
        if self.up:
            if self.fir:
                h = resample.upsample_2d(h, self.fir_kernel, factor=2)
                x = resample.upsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = resample.naive_upsample_2d(h, factor=2)
                x = resample.naive_upsample_2d(x, factor=2)
        elif self.down:
            if self.fir:
                h = resample.downsample_2d(h, self.fir_kernel, factor=2)
                x = resample.downsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = resample.naive_downsample_2d(h, factor=2)
                x = resample.naive_downsample_2d(x, factor=2)

        h = Conv3x3(out_ch, dtype=self.dtype, name="Conv_0")(h)
        if temb is not None:
            h = h + _TembProj(out_ch, dtype=self.dtype, name="Dense_0")(self.act(temb))[:, None, None, :]
        h = self.act(
            nn.GroupNorm(num_groups=_num_groups(out_ch), epsilon=1e-6, dtype=self.dtype, name="GroupNorm_1")(h)
        )
        h = nn.Dropout(self.dropout, name="Dropout_0")(h, deterministic=not train)
        h = Conv3x3(out_ch, init_scale=self.init_scale, dtype=self.dtype, name="Conv_1")(h)

        if in_ch != out_ch or self.up or self.down:
            x = Conv1x1(out_ch, dtype=self.dtype, name="Conv_2")(x)

        if not self.skip_rescale:
            return x + h
        return (x + h) / np.sqrt(2.0)
