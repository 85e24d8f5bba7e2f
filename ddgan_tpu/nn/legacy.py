"""Legacy NCSNv1/v2 + DDPM layer library (Flax, NHWC).

These blocks are part of the reference's library surface
(score_sde/models/layers.py:147-362 NCSN blocks, :515-619 plain DDPM
blocks) but are NOT used by NCSNpp (SURVEY.md §2.2) — ported for API
completeness so score-network variants built on them can be expressed.

Conventions: NHWC; `act` is a callable; norms keep torch eps defaults.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import NIN, default_init

Act = Callable[[jnp.ndarray], jnp.ndarray]


def get_act(name: str) -> Act:
    """Activation by config name. (layers.py:42-55)"""
    name = name.lower()
    if name == "elu":
        return jax.nn.elu
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return functools.partial(jax.nn.leaky_relu, negative_slope=0.2)
    if name == "swish":
        return jax.nn.silu
    raise NotImplementedError("activation function does not exist!")


class NCSNConv(nn.Module):
    """ncsn_conv1x1/3x3: torch default init scaled by init_scale (0→1e-10).
    (layers.py:58-66, :123-129)"""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    dilation: int = 1
    init_scale: float = 1.0
    padding: int | None = None

    @nn.compact
    def __call__(self, x):
        init_scale = 1e-10 if self.init_scale == 0 else self.init_scale
        pad = self.kernel_size // 2 if self.padding is None else self.padding

        def scaled_lecun(key, shape, dtype=jnp.float32):
            # torch Conv2d default: kaiming_uniform(a=sqrt(5)) ≈ uniform
            # ±1/sqrt(fan_in); scaled by init_scale like the reference's
            # in-place weight *= init_scale
            fan_in = shape[0] * shape[1] * shape[2]
            bound = 1.0 / jnp.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -bound, bound) * init_scale

        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=self.use_bias,
            kernel_init=scaled_lecun,
            name="conv",
        )(x)


def _pool5(x: jnp.ndarray, maxpool: bool) -> jnp.ndarray:
    """5x5 stride-1 same-pad max/avg pool. (layers.py:154-157)"""
    if maxpool:
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
            ((0, 0), (2, 2), (2, 2), (0, 0)),
        )
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 5, 5, 1), (1, 1, 1, 1),
        ((0, 0), (2, 2), (2, 2), (0, 0)),
    )
    return s / 25.0  # torch AvgPool2d count_include_pad=True default


class CRPBlock(nn.Module):
    """Chained residual pooling. (layers.py:147-168)"""

    features: int
    n_stages: int
    act: Act = jax.nn.relu
    maxpool: bool = True

    @nn.compact
    def __call__(self, x):
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = _pool5(path, self.maxpool)
            path = NCSNConv(self.features, 3, use_bias=False, name=f"convs_{i}")(path)
            x = path + x
        return x


class RCUBlock(nn.Module):
    """Residual conv units. (layers.py:197-218)"""

    features: int
    n_blocks: int
    n_stages: int
    act: Act = jax.nn.relu

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.act(x)
                x = NCSNConv(
                    self.features, 3, use_bias=False, name=f"{i + 1}_{j + 1}_conv"
                )(x)
            x = x + residual
        return x


def _resize_bilinear(x, shape):
    """F.interpolate bilinear align_corners=True over NHWC spatial dims."""
    n, h, w, c = x.shape
    out_h, out_w = shape
    # align_corners=True: sample grid endpoints inclusive
    if out_h == h and out_w == w:
        return x
    ys = jnp.linspace(0.0, h - 1.0, out_h)
    xs = jnp.linspace(0.0, w - 1.0, out_w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0).reshape(1, -1, 1, 1)
    wx = (xs - x0).reshape(1, 1, -1, 1)
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    cc = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    return (
        a * (1 - wy) * (1 - wx)
        + b * (1 - wy) * wx
        + cc * wy * (1 - wx)
        + d * wy * wx
    )


class MSFBlock(nn.Module):
    """Multi-scale fusion: conv each input, bilinear-resize, sum.
    (layers.py:249-264)"""

    features: int

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], shape):
        sums = jnp.zeros((xs[0].shape[0], *shape, self.features), xs[0].dtype)
        for i, xi in enumerate(xs):
            h = NCSNConv(self.features, 3, use_bias=True, name=f"convs_{i}")(xi)
            sums = sums + _resize_bilinear(h, shape)
        return sums


class RefineBlock(nn.Module):
    """RefineNet block: adapt RCUs → MSF → CRP → output RCU.
    (layers.py:291-325)"""

    features: int
    act: Act = jax.nn.relu
    start: bool = False
    end: bool = False
    maxpool: bool = True

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], output_shape):
        hs = []
        for i, xi in enumerate(xs):
            hs.append(
                RCUBlock(xi.shape[-1], 2, 2, self.act, name=f"adapt_convs_{i}")(xi)
            )
        if len(xs) > 1:
            h = MSFBlock(self.features, name="msf")(hs, output_shape)
        else:
            h = hs[0]
        h = CRPBlock(self.features, 2, self.act, maxpool=self.maxpool, name="crp")(h)
        h = RCUBlock(
            self.features, 3 if self.end else 1, 2, self.act, name="output_convs"
        )(h)
        return h


def _mean_pool_2x(x):
    """4-phase mean over 2x2 (layers.py:382-385) — NHWC."""
    return (
        x[:, ::2, ::2] + x[:, 1::2, ::2] + x[:, ::2, 1::2] + x[:, 1::2, 1::2]
    ) / 4.0


class ConvMeanPool(nn.Module):
    """(layers.py:365-385)"""

    features: int
    kernel_size: int = 3
    biases: bool = True
    adjust_padding: bool = False

    @nn.compact
    def __call__(self, x):
        if self.adjust_padding:
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
        out = NCSNConv(
            self.features, self.kernel_size, use_bias=self.biases, name="conv"
        )(x)
        return _mean_pool_2x(out)


class MeanPoolConv(nn.Module):
    """(layers.py:388-398)"""

    features: int
    kernel_size: int = 3
    biases: bool = True

    @nn.compact
    def __call__(self, x):
        return NCSNConv(
            self.features, self.kernel_size, use_bias=self.biases, name="conv"
        )(_mean_pool_2x(x))


class UpsampleConv(nn.Module):
    """cat x4 → pixel-shuffle 2x → conv. (layers.py:401-412)"""

    features: int
    kernel_size: int = 3
    biases: bool = True

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        # torch PixelShuffle on cat([x]*4) == 2x nearest upsample
        out = jnp.tile(x.reshape(n, h, 1, w, 1, c), (1, 1, 2, 1, 2, 1)).reshape(
            n, 2 * h, 2 * w, c
        )
        return NCSNConv(
            self.features, self.kernel_size, use_bias=self.biases, name="conv"
        )(out)


class ResidualBlock(nn.Module):
    """NCSNv1/v2 residual block. (layers.py:413-467)"""

    features: int
    resample: str | None = None  # None or 'down'
    act: Act = jax.nn.elu
    dilation: int = 1
    adjust_padding: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        norm = functools.partial(nn.GroupNorm, num_groups=None, group_size=1,
                                 epsilon=1e-5)  # InstanceNorm analog
        h = norm(name="normalize1")(x)
        h = self.act(h)
        if self.resample == "down":
            if self.dilation > 1:
                h = NCSNConv(in_ch, 3, dilation=self.dilation, name="conv1")(h)
                h = norm(name="normalize2")(h)
                h = self.act(h)
                h = NCSNConv(self.features, 3, dilation=self.dilation, name="conv2")(h)
                shortcut = NCSNConv(self.features, 3, dilation=self.dilation, name="shortcut")
            else:
                h = NCSNConv(in_ch, 3, name="conv1")(h)
                h = norm(name="normalize2")(h)
                h = self.act(h)
                h = ConvMeanPool(self.features, 3, adjust_padding=self.adjust_padding, name="conv2")(h)
                shortcut = ConvMeanPool(self.features, 1, adjust_padding=self.adjust_padding, name="shortcut")
        elif self.resample is None:
            if self.dilation > 1:
                h = NCSNConv(self.features, 3, dilation=self.dilation, name="conv1")(h)
                h = norm(name="normalize2")(h)
                h = self.act(h)
                h = NCSNConv(self.features, 3, dilation=self.dilation, name="conv2")(h)
                shortcut = NCSNConv(self.features, 3, dilation=self.dilation, name="shortcut")
            else:
                h = NCSNConv(self.features, 3, name="conv1")(h)
                h = norm(name="normalize2")(h)
                h = self.act(h)
                h = NCSNConv(self.features, 3, name="conv2")(h)
                shortcut = NCSNConv(self.features, 1, name="shortcut")
        else:
            raise Exception("invalid resample value")

        if self.features != in_ch or self.resample is not None:
            x = shortcut(x)
        return x + h


class AttnBlock(nn.Module):
    """Plain DDPM attention (num_groups=32, no skip rescale).
    (layers.py:515-540)"""

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="GroupNorm_0")(x)
        q = NIN(c, name="NIN_0")(h)
        k = NIN(c, name="NIN_1")(h)
        v = NIN(c, name="NIN_2")(h)
        w = jnp.einsum("bhwc,bijc->bhwij", q, k) * (int(c) ** (-0.5))
        w = jax.nn.softmax(w.reshape(b, hh, ww, hh * ww), axis=-1)
        w = w.reshape(b, hh, ww, hh, ww)
        h = jnp.einsum("bhwij,bijc->bhwc", w, v)
        h = NIN(c, init_scale=0.0, name="NIN_3")(h)
        return x + h


class UpsampleDDPM(nn.Module):
    """Nearest 2x (+ optional conv). (layers.py:543-556)"""

    features: int
    with_conv: bool = False

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        out = jnp.tile(x.reshape(n, h, 1, w, 1, c), (1, 1, 2, 1, 2, 1)).reshape(
            n, 2 * h, 2 * w, c
        )
        if self.with_conv:
            from .layers import Conv3x3

            out = Conv3x3(self.features, name="Conv_0")(out)
        return out


class DownsampleDDPM(nn.Module):
    """SAME-pad stride-2 conv or 2x avg pool. (layers.py:559-576)"""

    features: int
    with_conv: bool = False

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            from .layers import Conv3x3

            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = Conv3x3(self.features, stride=2, padding=0, name="Conv_0")(x)
        else:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class ResnetBlockDDPM(nn.Module):
    """Plain DDPM ResBlock (no adaGN, num_groups=32). (layers.py:579-619)"""

    act: Act
    out_ch: int | None = None
    conv_shortcut: bool = False
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, temb=None, *, train: bool = False):
        from .layers import Conv3x3

        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = self.act(nn.GroupNorm(num_groups=32, epsilon=1e-6, name="GroupNorm_0")(x))
        h = Conv3x3(out_ch, name="Conv_0")(h)
        if temb is not None:
            h = h + nn.Dense(
                out_ch, kernel_init=default_init(),
                bias_init=jax.nn.initializers.zeros, name="Dense_0",
            )(self.act(temb))[:, None, None, :]
        h = self.act(nn.GroupNorm(num_groups=32, epsilon=1e-6, name="GroupNorm_1")(h))
        h = nn.Dropout(self.dropout, name="Dropout_0")(h, deterministic=not train)
        h = Conv3x3(out_ch, init_scale=0.0, name="Conv_1")(h)
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = Conv3x3(out_ch, name="Conv_2")(x)
            else:
                x = NIN(out_ch, name="NIN_0")(x)
        return x + h
