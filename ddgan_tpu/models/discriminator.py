"""Time-conditional discriminators D(x_t | x_{t+1}) (Flax, NHWC).

Reference semantics: score_sde/models/discriminator.py. The pair
(x, x_t) is concatenated on channels; every DownConvBlock adds a
per-channel projection of the time embedding; a StyleGAN2-style
minibatch-stddev feature is appended before the head.

Minibatch-stddev grouping is PER-DEVICE-BATCH (groups never cross data
shards), matching the reference's per-process DDP semantics
(discriminator.py:150-158; SURVEY.md §7 hard-part 3).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import resample
from ..nn.layers import ConvLayer, Dense, get_timestep_embedding
from .registry import register_model

Act = Callable[[jnp.ndarray], jnp.ndarray]


def leaky_relu_02(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope=0.2)


class TimestepEmbedding(nn.Module):
    """Sinusoidal embedding → dense → act → dense. (discriminator.py:19-36)"""

    embedding_dim: int
    hidden_dim: int
    output_dim: int
    act: Act = leaky_relu_02

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        temb = get_timestep_embedding(t, self.embedding_dim)
        temb = Dense(self.hidden_dim, name="dense0")(temb)
        temb = self.act(temb)
        temb = Dense(self.output_dim, name="dense1")(temb)
        return temb


class DownConvBlock(nn.Module):
    """Residual conv block with t-conditioning and FIR down. (discriminator.py:38-94)"""

    out_channel: int
    kernel_size: int = 3
    padding: int = 1
    downsample: bool = False
    act: Act = leaky_relu_02
    fir_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, t_emb: jnp.ndarray) -> jnp.ndarray:
        out = self.act(x)
        out = ConvLayer(
            self.out_channel, self.kernel_size, padding=self.padding,
            dtype=self.dtype, name="conv1"
        )(out)
        out = out + Dense(self.out_channel, dtype=self.dtype, name="dense_t1")(
            t_emb
        )[:, None, None, :]
        out = self.act(out)
        if self.downsample:
            out = resample.downsample_2d(out, self.fir_kernel, factor=2)
            x = resample.downsample_2d(x, self.fir_kernel, factor=2)
        out = ConvLayer(
            self.out_channel,
            self.kernel_size,
            padding=self.padding,
            init_scale=0.0,
            dtype=self.dtype,
            name="conv2",
        )(out)
        skip = ConvLayer(
            self.out_channel, 1, padding=0, use_bias=False,
            dtype=self.dtype, name="skip"
        )(x)
        return (out + skip) / np.sqrt(2.0)


def minibatch_stddev(
    out: jnp.ndarray,
    stddev_group: int = 4,
    stddev_feat: int = 1,
    segments: int = 1,
) -> jnp.ndarray:
    """Append the StyleGAN2 minibatch-stddev feature map. (discriminator.py:150-158)

    Grouping is strided over the batch (torch .view(group, -1, ...)
    semantics): group member m aggregates samples {m, m + B/g, ...}.

    segments > 1: the batch is a concatenation of `segments` independent
    sub-batches (the fused train step runs D(real) and D(fake) as ONE
    batched trunk call — one set of big MXU convs instead of two); the
    stddev statistic is computed per sub-batch so the math is identical
    to `segments` separate calls (the reference's two separate D calls,
    ddgan.py:445-476).
    """
    if segments > 1:
        b = out.shape[0] // segments
        assert out.shape[0] == b * segments, (out.shape, segments)
        return jnp.concatenate(
            [
                minibatch_stddev(
                    out[i * b : (i + 1) * b], stddev_group, stddev_feat
                )
                for i in range(segments)
            ],
            axis=0,
        )
    batch, height, width, channel = out.shape
    group = min(batch, stddev_group)
    s = out.astype(jnp.float32).reshape(
        group, -1, height, width, stddev_feat, channel // stddev_feat
    )
    var = jnp.var(s, axis=0)  # biased (unbiased=False)
    stddev = jnp.sqrt(var + 1e-8)
    stddev = stddev.mean(axis=(1, 2, 4), keepdims=True)  # over H, W, C/feat
    stddev = stddev.squeeze(-1)  # (B/g, 1, 1, feat)
    stddev = jnp.tile(stddev, (group, height, width, 1)).astype(out.dtype)
    return jnp.concatenate([out, stddev], axis=-1)


@register_model(name="discriminator_small")
class DiscriminatorSmall(nn.Module):
    """4-block discriminator for 32x32 images. (discriminator.py:96-167)"""

    nc: int = 3  # channels of ONE image; input pair has 2*nc
    ngf: int = 64
    t_emb_dim: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, t: jnp.ndarray, x_t: jnp.ndarray,
        segments: int = 1,
    ) -> jnp.ndarray:
        act = leaky_relu_02
        t_embed = act(
            TimestepEmbedding(
                embedding_dim=self.t_emb_dim,
                hidden_dim=self.t_emb_dim,
                output_dim=self.t_emb_dim,
                act=act,
                name="t_embed",
            )(t)
        )
        # cast BEFORE the concat: bf16 halves the bytes through the
        # lane-hostile nc+nc channel concat (measured 62 GB/s at 256²,
        # perf/r4_prof_celeba256_region_landed.txt); cast-then-concat is
        # bit-identical to concat-then-cast
        if self.dtype is not None:
            x = x.astype(self.dtype)
            x_t = x_t.astype(self.dtype)
        input_x = jnp.concatenate([x, x_t], axis=-1)

        h0 = ConvLayer(self.ngf * 2, 1, padding=0, dtype=self.dtype, name="start_conv")(input_x)
        h1 = DownConvBlock(self.ngf * 2, act=act, dtype=self.dtype, name="conv1")(h0, t_embed)
        h2 = DownConvBlock(self.ngf * 4, downsample=True, act=act, dtype=self.dtype, name="conv2")(
            h1, t_embed
        )
        h3 = DownConvBlock(self.ngf * 8, downsample=True, act=act, dtype=self.dtype, name="conv3")(
            h2, t_embed
        )
        out = DownConvBlock(self.ngf * 8, downsample=True, act=act, dtype=self.dtype, name="conv4")(
            h3, t_embed
        )

        out = minibatch_stddev(out, segments=segments)
        out = ConvLayer(
            self.ngf * 8, 3, padding=1, init_scale=0.0, dtype=self.dtype, name="final_conv"
        )(out)
        out = act(out)
        # head in float32 (big spatial sums deserve full precision)
        out = out.astype(jnp.float32).sum(axis=(1, 2))  # (discriminator.py:164)
        out = Dense(1, name="end_linear")(out)
        return out


@register_model(name="discriminator_large")
class DiscriminatorLarge(nn.Module):
    """6-block discriminator for 256x256 images. (discriminator.py:170-238)"""

    nc: int = 1
    ngf: int = 32
    t_emb_dim: int = 128
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, t: jnp.ndarray, x_t: jnp.ndarray,
        segments: int = 1,
    ) -> jnp.ndarray:
        act = leaky_relu_02
        t_embed = act(
            TimestepEmbedding(
                embedding_dim=self.t_emb_dim,
                hidden_dim=self.t_emb_dim,
                output_dim=self.t_emb_dim,
                act=act,
                name="t_embed",
            )(t)
        )
        # cast BEFORE the concat: bf16 halves the bytes through the
        # lane-hostile nc+nc channel concat (measured 62 GB/s at 256²,
        # perf/r4_prof_celeba256_region_landed.txt); cast-then-concat is
        # bit-identical to concat-then-cast
        if self.dtype is not None:
            x = x.astype(self.dtype)
            x_t = x_t.astype(self.dtype)
        input_x = jnp.concatenate([x, x_t], axis=-1)

        h = ConvLayer(self.ngf * 2, 1, padding=0, dtype=self.dtype, name="start_conv")(input_x)
        h = DownConvBlock(self.ngf * 4, downsample=True, act=act, dtype=self.dtype, name="conv1")(h, t_embed)
        h = DownConvBlock(self.ngf * 8, downsample=True, act=act, dtype=self.dtype, name="conv2")(h, t_embed)
        h = DownConvBlock(self.ngf * 8, downsample=True, act=act, dtype=self.dtype, name="conv3")(h, t_embed)
        h = DownConvBlock(self.ngf * 8, downsample=True, act=act, dtype=self.dtype, name="conv4")(h, t_embed)
        h = DownConvBlock(self.ngf * 8, downsample=True, act=act, dtype=self.dtype, name="conv5")(h, t_embed)
        out = DownConvBlock(self.ngf * 8, downsample=True, act=act, dtype=self.dtype, name="conv6")(h, t_embed)

        out = minibatch_stddev(out, segments=segments)
        out = ConvLayer(self.ngf * 8, 3, padding=1, dtype=self.dtype, name="final_conv")(out)
        out = act(out)
        out = out.astype(jnp.float32).sum(axis=(1, 2))
        out = Dense(1, name="end_linear")(out)
        return out
