"""NCSN++ z-conditioned generator (Flax, NHWC).

Predicts x0 from (x_{t+1}, t, z). Reference semantics:
score_sde/models/ncsnpp_generator_adagn.py (construction :63-277, forward
:280-431). The reference builds a flat nn.ModuleList and walks it with a
moving index; here the SAME construction control flow produces a flat list
of named Flax submodules (`all_modules_{i}`), so the torch checkpoint key
`all_modules.{i}.*` maps mechanically onto `all_modules_{i}/*` for the
compat importer, while the forward remains a pure traced function.

Supports every configuration the reference does: resblock_type
{ddpm, biggan, biggan_oneadagn}, progressive / progressive_input
{none, output_skip/input_skip, residual}, embedding {positional, fourier},
FIR or naive resampling.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .. import nn as dnn
from ..nn.layers import Dense, Conv3x3, default_init, get_timestep_embedding
from .registry import register_model


def resolve_compute_dtype(name: Any) -> Any:
    """config.compute_dtype → jnp dtype (None = f32). LOUD on unknown names:
    a typo silently training in f32 at ~2× the step time is the exact
    'modules silently running f32' pitfall measured in round 2."""
    table = {"float32": None, "f32": None, "bfloat16": jnp.bfloat16,
             "bf16": jnp.bfloat16}
    key = str(name)
    if key not in table:
        raise ValueError(
            f"compute_dtype={name!r} not supported on TPU; "
            f"expected one of {sorted(table)}"
        )
    return table[key]


@register_model(name="ncsnpp")
class NCSNpp(nn.Module):
    """NCSN++ generator. Construct via `NCSNpp.from_config(cfg)`."""

    nf: int = 128  # num_channels_dae
    ch_mult: Sequence[int] = (1, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.1
    resamp_with_conv: bool = True
    image_size: int = 32
    conditional: bool = True
    fir: bool = True
    fir_kernel: Sequence[int] = (1, 3, 3, 1)
    skip_rescale: bool = True
    resblock_type: str = "biggan"
    progressive: str = "none"
    progressive_input: str = "residual"
    progressive_combine: str = "sum"
    embedding_type: str = "positional"
    fourier_scale: float = 16.0
    not_use_tanh: bool = False
    num_channels: int = 3  # image channels
    nz: int = 100
    z_emb_dim: int = 256
    n_mlp: int = 3
    centered: bool = True
    dtype: Any = None  # compute dtype for the conv/attn path (params f32)
    use_remat: bool = False  # jax.checkpoint each ResBlock (256² configs)
    # remat policy when use_remat: "full" recomputes the whole block in the
    # backward pass; "save-convs" saves the MXU-bound conv outputs
    # (nn/layers.py name_conv_out tags) and recomputes only the elementwise
    # chain — trades ~1 fwd of generator conv FLOPs for the conv
    # activations' HBM. Env DDGAN_TPU_REMAT_POLICY overrides (A/B benching).
    remat_policy: str = "full"
    # width-s2d region closure for small-C ≥128² levels ("auto" = on where
    # eligible — measured 1.11×/1.09× on the celeba256/lsun256 recipes,
    # perf/r4_*_region_s2d.txt; "off" disables). Numerics match the plain
    # path to f32 parity-test tolerance and the param tree is identical,
    # so checkpoints are setting-agnostic. Env DDGAN_TPU_S2D_CONV=1/0
    # overrides either way (A/B benching).
    s2d_conv: str = "auto"

    @classmethod
    def from_config(cls, config: Any) -> "NCSNpp":
        dtype = resolve_compute_dtype(getattr(config, "compute_dtype", "float32"))
        # use_remat "auto" (the default when the extra key is absent):
        # remat each resblock at image_size ≥ 256 — MEASURED faster there
        # (celeba256 batch 8: 159.4 ms/step with remat vs 197.7 without —
        # the saved 256² activations cost more HBM traffic than the
        # recompute, perf/r4_celeba256_noremat_b8.txt) and lighter on
        # memory; below 256² the flagship measurements favor no remat.
        raw_remat = getattr(config, "use_remat", "auto")
        if isinstance(raw_remat, str):
            s = raw_remat.lower()
            if s == "auto":
                use_remat = int(getattr(config, "image_size", 0)) >= 256
            else:
                use_remat = s in ("yes", "true", "1")
        else:
            use_remat = bool(raw_remat)
        return cls(
            dtype=dtype,
            use_remat=use_remat,
            remat_policy=str(getattr(config, "remat_policy", "full")).lower(),
            s2d_conv=str(getattr(config, "s2d_conv", "auto")).lower(),
            nf=config.num_channels_dae,
            ch_mult=tuple(config.ch_mult),
            num_res_blocks=config.num_res_blocks,
            attn_resolutions=tuple(config.attn_resolutions),
            dropout=config.dropout,
            resamp_with_conv=config.resamp_with_conv,
            image_size=config.image_size,
            conditional=config.conditional,
            fir=config.fir,
            fir_kernel=tuple(config.fir_kernel),
            skip_rescale=config.skip_rescale,
            resblock_type=config.resblock_type.lower(),
            progressive=config.progressive.lower(),
            progressive_input=config.progressive_input.lower(),
            progressive_combine=config.progressive_combine.lower(),
            embedding_type=config.embedding_type.lower(),
            fourier_scale=config.fourier_scale,
            not_use_tanh=config.not_use_tanh,
            num_channels=config.num_channels,
            nz=config.nz,
            z_emb_dim=config.z_emb_dim,
            n_mlp=config.n_mlp,
            centered=config.centered,
        )

    def setup(self):
        assert self.progressive in ["none", "output_skip", "residual"]
        assert self.progressive_input in ["none", "input_skip", "residual"]
        assert self.embedding_type in ["fourier", "positional"]

        act = jax.nn.silu
        nf = self.nf
        num_resolutions = len(self.ch_mult)
        all_resolutions = [
            self.image_size // (2**i) for i in range(num_resolutions)
        ]
        self._all_resolutions = all_resolutions
        init_scale = 0.0
        combiner = functools.partial(
            dnn.Combine, method=self.progressive_combine, dtype=self.dtype
        )

        modules = []
        # timestep embedding (construction order matches reference :96-117)
        if self.embedding_type == "fourier":
            modules.append(
                dnn.GaussianFourierProjection(
                    embedding_size=nf, scale=self.fourier_scale
                )
            )

        if self.conditional:
            # nn.Linear with default_init weights, zero bias (:112-117)
            modules.append(
                nn.Dense(nf * 4, kernel_init=default_init(), bias_init=nn.initializers.zeros)
            )
            modules.append(
                nn.Dense(nf * 4, kernel_init=default_init(), bias_init=nn.initializers.zeros)
            )

        AttnBlock = functools.partial(
            dnn.AttnBlockpp, init_scale=init_scale, skip_rescale=self.skip_rescale,
            dtype=self.dtype,
        )
        Upsample = functools.partial(
            dnn.Upsample,
            with_conv=self.resamp_with_conv,
            fir=self.fir,
            fir_kernel=self.fir_kernel,
            dtype=self.dtype,
        )
        Downsample = functools.partial(
            dnn.Downsample,
            with_conv=self.resamp_with_conv,
            fir=self.fir,
            fir_kernel=self.fir_kernel,
            dtype=self.dtype,
        )

        if self.progressive == "output_skip":
            self.pyramid_upsample = dnn.Upsample(
                fir=self.fir, fir_kernel=self.fir_kernel, with_conv=False
            )
        elif self.progressive == "residual":
            pyramid_upsample = functools.partial(
                dnn.Upsample, fir=self.fir, fir_kernel=self.fir_kernel,
                with_conv=True, dtype=self.dtype,
            )
        if self.progressive_input == "input_skip":
            self.pyramid_downsample = dnn.Downsample(
                fir=self.fir, fir_kernel=self.fir_kernel, with_conv=False
            )
        elif self.progressive_input == "residual":
            pyramid_downsample = functools.partial(
                dnn.Downsample, fir=self.fir, fir_kernel=self.fir_kernel,
                with_conv=True, dtype=self.dtype,
            )

        if self.resblock_type == "ddpm":
            ResnetBlock = functools.partial(
                dnn.ResnetBlockDDPMppAdagn,
                act=act,
                dropout=self.dropout,
                dtype=self.dtype,
                init_scale=init_scale,
                skip_rescale=self.skip_rescale,
            )
        elif self.resblock_type == "biggan":
            ResnetBlock = functools.partial(
                dnn.ResnetBlockBigGANppAdagn,
                act=act,
                dropout=self.dropout,
                dtype=self.dtype,
                fir=self.fir,
                fir_kernel=self.fir_kernel,
                init_scale=init_scale,
                skip_rescale=self.skip_rescale,
            )
        elif self.resblock_type == "biggan_oneadagn":
            ResnetBlock = functools.partial(
                dnn.ResnetBlockBigGANppAdagnOne,
                act=act,
                dropout=self.dropout,
                dtype=self.dtype,
                fir=self.fir,
                fir_kernel=self.fir_kernel,
                init_scale=init_scale,
                skip_rescale=self.skip_rescale,
            )
        else:
            raise ValueError(f"resblock type {self.resblock_type} unrecognized.")

        if self.use_remat:
            # rematerialize each ResBlock on the backward pass — trades
            # FLOPs for HBM, the standard recipe for the 256² configs
            # (CelebA-HQ/LSUN, readme.md:39-54) where activations dominate
            # static_argnums: 0=module, 4=train (python bool controls
            # dropout determinism and must stay static under remat),
            # 5=packed_splits (tuple of ints selecting the width-s2d
            # packed body — shape-determining, must be static)
            pol_name = os.environ.get(
                "DDGAN_TPU_REMAT_POLICY", self.remat_policy
            ).lower()
            if pol_name in ("save-convs", "save_convs", "convs"):
                policy = jax.checkpoint_policies.save_only_these_names("conv_out")
            elif pol_name in ("full", ""):
                policy = None
            else:
                raise ValueError(
                    f"remat_policy={pol_name!r} not recognized "
                    "(expected 'full' or 'save-convs')"
                )
            ResnetBlock = functools.partial(
                nn.remat(
                    ResnetBlock.func, prevent_cse=False, static_argnums=(4, 5),
                    policy=policy,
                ),
                **ResnetBlock.keywords,
            )

        # Downsampling block (:174-210)
        channels = self.num_channels
        if self.progressive_input != "none":
            input_pyramid_ch = channels

        modules.append(Conv3x3(nf, dtype=self.dtype))
        hs_c = [nf]
        in_ch = nf
        for i_level in range(num_resolutions):
            for i_block in range(self.num_res_blocks):
                out_ch = nf * self.ch_mult[i_level]
                modules.append(ResnetBlock(out_ch=out_ch))
                in_ch = out_ch
                if all_resolutions[i_level] in self.attn_resolutions:
                    modules.append(AttnBlock())
                hs_c.append(in_ch)

            if i_level != num_resolutions - 1:
                if self.resblock_type == "ddpm":
                    modules.append(Downsample(features=in_ch))
                else:
                    modules.append(ResnetBlock(down=True))

                if self.progressive_input == "input_skip":
                    modules.append(combiner(features=in_ch))
                    if self.progressive_combine == "cat":
                        in_ch *= 2
                elif self.progressive_input == "residual":
                    modules.append(pyramid_downsample(features=in_ch))
                    input_pyramid_ch = in_ch
                hs_c.append(in_ch)

        # middle (:212-215)
        in_ch = hs_c[-1]
        modules.append(ResnetBlock())
        modules.append(AttnBlock())
        modules.append(ResnetBlock())

        pyramid_ch = 0
        # Upsampling block (:217-261)
        for i_level in reversed(range(num_resolutions)):
            for i_block in range(self.num_res_blocks + 1):
                out_ch = nf * self.ch_mult[i_level]
                hs_c.pop()
                modules.append(ResnetBlock(out_ch=out_ch))
                in_ch = out_ch

            if all_resolutions[i_level] in self.attn_resolutions:
                modules.append(AttnBlock())

            if self.progressive != "none":
                if i_level == num_resolutions - 1:
                    if self.progressive == "output_skip":
                        modules.append(
                            nn.GroupNorm(
                                num_groups=min(in_ch // 4, 32), epsilon=1e-6,
                                dtype=self.dtype,
                            )
                        )
                        modules.append(Conv3x3(channels, init_scale=init_scale, dtype=self.dtype))
                        pyramid_ch = channels
                    elif self.progressive == "residual":
                        modules.append(
                            nn.GroupNorm(
                                num_groups=min(in_ch // 4, 32), epsilon=1e-6,
                                dtype=self.dtype,
                            )
                        )
                        modules.append(Conv3x3(in_ch, use_bias=True, dtype=self.dtype))
                        pyramid_ch = in_ch
                else:
                    if self.progressive == "output_skip":
                        modules.append(
                            nn.GroupNorm(
                                num_groups=min(in_ch // 4, 32), epsilon=1e-6,
                                dtype=self.dtype,
                            )
                        )
                        modules.append(
                            Conv3x3(channels, use_bias=True,
                                    init_scale=init_scale, dtype=self.dtype)
                        )
                        pyramid_ch = channels
                    elif self.progressive == "residual":
                        modules.append(pyramid_upsample(features=in_ch))
                        pyramid_ch = in_ch

            if i_level != 0:
                if self.resblock_type == "ddpm":
                    modules.append(Upsample(features=in_ch))
                else:
                    modules.append(ResnetBlock(up=True))

        assert not hs_c

        if self.progressive != "output_skip":
            # HeadGroupNorm is param-compatible with nn.GroupNorm and can
            # consume a width-s2d packed top level (region closure below)
            modules.append(
                dnn.HeadGroupNorm(num_groups=min(in_ch // 4, 32), dtype=self.dtype)
            )
            modules.append(Conv3x3(channels, init_scale=init_scale, dtype=self.dtype))

        self.all_modules = modules

        # latent mapping network (:271-277): PixelNorm, dense, act, n_mlp x (dense, act)
        self.pixel_norm = dnn.PixelNorm()
        self.z_transform_layers = [
            Dense(self.z_emb_dim) for _ in range(1 + self.n_mlp)
        ]

    def __call__(
        self,
        x: jnp.ndarray,
        time_cond: jnp.ndarray,
        z: jnp.ndarray,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        act = jax.nn.silu

        # latent mapping
        zemb = self.pixel_norm(z)
        for layer in self.z_transform_layers:
            zemb = act(layer(zemb))

        modules = self.all_modules
        m_idx = 0

        if self.embedding_type == "fourier":
            temb = modules[m_idx](jnp.log(time_cond))
            m_idx += 1
        else:  # positional
            temb = get_timestep_embedding(time_cond, self.nf)

        if self.conditional:
            temb = modules[m_idx](temb)
            m_idx += 1
            temb = modules[m_idx](act(temb))
            m_idx += 1
        else:
            temb = None

        if not self.centered:
            x = 2 * x - 1.0  # input in [0, 1]

        if self.dtype is not None:
            x = x.astype(self.dtype)

        # Downsampling
        input_pyramid = None
        if self.progressive_input != "none":
            input_pyramid = x

        # --- width-s2d REGION closure (DDGAN_TPU_S2D_CONV=1) -------------
        # The small-C big-spatial levels (≤64ch at ≥128²) run their whole
        # stride-1 resblock chain in the packed layout [B,H,W/2,2C]; the
        # packed tensors flow THROUGH blocks, skip concats and hs entries,
        # so tile-relayout copies happen only at region boundaries (FIR
        # up/down transitions, attention, final GN) instead of per conv.
        # Measured motivation: per-conv boxing paid +36.8 ms/step of data
        # formatting on the celeba256 recipe (perf/r4_prof_celeba256_*);
        # the op-level win of the packed formulation under full backward
        # is 2.68× (perf/r4_exp_conv256_fullbwd.txt).
        env = os.environ.get("DDGAN_TPU_S2D_CONV")
        s2d_on = (env == "1") if env in ("0", "1") else (self.s2d_conv != "off")
        # NB: no dropout gate — the packed resblock draws its mask in the
        # packed shape, which re-associates the iid Bernoulli bits to
        # different pixels than the plain path (same distribution, not the
        # same mask). The reference recipes train with the config-default
        # dropout, so gating on dropout==0 would silently disable the
        # closure for exactly the runs it targets.
        region = (
            s2d_on
            and self.resblock_type == "biggan"
            and self.progressive == "none"
        )
        if region:
            from ..ops.s2d import s2d_width, un_s2d_width

        def _elig(sp_h: int, sp_w: int, out_ch: int) -> bool:
            return (
                region
                and out_ch <= 64
                and sp_h * sp_w >= 128 * 128
                and sp_w % 2 == 0
                and sp_w not in self.attn_resolutions
            )

        # stem conv emits directly into the packed layout when the first
        # level is region-eligible: the [3,3,nc,nf] kernel widens to
        # [3,3,2nc,2nf] (lane-full output) and the only pack reshape is on
        # the tiny nc-channel input, not the nf-channel activation
        # (block 0 must be eligible too, else the packed stem output would
        # just unpack again at the first resblock).
        # DDGAN_TPU_S2D_EDGE gates the stem/head ("edge") closures
        # independently of the resblock region: "0" disables both,
        # "stem"/"head" enables only that one (bisect knob).
        edge = os.environ.get("DDGAN_TPU_S2D_EDGE", "1")
        stem_pk = (
            edge in ("1", "stem")
            and _elig(x.shape[1], x.shape[2], self.nf)
            and _elig(x.shape[1], x.shape[2], self.nf * self.ch_mult[0])
        )
        if stem_pk:
            hs = [modules[m_idx](s2d_width(x), packed_io=True)]
        else:
            hs = [modules[m_idx](x)]
        m_idx += 1
        pks = [stem_pk]  # parallel to hs: entry is in the packed layout
        h_pk = False
        num_resolutions = len(self.ch_mult)
        for i_level in range(num_resolutions):
            for i_block in range(self.num_res_blocks):
                xin, xpk = hs[-1], pks[-1]
                t_ch = xin.shape[-1] // 2 if xpk else xin.shape[-1]
                t_w = xin.shape[2] * 2 if xpk else xin.shape[2]
                out_ch = self.nf * self.ch_mult[i_level]
                if _elig(xin.shape[1], t_w, out_ch):
                    if not xpk:
                        xin = s2d_width(xin)
                    h = modules[m_idx](xin, temb, zemb, train, (t_ch,))
                    h_pk = True
                else:
                    if xpk:
                        xin = un_s2d_width(xin)
                    h = modules[m_idx](xin, temb, zemb, train, None)
                    h_pk = False
                m_idx += 1
                # resolution test: W axis (reference NCHW shape[-1] == W)
                if not h_pk and h.shape[2] in self.attn_resolutions:
                    h = modules[m_idx](h)
                    m_idx += 1
                hs.append(h)
                pks.append(h_pk)

            if i_level != num_resolutions - 1:
                xin, xpk = hs[-1], pks[-1]
                if xpk:
                    xin = un_s2d_width(xin)
                if self.resblock_type == "ddpm":
                    h = modules[m_idx](xin)
                    m_idx += 1
                else:
                    h = modules[m_idx](xin, temb, zemb, train, None)
                    m_idx += 1

                if self.progressive_input == "input_skip":
                    input_pyramid = self.pyramid_downsample(input_pyramid)
                    h = modules[m_idx](input_pyramid, h)
                    m_idx += 1
                elif self.progressive_input == "residual":
                    input_pyramid = modules[m_idx](input_pyramid)
                    m_idx += 1
                    if self.skip_rescale:
                        input_pyramid = (input_pyramid + h) / np.sqrt(2.0)
                    else:
                        input_pyramid = input_pyramid + h
                    h = input_pyramid
                hs.append(h)
                pks.append(False)

        h, h_pk = hs[-1], pks[-1]
        if h_pk:
            h = un_s2d_width(h)  # mid blocks run at the lowest resolution
            h_pk = False
        h = modules[m_idx](h, temb, zemb, train, None)
        m_idx += 1
        h = modules[m_idx](h)
        m_idx += 1
        h = modules[m_idx](h, temb, zemb, train, None)
        m_idx += 1

        pyramid = None

        # Upsampling
        for i_level in reversed(range(num_resolutions)):
            for i_block in range(self.num_res_blocks + 1):
                skip, spk = hs.pop(), pks.pop()
                h_ch = h.shape[-1] // 2 if h_pk else h.shape[-1]
                s_ch = skip.shape[-1] // 2 if spk else skip.shape[-1]
                t_w = skip.shape[2] * 2 if spk else skip.shape[2]
                out_ch = self.nf * self.ch_mult[i_level]
                # in==out with a multi-block input would need a relayout on
                # the identity skip (no Conv_2 in the reference there) —
                # fall back to plain for that (contrived-config) case
                if _elig(skip.shape[1], t_w, out_ch) and h_ch + s_ch != out_ch:
                    if not h_pk:
                        h = s2d_width(h)
                    if not spk:
                        skip = s2d_width(skip)
                    h = modules[m_idx](
                        jnp.concatenate([h, skip], axis=-1),
                        temb, zemb, train, (h_ch, s_ch),
                    )
                    h_pk = True
                else:
                    if h_pk:
                        h = un_s2d_width(h)
                        h_pk = False
                    if spk:
                        skip = un_s2d_width(skip)
                    h = modules[m_idx](
                        jnp.concatenate([h, skip], axis=-1), temb, zemb, train, None
                    )
                m_idx += 1

            if (h.shape[2] * 2 if h_pk else h.shape[2]) in self.attn_resolutions:
                if h_pk:
                    h = un_s2d_width(h)
                    h_pk = False
                h = modules[m_idx](h)
                m_idx += 1

            if self.progressive != "none":
                if i_level == num_resolutions - 1:
                    if self.progressive == "output_skip":
                        pyramid = act(modules[m_idx](h))
                        m_idx += 1
                        pyramid = modules[m_idx](pyramid)
                        m_idx += 1
                    elif self.progressive == "residual":
                        pyramid = act(modules[m_idx](h))
                        m_idx += 1
                        pyramid = modules[m_idx](pyramid)
                        m_idx += 1
                else:
                    if self.progressive == "output_skip":
                        pyramid = self.pyramid_upsample(pyramid)
                        pyramid_h = act(modules[m_idx](h))
                        m_idx += 1
                        pyramid_h = modules[m_idx](pyramid_h)
                        m_idx += 1
                        pyramid = pyramid + pyramid_h
                    elif self.progressive == "residual":
                        pyramid = modules[m_idx](pyramid)
                        m_idx += 1
                        if self.skip_rescale:
                            pyramid = (pyramid + h) / np.sqrt(2.0)
                        else:
                            pyramid = pyramid + h
                        h = pyramid

            if i_level != 0:
                if h_pk:
                    h = un_s2d_width(h)  # FIR up/down runs in plain layout
                    h_pk = False
                if self.resblock_type == "ddpm":
                    h = modules[m_idx](h)
                    m_idx += 1
                else:
                    h = modules[m_idx](h, temb, zemb, train, None)
                    m_idx += 1

        assert not hs

        if self.progressive == "output_skip":
            if h_pk:
                h = un_s2d_width(h)
                h_pk = False
            h = pyramid
        elif h_pk and edge in ("1", "head"):
            # head stays in the packed layout: HeadGroupNorm takes packed
            # stats, conv_out runs with the widened kernel, and the only
            # unpack is a free-ish reshape of the tiny [B,H,W/2,2*nc]
            # output — the 256²-level activation never relayouts.
            h = act(modules[m_idx](h, packed=True))
            m_idx += 1
            h = modules[m_idx](h, packed_io=True)
            m_idx += 1
            h = un_s2d_width(h)
            h_pk = False
        else:
            if h_pk:
                h = un_s2d_width(h)
                h_pk = False
            h = act(modules[m_idx](h))
            m_idx += 1
            h = modules[m_idx](h)
            m_idx += 1

        assert m_idx == len(modules)

        h = h.astype(jnp.float32)
        if not self.not_use_tanh:
            return jnp.tanh(h)
        return h
