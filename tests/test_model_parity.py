"""Golden parity: flax models with imported torch weights must reproduce
the reference models' outputs (same inputs, eval mode, fp32).

This is the strongest available correctness check (SURVEY.md §7 hard-part
2): it exercises the full generator/discriminator graphs — adaGN, FIR
resampling, attention, minibatch-stddev, time/z embeddings — AND the
compat checkpoint importer in one shot. The reference code runs from
/root/reference with its CUDA ops stubbed by a pure-torch golden model
(tests/torch_ref.py).
"""

import argparse

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ddgan_tpu.compat import convert_torch_state_dict
from ddgan_tpu.models import NCSNpp, DiscriminatorSmall, DiscriminatorLarge

from torch_ref import install_reference

install_reference()

from score_sde.models.ncsnpp_generator_adagn import NCSNpp as TorchNCSNpp  # noqa: E402
from score_sde.models.discriminator import (  # noqa: E402
    Discriminator_small as TorchDiscSmall,
    Discriminator_large as TorchDiscLarge,
)


def tiny_gen_args(**over):
    base = dict(
        not_use_tanh=False,
        z_emb_dim=32,
        num_channels_dae=16,
        ch_mult=[1, 2],
        num_res_blocks=1,
        attn_resolutions=[8],
        dropout=0.0,
        resamp_with_conv=True,
        image_size=16,
        conditional=True,
        fir=True,
        fir_kernel=[1, 3, 3, 1],
        skip_rescale=True,
        resblock_type="biggan",
        progressive="none",
        progressive_input="residual",
        progressive_combine="sum",
        embedding_type="positional",
        fourier_scale=16.0,
        num_channels=3,
        nz=10,
        n_mlp=2,
        centered=True,
    )
    base.update(over)
    return argparse.Namespace(**base)


def run_parity(args, atol=2e-5):
    torch.manual_seed(0)
    tm = TorchNCSNpp(args)
    tm.eval()

    fm = NCSNpp.from_config(args)
    k = jax.random.PRNGKey(0)
    b = 2
    x = np.random.RandomState(1).randn(b, args.image_size, args.image_size, args.num_channels).astype(np.float32)
    t = np.array([0, 3], dtype=np.int64)[:b]
    z = np.random.RandomState(2).randn(b, args.nz).astype(np.float32)

    template = fm.init(
        {"params": k, "dropout": k},
        jnp.asarray(x), jnp.asarray(t, jnp.int32), jnp.asarray(z),
    )
    params, buffers = convert_torch_state_dict(
        tm.state_dict(), template["params"], template.get("buffers")
    )
    variables = {"params": params}
    if buffers:
        variables["buffers"] = buffers

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(t),
            torch.from_numpy(z),
        ).numpy()
    ours = np.asarray(
        fm.apply(variables, jnp.asarray(x), jnp.asarray(t, jnp.int32), jnp.asarray(z))
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=atol)


def test_ncsnpp_parity_biggan_residual_input():
    """The shipped-config family: biggan blocks, progressive_input=residual."""
    run_parity(tiny_gen_args())


def test_ncsnpp_parity_output_skip_fourier():
    """Pyramid output path + input_skip + Fourier time embedding + oneadagn."""
    run_parity(
        tiny_gen_args(
            progressive="output_skip",
            progressive_input="input_skip",
            progressive_combine="cat",
            embedding_type="fourier",
            resblock_type="biggan_oneadagn",
            attn_resolutions=[],
        )
    )


def test_ncsnpp_parity_ddpm_fir():
    """DDPM resblocks + pure-FIR Upsample/Downsample (no conv), no tanh.

    NOTE two latent reference bugs cap what is parity-testable here:
    (a) non-FIR Upsample is unrunnable in torch — `F.interpolate(x,
    (H*2, W*2), 'nearest')` passes 'nearest' as scale_factor
    (layerspp.py:150); (b) FIR Upsample WITH conv passes a 4-element
    stride to conv_transpose2d (up_or_down_sampling.py:122-135). Both
    paths are dead code in the reference; ours implements the intent
    (nearest-2x / StyleGAN2 fused transposed conv, golden-tested in
    tests/test_upfirdn2d.py).
    """
    run_parity(
        tiny_gen_args(
            resblock_type="ddpm",
            fir=True,
            resamp_with_conv=False,
            not_use_tanh=True,
            skip_rescale=False,
            attn_resolutions=[],
        )
    )


def test_ncsnpp_parity_ddpm_nofir_single_resolution():
    """DDPM resblocks with naive resampling paths not involving the
    reference's broken Upsample (single resolution level)."""
    run_parity(
        tiny_gen_args(
            resblock_type="ddpm",
            fir=False,
            ch_mult=[1],
            num_res_blocks=2,
            progressive_input="none",
            attn_resolutions=[16],
        )
    )


def _disc_parity(torch_cls, flax_cls, image_size, nc, ngf, t_emb_dim):
    torch.manual_seed(0)
    tm = torch_cls(nc=2 * nc, ngf=ngf, t_emb_dim=t_emb_dim, act=torch.nn.LeakyReLU(0.2))
    tm.eval()
    fm = flax_cls(nc=2 * nc, ngf=ngf, t_emb_dim=t_emb_dim)

    b = 4  # covers stddev grouping (group=4)
    x = np.random.RandomState(3).randn(b, image_size, image_size, nc).astype(np.float32)
    xt = np.random.RandomState(4).randn(b, image_size, image_size, nc).astype(np.float32)
    t = np.array([0, 1, 2, 3], dtype=np.int64)

    k = jax.random.PRNGKey(0)
    template = fm.init(k, jnp.asarray(x), jnp.asarray(t, jnp.int32), jnp.asarray(xt))
    params, _ = convert_torch_state_dict(tm.state_dict(), template["params"])

    with torch.no_grad():
        ref = tm(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(t),
            torch.from_numpy(xt.transpose(0, 3, 1, 2)),
        ).numpy().reshape(-1)
    ours = np.asarray(
        fm.apply({"params": params}, jnp.asarray(x), jnp.asarray(t, jnp.int32), jnp.asarray(xt))
    ).reshape(-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-5)


def test_discriminator_small_parity():
    _disc_parity(TorchDiscSmall, DiscriminatorSmall, 16, 3, 8, 16)


def test_discriminator_large_parity():
    _disc_parity(TorchDiscLarge, DiscriminatorLarge, 64, 1, 4, 16)


def test_adagn_bf16_fold_no_cancellation():
    """The folded AdaptiveGroupNorm must not cancel catastrophically in
    bf16 when |mean| >> std per group (review r3): the naive x*a + b fold
    had O((mu/sigma)*2^-9) output error; the centered form with the
    mean-rounding residual folded into the f32 bias stays O(2^-9).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ddgan_tpu.nn.blocks import AdaptiveGroupNorm

    rng = np.random.RandomState(0)
    # bf16-representable inputs with mean 64, std ~0.5 per channel
    # (mu/sigma ~ 128; bf16 ulp at 64 is 0.25, so the signal survives
    # representation but the naive fold's intermediates would not)
    x_f = 64.0 + 0.5 * rng.randn(2, 8, 8, 32).astype(np.float32)
    x_bf = jnp.asarray(x_f).astype(jnp.bfloat16)
    style = jnp.asarray(rng.randn(2, 16).astype(np.float32))

    mod_bf = AdaptiveGroupNorm(num_groups=8, style_dim=16, dtype=jnp.bfloat16)
    mod_f32 = AdaptiveGroupNorm(num_groups=8, style_dim=16, dtype=None)
    params = mod_f32.init(jax.random.PRNGKey(1), jnp.asarray(x_f), style)

    # ground truth: f32 path on the SAME bf16-carried values
    ref = np.asarray(mod_f32.apply(params, x_bf.astype(jnp.float32), style))
    got = np.asarray(mod_bf.apply(params, x_bf, style), np.float32)
    scale = np.abs(ref).max() + 1e-6
    rel = np.abs(got - ref).max() / scale
    # centered+residual form: observed ~4e-3; the naive fold fails at ~0.2
    assert rel < 3e-2, rel
