"""flax → torch checkpoint export: keys must exactly match the reference
model's state_dict and the import→export round trip must be lossless."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from ddgan_tpu.compat import convert_torch_state_dict, export_torch_state_dict
from ddgan_tpu.models import NCSNpp, DiscriminatorSmall

from torch_ref import install_reference
from test_model_parity import tiny_gen_args

install_reference()

from score_sde.models.ncsnpp_generator_adagn import NCSNpp as TorchNCSNpp  # noqa: E402
from score_sde.models.discriminator import Discriminator_small as TorchDiscSmall  # noqa: E402


def test_generator_export_roundtrip():
    args = tiny_gen_args()
    torch.manual_seed(0)
    tm = TorchNCSNpp(args)
    fm = NCSNpp.from_config(args)
    k = jax.random.PRNGKey(0)
    template = fm.init(
        {"params": k, "dropout": k},
        jnp.zeros((1, args.image_size, args.image_size, 3)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, args.nz)),
    )
    params, buffers = convert_torch_state_dict(
        tm.state_dict(), template["params"], template.get("buffers")
    )
    exported = export_torch_state_dict(params, buffers)
    ref_sd = tm.state_dict()
    assert set(exported.keys()) == set(ref_sd.keys())
    for key in ref_sd:
        np.testing.assert_allclose(
            exported[key].numpy(), ref_sd[key].numpy(), rtol=1e-6, atol=1e-7,
            err_msg=key,
        )
    # and the reference model LOADS it strictly
    tm.load_state_dict(exported, strict=True)


def test_discriminator_export_roundtrip():
    torch.manual_seed(0)
    tm = TorchDiscSmall(nc=6, ngf=8, t_emb_dim=16, act=torch.nn.LeakyReLU(0.2))
    fm = DiscriminatorSmall(nc=6, ngf=8, t_emb_dim=16)
    k = jax.random.PRNGKey(0)
    x = jnp.zeros((4, 16, 16, 3))
    t = jnp.zeros((4,), jnp.int32)
    template = fm.init(k, x, t, x)
    params, _ = convert_torch_state_dict(tm.state_dict(), template["params"])
    exported = export_torch_state_dict(params)
    ref_sd = tm.state_dict()
    assert set(exported.keys()) == set(ref_sd.keys())
    tm.load_state_dict(exported, strict=True)
