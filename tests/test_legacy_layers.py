"""Shape/finite tests for the legacy NCSNv1/v2 + DDPM layer library
(fast: jax.eval_shape for structure, one tiny concrete run per block)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddgan_tpu.nn import legacy


K = jax.random.PRNGKey(0)
X = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 16).astype(np.float32))


def _run(module, *args, **kwargs):
    variables = module.init({"params": K, "dropout": K}, *args, **kwargs)
    return module.apply(variables, *args, **kwargs)


def test_crp_rcu_blocks():
    out = _run(legacy.CRPBlock(16, n_stages=2), X)
    assert out.shape == X.shape and bool(jnp.isfinite(out).all())
    out = _run(legacy.RCUBlock(16, n_blocks=2, n_stages=2), X)
    assert out.shape == X.shape


def test_msf_and_refine():
    xs = [X, jnp.asarray(np.random.RandomState(1).randn(2, 4, 4, 8).astype(np.float32))]
    m = legacy.MSFBlock(12)
    v = m.init(K, xs, (8, 8))
    out = m.apply(v, xs, (8, 8))
    assert out.shape == (2, 8, 8, 12)

    r = legacy.RefineBlock(12)
    v = r.init(K, xs, (8, 8))
    out = r.apply(v, xs, (8, 8))
    assert out.shape == (2, 8, 8, 12)


def test_bilinear_matches_reference_semantics():
    """align_corners=True endpoints: corners map exactly."""
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    out = legacy._resize_bilinear(x, (4, 4))
    assert out.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(float(out[0, 0, 0, 0]), 0.0)
    np.testing.assert_allclose(float(out[0, 3, 3, 0]), 3.0)
    np.testing.assert_allclose(float(out[0, 0, 3, 0]), 1.0)


def test_pool_convs():
    out = _run(legacy.ConvMeanPool(8), X)
    assert out.shape == (2, 4, 4, 8)
    out = _run(legacy.MeanPoolConv(8), X)
    assert out.shape == (2, 4, 4, 8)
    out = _run(legacy.UpsampleConv(8), X)
    assert out.shape == (2, 16, 16, 8)


def test_residual_block():
    out = _run(legacy.ResidualBlock(16), X)
    assert out.shape == X.shape
    out = _run(legacy.ResidualBlock(24, resample="down"), X)
    assert out.shape == (2, 4, 4, 24)


def test_ddpm_blocks():
    x32 = jnp.asarray(np.random.RandomState(2).randn(1, 4, 4, 32).astype(np.float32))
    out = _run(legacy.AttnBlock(), x32)
    assert out.shape == x32.shape
    out = _run(legacy.UpsampleDDPM(32, with_conv=True), x32)
    assert out.shape == (1, 8, 8, 32)
    out = _run(legacy.DownsampleDDPM(32, with_conv=True), x32)
    assert out.shape == (1, 2, 2, 32)
    temb = jnp.zeros((1, 16))
    blk = legacy.ResnetBlockDDPM(act=jax.nn.silu, out_ch=64)
    v = blk.init({"params": K, "dropout": K}, x32, temb)
    out = blk.apply(v, x32, temb)
    assert out.shape == (1, 4, 4, 64)


def test_get_act_and_params():
    import types

    from ddgan_tpu.models.registry import get_ddpm_params, get_sigmas

    assert legacy.get_act("relu")(jnp.asarray(-1.0)) == 0.0
    assert float(legacy.get_act("swish")(jnp.asarray(0.0))) == 0.0
    with pytest.raises(NotImplementedError):
        legacy.get_act("nope")

    cfg = types.SimpleNamespace(sigma_max=50.0, sigma_min=0.01, num_scales=10)
    s = get_sigmas(cfg)
    assert s.shape == (10,) and s[0] > s[-1]
    cfg2 = types.SimpleNamespace(beta_min=0.1, beta_max=20.0, num_scales=1000)
    p = get_ddpm_params(cfg2)
    assert p["betas"].shape == (1000,)
    assert np.all(p["alphas_cumprod"] <= 1.0)
