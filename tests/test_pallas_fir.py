"""Pallas FIR kernels vs the XLA dilated-conv reference (interpret mode on
CPU; the same code path compiles on TPU). Covers forward parity for the
two hot specializations, dispatcher equivalence, and 1st/2nd-order
gradients (the R1 path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddgan_tpu.ops import resample
from ddgan_tpu.ops.experimental.pallas_upfirdn import down2x, up2x
from ddgan_tpu.ops.upfirdn2d import upfirdn2d_ref

FIR = np.array([1.0, 3.0, 3.0, 1.0])
FIR_ASYM = np.array([1.0, 2.0, 3.0, 4.0])  # catches kernel-flip bugs


def _k2d(gain=1.0, factor=1, fir=FIR):
    k = np.outer(fir, fir)
    return jnp.asarray(k / k.sum() * gain * factor**2)


def _k1d(gain=1.0, factor=1, fir=FIR):
    return tuple((fir / fir.sum() * (gain**0.5) * factor).tolist())


@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 16, 8, 128), (2, 4, 4, 5)])
def test_down2x_matches_xla(shape):
    x = jnp.asarray(np.random.RandomState(0).randn(*shape).astype(np.float32))
    got = down2x(x, _k1d())
    ref = upfirdn2d_ref(x, _k2d(), up=1, down=2, pad=(1, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("shape", [(2, 8, 8, 3), (1, 8, 16, 128)])
def test_up2x_matches_xla(shape):
    x = jnp.asarray(np.random.RandomState(1).randn(*shape).astype(np.float32))
    got = up2x(x, _k1d(factor=2))
    ref = upfirdn2d_ref(x, _k2d(factor=2), up=2, down=1, pad=(2, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_dispatcher_equivalence(monkeypatch):
    """resample.{down,up}sample_2d with the Pallas path forced must equal
    the XLA path."""
    x = jnp.asarray(np.random.RandomState(2).randn(2, 8, 8, 4).astype(np.float32))
    monkeypatch.setenv("DDGAN_TPU_PALLAS_FIR", "0")
    ref_d = resample.downsample_2d(x, FIR.tolist(), factor=2)
    ref_u = resample.upsample_2d(x, FIR.tolist(), factor=2)
    monkeypatch.setenv("DDGAN_TPU_PALLAS_FIR", "1")
    got_d = resample.downsample_2d(x, FIR.tolist(), factor=2)
    got_u = resample.upsample_2d(x, FIR.tolist(), factor=2)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u), rtol=1e-5, atol=1e-6)


def test_down2x_gradients_match_xla():
    x = jnp.asarray(np.random.RandomState(3).randn(1, 8, 8, 3).astype(np.float32))
    k1, k2 = _k1d(), _k2d()

    def f_pallas(v):
        return (down2x(v, k1) ** 2).sum()

    def f_xla(v):
        return (upfirdn2d_ref(v, k2, up=1, down=2, pad=(1, 1)) ** 2).sum()

    g_p = jax.grad(f_pallas)(x)
    g_x = jax.grad(f_xla)(x)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-5)

    # second order (R1 grad-of-grad)
    def r1_pallas(v):
        return (jax.grad(f_pallas)(v) ** 2).sum()

    def r1_xla(v):
        return (jax.grad(f_xla)(v) ** 2).sum()

    gg_p = jax.grad(r1_pallas)(x)
    gg_x = jax.grad(r1_xla)(x)
    np.testing.assert_allclose(np.asarray(gg_p), np.asarray(gg_x), rtol=1e-4, atol=1e-5)


def test_up2x_gradients_match_xla():
    x = jnp.asarray(np.random.RandomState(4).randn(1, 4, 4, 3).astype(np.float32))
    k1, k2 = _k1d(factor=2), _k2d(factor=2)

    def f_pallas(v):
        return (up2x(v, k1) ** 2).sum()

    def f_xla(v):
        return (upfirdn2d_ref(v, k2, up=2, down=1, pad=(2, 1)) ** 2).sum()

    g_p = jax.grad(f_pallas)(x)
    g_x = jax.grad(f_xla)(x)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("fir", [FIR, FIR_ASYM])
def test_asymmetric_kernel_matches_xla(fir):
    """upfirdn is TRUE convolution — asymmetric kernels expose tap-flip bugs."""
    x = jnp.asarray(np.random.RandomState(9).randn(1, 8, 8, 3).astype(np.float32))
    got_d = down2x(x, _k1d(fir=fir))
    ref_d = upfirdn2d_ref(x, _k2d(fir=fir), up=1, down=2, pad=(1, 1))
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d), rtol=1e-5, atol=1e-6)
    got_u = up2x(x, _k1d(factor=2, fir=fir))
    ref_u = upfirdn2d_ref(x, _k2d(factor=2, fir=fir), up=2, down=1, pad=(2, 1))
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref_u), rtol=1e-5, atol=1e-6)

    # gradients stay the adjoint of the same operator
    ga = jax.grad(lambda v: (down2x(v, _k1d(fir=fir)) ** 2).sum())(x)
    gb = jax.grad(lambda v: (upfirdn2d_ref(v, _k2d(fir=fir), up=1, down=2, pad=(1, 1)) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-5)
