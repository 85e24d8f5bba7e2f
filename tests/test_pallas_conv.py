"""Correctness of the paired-pixel Pallas 3×3 conv (interpret mode on CPU)
against lax.conv_general_dilated, incl. the custom VJP and the Conv3x3
integration gate (DDGAN_TPU_PALLAS_CONV=1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ddgan_tpu.ops.experimental.pallas_conv import (
    _ref_conv,
    pair_conv3x3,
    supported,
)


def _mk(c_in, c_out=64, n=2, s=128, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, s, s, c_in).astype(np.float32), jnp.bfloat16)
    w = jnp.asarray((rng.randn(3, 3, c_in, c_out) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.randn(c_out).astype(np.float32))
    return x, w, b


@pytest.mark.parametrize("c_in", [64, 128])
def test_pair_conv_forward_matches_lax(c_in):
    x, w, b = _mk(c_in)
    got = np.asarray(pair_conv3x3(x, w, b), np.float32)
    ref = np.asarray(_ref_conv(x, w.astype(x.dtype), b), np.float32)
    # identical bf16 inputs; accumulation is f32 in both (XLA convs
    # accumulate f32 natively) — only bias-add rounding differs
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    assert err < 2e-2, err
    assert got.shape == ref.shape == (x.shape[0], 128, 128, 64)


def test_pair_conv_vjp_matches_lax():
    x, w, b = _mk(64, n=1, s=128, seed=3)

    def loss_pair(x_, w_, b_):
        return jnp.sum(pair_conv3x3(x_, w_, b_).astype(jnp.float32) ** 2)

    def loss_ref(x_, w_, b_):
        return jnp.sum(_ref_conv(x_, w_.astype(x_.dtype), b_).astype(jnp.float32) ** 2)

    gp = jax.grad(loss_pair, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, r, name in zip(gp[:2], gr[:2], ("dx", "dw")):
        a, r = np.asarray(a, np.float32), np.asarray(r, np.float32)
        err = np.max(np.abs(a - r)) / (np.max(np.abs(r)) + 1e-9)
        assert err < 5e-2, (name, err)
    # db suffers catastrophic cancellation in bf16 (XLA's own bias grad
    # accumulates in bf16 and lands ~0.5 rel from truth here) — compare
    # against the f64 ground truth Σ 2·y instead
    y = np.asarray(_ref_conv(x, w.astype(x.dtype), b), np.float64)
    db_true = 2.0 * y.sum(axis=(0, 1, 2))
    db = np.asarray(gp[2], np.float64)
    err = np.max(np.abs(db - db_true)) / (np.max(np.abs(db_true)) + 1e-9)
    assert err < 5e-2, ("db", err)


def test_supported_gate():
    assert supported((2, 128, 128, 64), (3, 3, 64, 64), jnp.bfloat16)
    assert supported((2, 256, 256, 128), (3, 3, 128, 64), jnp.bfloat16)
    assert not supported((2, 64, 64, 64), (3, 3, 64, 64), jnp.bfloat16)  # small
    assert not supported((2, 128, 128, 64), (3, 3, 64, 128), jnp.bfloat16)  # F=128
    assert not supported((2, 128, 128, 64), (3, 3, 64, 64), jnp.float32)  # f32
    assert not supported((2, 128, 130, 64), (3, 3, 64, 64), jnp.bfloat16)  # H≠W
    # H must divide into block_h=32 rows: 136² would truncate n_hb=h//32
    # and fail the output reshape at trace time
    assert not supported((2, 136, 136, 64), (3, 3, 64, 64), jnp.bfloat16)


def test_conv3x3_gate_uses_pallas(monkeypatch):
    """With the flag on, a qualifying Conv3x3 runs the pair kernel and the
    param tree is identical to the nn.Conv tree (flag-agnostic ckpts)."""
    from ddgan_tpu.nn.layers import Conv3x3

    x = jnp.zeros((1, 128, 128, 64), jnp.bfloat16)
    key = jax.random.PRNGKey(0)

    monkeypatch.delenv("DDGAN_TPU_PALLAS_CONV", raising=False)
    m_off = Conv3x3(64, dtype=jnp.bfloat16)
    p_off = m_off.init(key, x)

    monkeypatch.setenv("DDGAN_TPU_PALLAS_CONV", "1")
    m_on = Conv3x3(64, dtype=jnp.bfloat16)
    p_on = m_on.init(key, x)

    assert jax.tree_util.tree_structure(p_off) == jax.tree_util.tree_structure(p_on)
    shapes_off = jax.tree.map(lambda a: a.shape, p_off)
    shapes_on = jax.tree.map(lambda a: a.shape, p_on)
    assert shapes_off == shapes_on

    y_on = np.asarray(m_on.apply(p_off, x + 1.0), np.float32)
    y_off = np.asarray(m_off.apply(p_off, x + 1.0), np.float32)
    err = np.max(np.abs(y_on - y_off)) / (np.max(np.abs(y_off)) + 1e-9)
    assert err < 2e-2, err
