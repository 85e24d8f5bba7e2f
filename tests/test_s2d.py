"""Width-only space-to-depth conv formulation: exact algebra parity.

The s2d-width layout (ops/s2d.py) must reproduce the ORIGINAL 3×3 conv
bit-for-math — it is a pure relayout of the same computation, used to
fill the MXU's 128 lanes at the C=64 256²/128² generator levels
(ncsnpp_generator_adagn.py at image_size 256). Checked in f32 on CPU
against lax's plain conv, stride 1 and stride 2, including the padding
edge columns, plus layout round-trip and gradient flow to the
underlying [3,3,C,F] parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ddgan_tpu.ops.s2d import (
    conv3x3_s2d,
    conv3x3_s2d_down,
    s2d_width,
    un_s2d_width,
    widen_s2d_kernel,
    widen_s2d_kernel_stride2,
)


def _conv(x, w, stride):
    return lax.conv_general_dilated(
        x, w, (stride, stride), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 6, 8, 5), jnp.float32)
    np.testing.assert_array_equal(un_s2d_width(s2d_width(x)), x)
    # channel layout is dj*C + c
    y = s2d_width(x)
    np.testing.assert_array_equal(np.asarray(y)[0, 0, 0, :5],
                                  np.asarray(x)[0, 0, 0])
    np.testing.assert_array_equal(np.asarray(y)[0, 0, 0, 5:],
                                  np.asarray(x)[0, 0, 1])


def test_s2d_conv_exact():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 12, 6), jnp.float32)
    w3 = jnp.asarray(rng.randn(3, 3, 6, 7) * 0.3, jnp.float32)
    ref = _conv(x, w3, 1)
    got = un_s2d_width(conv3x3_s2d(s2d_width(x), widen_s2d_kernel(w3)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_s2d_conv_stride2_exact():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 16, 6), jnp.float32)
    w3 = jnp.asarray(rng.randn(3, 3, 6, 4) * 0.3, jnp.float32)
    ref = _conv(x, w3, 2)  # (2, 4, 8, 4)
    got = un_s2d_width(
        conv3x3_s2d_down(s2d_width(x), widen_s2d_kernel_stride2(w3))
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_s2d_kernel_grad_flows_to_base_params():
    """widen_s2d_kernel is differentiable: training updates the SAME
    [3,3,C,F] parameters whether or not the level runs in s2d layout."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 4, 6, 2), jnp.float32)
    w3 = jnp.asarray(rng.randn(3, 3, 2, 2) * 0.3, jnp.float32)

    def loss_ref(w):
        return jnp.sum(_conv(x, w, 1) ** 2)

    def loss_s2d(w):
        y = conv3x3_s2d(s2d_width(x), widen_s2d_kernel(w))
        return jnp.sum(un_s2d_width(y) ** 2)

    g_ref = jax.grad(loss_ref)(w3)
    g_s2d = jax.grad(loss_s2d)(w3)
    np.testing.assert_allclose(np.asarray(g_s2d), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_s2d_auto_and_cvjp_match_plain_ad():
    """Both s2d conv AD strategies must equal plain lax conv AD in value,
    d/dx and d/dW: conv3x3_s2d_auto (plain AD through the widened kernel
    — the production path) and conv3x3_s2d_packed_cvjp (original-space
    d/dW — measured-and-rejected on chip, kept for the record)."""
    from ddgan_tpu.ops.s2d import conv3x3_s2d_auto, conv3x3_s2d_packed_cvjp

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 6, 10, 4), jnp.float32)
    w3 = jnp.asarray(rng.randn(3, 3, 4, 6) * 0.3, jnp.float32)
    dy = jnp.asarray(rng.randn(2, 6, 10, 6), jnp.float32)

    def cot(f):
        _, vjp = jax.vjp(f, x, w3)
        return vjp(dy)

    dx_ref, dw_ref = cot(lambda a, w: _conv(a, w, 1))
    for f in (
        conv3x3_s2d_auto,
        lambda a, w: un_s2d_width(conv3x3_s2d_packed_cvjp(s2d_width(a), w)),
    ):
        np.testing.assert_allclose(
            np.asarray(f(x, w3)), np.asarray(_conv(x, w3, 1)),
            rtol=1e-5, atol=1e-5)
        dx_got, dw_got = cot(f)
        np.testing.assert_allclose(np.asarray(dx_got), np.asarray(dx_ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dw_got), np.asarray(dw_ref),
                                   rtol=1e-5, atol=1e-5)


def test_widen_splits_exact():
    """Concat-of-packed inputs (up-path skip concats): the split-aware
    widened kernel must equal the plain conv on concat(a, b)."""
    from ddgan_tpu.ops.s2d import widen_s2d_kernel_splits

    rng = np.random.RandomState(7)
    a = jnp.asarray(rng.randn(2, 6, 12, 5), jnp.float32)
    b = jnp.asarray(rng.randn(2, 6, 12, 3), jnp.float32)
    w3 = jnp.asarray(rng.randn(3, 3, 8, 4) * 0.3, jnp.float32)
    ref = _conv(jnp.concatenate([a, b], axis=-1), w3, 1)
    p = jnp.concatenate([s2d_width(a), s2d_width(b)], axis=-1)
    got = un_s2d_width(conv3x3_s2d(p, widen_s2d_kernel_splits(w3, (5, 3))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_widen_1x1_splits_exact():
    """Packed 1×1 (skip Conv_2): block-diagonal widened matrix equals the
    plain 1×1 conv, including the concat-of-packed permutation."""
    from ddgan_tpu.ops.s2d import widen_1x1_kernel_splits

    rng = np.random.RandomState(8)
    a = jnp.asarray(rng.randn(2, 4, 10, 5), jnp.float32)
    b = jnp.asarray(rng.randn(2, 4, 10, 3), jnp.float32)
    w1 = jnp.asarray(rng.randn(8, 6) * 0.3, jnp.float32)
    ref = jnp.tensordot(jnp.concatenate([a, b], axis=-1), w1, axes=1)
    p = jnp.concatenate([s2d_width(a), s2d_width(b)], axis=-1)
    got = un_s2d_width(jnp.tensordot(p, widen_1x1_kernel_splits(w1, (5, 3)), axes=1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_biggan_block_packed_matches_default():
    """The packed resblock body (packed_splits=) must match the default
    path numerically — forward AND parameter grads — with the identical
    param tree, for both the identity-skip (single split) and the
    channel-changing concat-input (two splits, Conv_2 1×1) forms."""
    from ddgan_tpu.nn.blocks import ResnetBlockBigGANppAdagn

    rng = np.random.RandomState(6)
    temb = jnp.asarray(rng.randn(2, 16), jnp.float32)
    zemb = jnp.asarray(rng.randn(2, 12), jnp.float32)

    cases = [
        # (input true-channel splits, out_ch)
        ((8,), None),      # identity skip, single split
        ((8, 4), 8),       # up-path concat, Conv_2 skip rebuild
    ]
    for splits, out_ch in cases:
        parts = [
            jnp.asarray(rng.randn(2, 32, 64, cs), jnp.float32) for cs in splits
        ]
        x = jnp.concatenate(parts, axis=-1)
        xp = jnp.concatenate([s2d_width(p) for p in parts], axis=-1)
        blk = ResnetBlockBigGANppAdagn(act=jax.nn.silu, dropout=0.0, out_ch=out_ch)
        params = blk.init(jax.random.PRNGKey(0), x, temb, zemb)
        params_p = blk.init(jax.random.PRNGKey(0), xp, temb, zemb,
                            packed_splits=splits)
        assert jax.tree.structure(params) == jax.tree.structure(params_p)
        ref = blk.apply(params, x, temb, zemb)
        got = un_s2d_width(blk.apply(params, xp, temb, zemb,
                                     packed_splits=splits))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

        def loss_plain(p):
            return jnp.sum(blk.apply(p, x, temb, zemb) ** 2)

        def loss_packed(p):
            return jnp.sum(
                blk.apply(p, xp, temb, zemb, packed_splits=splits) ** 2
            )

        g_ref = jax.grad(loss_plain)(params)
        g_got = jax.grad(loss_packed)(params)
        for a, b, path in zip(
            jax.tree.leaves(g_got), jax.tree.leaves(g_ref),
            [p for p, _ in jax.tree_util.tree_leaves_with_path(g_ref)],
        ):
            # atol covers f32 reduction-reorder noise on near-cancelling
            # sums (grads are O(100) here, summed over thousands of pixels)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=5e-3, err_msg=str(path))


def test_conv3x3_s2d_boxed_flag_matches_default(monkeypatch):
    """DDGAN_TPU_S2D_BOXED=1 (the measured-and-rejected per-conv boxing,
    kept as an experiment knob) must keep the SAME param tree (conv/kernel
    + conv/bias) and numerics as the default nn.Conv path, so checkpoints
    are flag-agnostic (mirrors the _PairConv contract)."""
    from ddgan_tpu.nn.layers import Conv3x3

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 128, 128, 4), jnp.float32)

    monkeypatch.delenv("DDGAN_TPU_S2D_BOXED", raising=False)
    mod = Conv3x3(features=6)
    params = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(params, x)

    monkeypatch.setenv("DDGAN_TPU_S2D_BOXED", "1")
    mod2 = Conv3x3(features=6)
    params2 = mod2.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(params) == jax.tree.structure(params2)
    assert all(
        a.shape == b.shape
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2))
    )
    got = mod2.apply(params, x)  # same params through the s2d path
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # ineligible shapes (odd W / wide channels / small spatial) stay on
    # the default path under the flag
    small = jnp.asarray(rng.randn(1, 16, 16, 4), jnp.float32)
    out = mod2.apply(mod2.init(jax.random.PRNGKey(1), small), small)
    assert out.shape == (1, 16, 16, 6)


def test_ncsnpp_s2d_region_train_dropout(monkeypatch):
    """dropout>0 does NOT disable the region (the reference recipes train
    at the config-default dropout): the packed blocks draw masks in the
    packed shape — same iid distribution, different pixel association.
    Smoke: train-mode forward is finite and dropout actually acts."""
    from ddgan_tpu.models.ncsnpp import NCSNpp

    kw = dict(
        nf=8, ch_mult=(1,), num_res_blocks=1, attn_resolutions=(4,),
        image_size=128, dropout=0.5, resblock_type="biggan",
        progressive="none", progressive_input="residual",
        embedding_type="positional", nz=8, z_emb_dim=8, n_mlp=1,
    )
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.rand(1, 128, 128, 3), jnp.float32)
    t = jnp.asarray([0], jnp.int32)
    z = jnp.asarray(rng.randn(1, 8), jnp.float32)

    monkeypatch.setenv("DDGAN_TPU_S2D_CONV", "1")
    m = NCSNpp(**kw)
    params = m.init(jax.random.PRNGKey(0), x, t, z)
    out_eval = m.apply(params, x, t, z, train=False)
    out_tr1 = m.apply(params, x, t, z, train=True,
                      rngs={"dropout": jax.random.PRNGKey(1)})
    out_tr2 = m.apply(params, x, t, z, train=True,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    for o in (out_eval, out_tr1, out_tr2):
        assert bool(jnp.isfinite(o).all())
    # dropout acts: different masks → different outputs; eval ≠ train
    assert float(jnp.abs(out_tr1 - out_tr2).max()) > 0
    assert float(jnp.abs(out_tr1 - out_eval).max()) > 0


def test_s2d_conv_config_key():
    """`s2d_conv` rides the config like use_remat (extra attr, getattr'd by
    from_config): "off" disables the region closure, absent → "auto"."""
    from ddgan_tpu.config import Config
    from ddgan_tpu.models.ncsnpp import NCSNpp

    assert NCSNpp.from_config(Config()).s2d_conv == "auto"
    cfg = Config()
    setattr(cfg, "s2d_conv", "OFF")
    assert NCSNpp.from_config(cfg).s2d_conv == "off"


def test_remat_policy_config_keys():
    """`remat_policy` rides the config like use_remat; `use_remat` absent
    → "auto" = remat only at image_size ≥ 256 (measured: remat wins at
    256², loses below — perf/r4_celeba256_noremat_b8.txt)."""
    from ddgan_tpu.config import Config
    from ddgan_tpu.models.ncsnpp import NCSNpp

    assert NCSNpp.from_config(Config()).remat_policy == "full"
    assert NCSNpp.from_config(Config()).use_remat is False  # image_size 32
    cfg = Config(image_size=256)
    assert NCSNpp.from_config(cfg).use_remat is True
    setattr(cfg, "use_remat", "no")
    assert NCSNpp.from_config(cfg).use_remat is False
    setattr(cfg, "use_remat", True)
    setattr(cfg, "remat_policy", "SAVE-CONVS")
    m = NCSNpp.from_config(cfg)
    assert m.use_remat is True and m.remat_policy == "save-convs"


def test_remat_policy_save_convs_parity(monkeypatch):
    """remat_policy="save-convs" (save conv outputs, recompute the
    elementwise chain) must reproduce full-remat outputs and parameter
    grads exactly — the policy changes the AD schedule, not the math.
    Runs with dropout>0 so the recomputed mask determinism is covered."""
    from ddgan_tpu.models.ncsnpp import NCSNpp

    kw = dict(
        nf=8, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(4,),
        image_size=16, dropout=0.3, resblock_type="biggan",
        progressive="none", progressive_input="residual",
        embedding_type="positional", nz=16, z_emb_dim=16, n_mlp=1,
        use_remat=True,
    )
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
    t = jnp.asarray([0, 1], jnp.int32)
    z = jnp.asarray(rng.randn(2, 16), jnp.float32)
    dk = jax.random.PRNGKey(7)

    def run(policy):
        m = NCSNpp(**kw, remat_policy=policy)
        params = m.init(jax.random.PRNGKey(0), x, t, z)

        def loss(p):
            out = m.apply(p, x, t, z, train=True, rngs={"dropout": dk})
            return jnp.sum(out**2)

        return params, jax.value_and_grad(loss)(params)

    p_full, (l_full, g_full) = run("full")
    p_sc, (l_sc, g_sc) = run("save-convs")
    assert jax.tree.structure(p_full) == jax.tree.structure(p_sc)
    np.testing.assert_allclose(float(l_sc), float(l_full), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_sc), jax.tree.leaves(g_full)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_ncsnpp_s2d_region_parity(monkeypatch):
    """DDGAN_TPU_S2D_CONV=1 drives the whole-region closure in
    NCSNpp.__call__: identical param tree, forward numerics and parameter
    grads vs the flag-off model, on a config whose 128² level is eligible
    (packed skips through hs, concat splits in the up path, boundary
    unpacks at the FIR transition and final GN)."""
    from ddgan_tpu.models.ncsnpp import NCSNpp

    kw = dict(
        nf=8, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(4,),
        image_size=128, dropout=0.0, resblock_type="biggan",
        progressive="none", progressive_input="residual",
        embedding_type="positional", nz=16, z_emb_dim=16, n_mlp=1,
        use_remat=True,  # production 256² recipe setting; exercises the
        # static_argnums=(4,5) checkpoint wrapper around packed blocks
    )
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.rand(2, 128, 128, 3), jnp.float32)
    t = jnp.asarray([0, 1], jnp.int32)
    z = jnp.asarray(rng.randn(2, 16), jnp.float32)

    def loss(p, mdl):
        return jnp.sum(mdl.apply(p, x, t, z) ** 2)

    # "0" forces the plain path even though the model default is auto-on.
    # NB: the env var is read at TRACE time inside __call__, so ref AND
    # g_ref must both be computed while it is "0".
    monkeypatch.setenv("DDGAN_TPU_S2D_CONV", "0")
    m = NCSNpp(**kw)
    params = m.init(jax.random.PRNGKey(0), x, t, z)
    ref = m.apply(params, x, t, z)
    g_ref = jax.grad(lambda p: loss(p, m))(params)

    monkeypatch.setenv("DDGAN_TPU_S2D_CONV", "1")
    m2 = NCSNpp(**kw)
    params2 = m2.init(jax.random.PRNGKey(0), x, t, z)
    assert jax.tree.structure(params) == jax.tree.structure(params2)
    got = m2.apply(params, x, t, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    g_got = jax.grad(lambda p: loss(p, m2))(params)
    for a, b, path in zip(
        jax.tree.leaves(g_got), jax.tree.leaves(g_ref),
        [p for p, _ in jax.tree_util.tree_leaves_with_path(g_ref)],
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=5e-3, err_msg=str(path))
