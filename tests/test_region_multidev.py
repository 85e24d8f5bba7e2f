"""Multi-device coverage for the round-4 fast paths (VERDICT r4 item 5).

The packed width-s2d region closure, the shared-R1 vjp forward and the
zero1 sharded optimizer were all measured on ONE chip; every mesh test
used ≤16² configs below the ≥128² region threshold, so the packed
generator had zero coverage under shard_map. This test runs all three in
a single sharded step on the 8-device CPU mesh at image_size 128 with
tiny nf and asserts parity against the flags-off formulation (s2d and
shared-R1 are exact-parity rewrites; zero1 matches to float
associativity — same tolerances as tests/test_zero1.py).

Gated behind DDGAN_TPU_FULL_TESTS=1 for suite budget (two 128² step
compilations on one CPU core); one recorded run lives in
perf/r5_region_multidev_test.txt. Ref: /root/reference/ddgan.py:462-467
(the R1 path this must keep exact under sharding).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddgan_tpu.config import Config
from ddgan_tpu.diffusion import DiffusionCoefficients, PosteriorCoefficients
from ddgan_tpu.models import NCSNpp, DiscriminatorSmall
from ddgan_tpu.parallel import make_mesh, replicate, shard_batch
from ddgan_tpu.train import create_train_state, make_train_step
from ddgan_tpu.train.loop import build_optimizers
from ddgan_tpu.train.zero1 import Zero1OptState, place_zero1_state

pytestmark = pytest.mark.skipif(
    os.environ.get("DDGAN_TPU_FULL_TESTS", "0") != "1",
    reason="two 128² step compiles on one CPU core; DDGAN_TPU_FULL_TESTS=1 runs it",
)


def region_cfg(**kw):
    # 128² with nf=16: the top level (out_ch 16 ≤ 64, 128×128 ≥ 128²,
    # no attention there) is region-eligible — the packed layout actually
    # flows. dropout=0 keeps s2d exact-parity (packed dropout re-associates
    # masks by design).
    return Config(
        image_size=128, num_channels=1, num_channels_dae=16, ch_mult=[1, 2],
        num_res_blocks=1, attn_resolutions=[4], nz=4, z_emb_dim=8, n_mlp=1,
        t_emb_dim=8, ngf=4, num_timesteps=2, dropout=0.0, r1_gamma=0.05,
        lazy_reg=2, ema_decay=0.999, **kw,
    )


def _make_step_and_state(cfg, mesh):
    # every knob rides the CONFIG KEYS (s2d_conv / r1_shared /
    # optimizer_sharding) — the env overrides are deleted by the test, so
    # this also covers the durable config surface end-to-end. NB the env
    # vars are read at TRACE time, so config keys are the only way to hold
    # two differently-flagged compiled steps at once.
    gen = NCSNpp.from_config(cfg)
    disc = DiscriminatorSmall(
        nc=2 * cfg.num_channels, ngf=cfg.ngf, t_emb_dim=cfg.t_emb_dim
    )
    coeff = DiffusionCoefficients.create(cfg.num_timesteps, cfg.beta_min, cfg.beta_max)
    pos = PosteriorCoefficients.create(cfg.num_timesteps, cfg.beta_min, cfg.beta_max)
    tx_g, tx_d = build_optimizers(cfg, mesh)
    state = create_train_state(
        jax.random.PRNGKey(0), gen, disc, tx_g, tx_d,
        (cfg.image_size, cfg.image_size, cfg.num_channels), cfg.nz,
        batch=2, use_ema=True,
    )
    if isinstance(state.opt_G, Zero1OptState):
        state = place_zero1_state(mesh, state)
    else:
        state = replicate(mesh, state)
    step = make_train_step(
        gen, disc, coeff, pos,
        num_timesteps=cfg.num_timesteps, nz=cfg.nz, r1_gamma=cfg.r1_gamma,
        lazy_reg=cfg.lazy_reg, ema_decay=cfg.ema_decay, use_ema=True,
        tx_g=tx_g, tx_d=tx_d, mesh=mesh, donate=False,
        r1_shared=str(cfg.r1_shared),
    )
    return step, state


def _tree_allclose(a, b, rtol=3e-4, atol=3e-5):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(
            np.asarray(la, np.float32), np.asarray(lb, np.float32),
            rtol=rtol, atol=atol,
        )


def test_region_r1shared_zero1_sharded_parity(monkeypatch):
    """region closure + shared-R1 + zero1 under shard_map on 8 devices ==
    plain path (s2d off, recompute-R1, replicated optax) trajectory."""
    for var in ("DDGAN_TPU_ZERO1", "DDGAN_TPU_R1_SHARED", "DDGAN_TPU_S2D_CONV",
                "DDGAN_TPU_S2D_EDGE"):
        monkeypatch.delenv(var, raising=False)
    mesh = make_mesh()
    assert len(jax.devices()) == 8

    cfg_fast = region_cfg(
        s2d_conv="auto", r1_shared="yes", optimizer_sharding="zero1"
    )
    cfg_plain = region_cfg(
        s2d_conv="off", r1_shared="no", optimizer_sharding="replicated"
    )

    # trace-level guard: the 128² config really engages the packed region
    # (abstract eval only — no compile) so the parity below is s2d-vs-plain,
    # not plain-vs-plain
    g_on = NCSNpp.from_config(cfg_fast)
    g_off = NCSNpp.from_config(cfg_plain)
    x = jnp.zeros((1, 128, 128, 1), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    z = jnp.zeros((1, cfg_fast.nz), jnp.float32)
    v = g_off.init(jax.random.PRNGKey(0), x, t, z)
    jx_on = jax.make_jaxpr(lambda p: g_on.apply(p, x, t, z))(v)
    jx_off = jax.make_jaxpr(lambda p: g_off.apply(p, x, t, z))(v)
    assert str(jx_on) != str(jx_off), "s2d region did not engage at 128²"

    step_f, state_f = _make_step_and_state(cfg_fast, mesh)
    step_p, state_p = _make_step_and_state(cfg_plain, mesh)

    # identical init regardless of flags (param tree is flag-agnostic)
    _tree_allclose(state_f.params_G, state_p.params_G, rtol=0, atol=0)

    batch = shard_batch(
        mesh,
        jnp.asarray(
            np.random.RandomState(0)
            .uniform(-1, 1, (8, cfg_fast.image_size, cfg_fast.image_size, 1))
            .astype(np.float32)
        ),
    )
    lr = jnp.asarray(1e-3, jnp.float32)
    for i in range(3):  # covers both lazy-R1 branches (lazy_reg=2)
        key = jax.random.PRNGKey(i + 1)
        state_f, m_f = step_f(state_f, batch, key, lr, lr)
        state_p, m_p = step_p(state_p, batch, key, lr, lr)
        np.testing.assert_allclose(
            float(m_f.errD), float(m_p.errD), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            float(m_f.errG), float(m_p.errG), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            float(m_f.grad_penalty), float(m_p.grad_penalty), rtol=1e-4, atol=1e-5
        )

    _tree_allclose(state_f.params_G, state_p.params_G)
    _tree_allclose(state_f.params_D, state_p.params_D)
    _tree_allclose(state_f.ema_G, state_p.ema_G)

    # the fast state really took the sharded-optimizer path
    assert isinstance(state_f.opt_G, Zero1OptState)
    assert state_f.opt_G.mu.addressable_shards[0].data.shape[0] == 1
