"""ZeRO-1 sharded optimizer state vs the replicated path (8-dev CPU mesh).

The replicated default keeps full Adam moment trees on every device (the
DDP model, ddgan.py:297-313 + :363-365); Zero1Optimizer shards them over
the data axis (train/zero1.py: psum_scatter grads → per-shard Adam →
all_gather updates). Same math, 1/n the optimizer memory per device —
these tests pin the trajectory equivalence and the sharded layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddgan_tpu.config import Config
from ddgan_tpu.diffusion import DiffusionCoefficients, PosteriorCoefficients
from ddgan_tpu.models import NCSNpp, DiscriminatorSmall
from ddgan_tpu.parallel import make_mesh, replicate, shard_batch
from ddgan_tpu.train import (
    create_train_state,
    make_optimizer,
    make_train_step,
    make_zero1_optimizer,
    place_zero1_state,
)


def tiny_cfg():
    return Config(
        image_size=8, num_channels=1, num_channels_dae=8, ch_mult=[1],
        num_res_blocks=1, attn_resolutions=[4], nz=4, z_emb_dim=8, n_mlp=1,
        t_emb_dim=8, ngf=4, num_timesteps=2, dropout=0.0, r1_gamma=0.05,
        lazy_reg=2, ema_decay=0.999,
    )


def _tree_allclose(a, b, rtol=3e-4, atol=3e-5):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=rtol, atol=atol
        )


def test_zero1_matches_replicated_trajectory():
    cfg = tiny_cfg()
    gen = NCSNpp.from_config(cfg)
    disc = DiscriminatorSmall(
        nc=2 * cfg.num_channels, ngf=cfg.ngf, t_emb_dim=cfg.t_emb_dim
    )
    coeff = DiffusionCoefficients.create(cfg.num_timesteps, cfg.beta_min, cfg.beta_max)
    pos = PosteriorCoefficients.create(cfg.num_timesteps, cfg.beta_min, cfg.beta_max)
    mesh = make_mesh()
    n = len(jax.devices())
    assert n == 8, "conftest should give 8 virtual CPU devices"

    wd = 1e-3  # exercise the L2-into-grad path too
    common = dict(
        num_timesteps=cfg.num_timesteps, nz=cfg.nz, r1_gamma=cfg.r1_gamma,
        lazy_reg=cfg.lazy_reg, ema_decay=cfg.ema_decay, use_ema=True,
        mesh=mesh, donate=False,
    )
    shape = (cfg.image_size, cfg.image_size, cfg.num_channels)

    tx_d = make_optimizer(cfg.beta1_d, cfg.beta2_d, wd, cfg.grad_clip_norm)
    tx_g = make_optimizer(cfg.beta1_g, cfg.beta2_g, wd, cfg.grad_clip_norm)
    state_r = create_train_state(
        jax.random.PRNGKey(0), gen, disc, tx_g, tx_d, shape, cfg.nz,
        batch=2, use_ema=True,
    )
    state_r = replicate(mesh, state_r)
    step_r = make_train_step(gen, disc, coeff, pos, tx_g=tx_g, tx_d=tx_d, **common)

    z_d = make_zero1_optimizer(cfg.beta1_d, cfg.beta2_d, wd, cfg.grad_clip_norm, n)
    z_g = make_zero1_optimizer(cfg.beta1_g, cfg.beta2_g, wd, cfg.grad_clip_norm, n)
    state_z = create_train_state(
        jax.random.PRNGKey(0), gen, disc, z_g, z_d, shape, cfg.nz,
        batch=2, use_ema=True,
    )
    state_z = place_zero1_state(mesh, state_z)
    step_z = make_train_step(gen, disc, coeff, pos, tx_g=z_g, tx_d=z_d, **common)

    batch = shard_batch(
        mesh,
        jnp.asarray(
            np.random.RandomState(0)
            .uniform(-1, 1, (16, cfg.image_size, cfg.image_size, cfg.num_channels))
            .astype(np.float32)
        ),
    )
    lr = jnp.asarray(1e-3, jnp.float32)
    for i in range(4):  # covers both lazy-R1 branches twice
        key = jax.random.PRNGKey(i + 1)
        state_r, m_r = step_r(state_r, batch, key, lr, lr)
        state_z, m_z = step_z(state_z, batch, key, lr, lr)
        np.testing.assert_allclose(
            float(m_r.errD), float(m_z.errD), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            float(m_r.errG), float(m_z.errG), rtol=1e-4, atol=1e-5
        )

    _tree_allclose(state_r.params_G, state_z.params_G)
    _tree_allclose(state_r.params_D, state_z.params_D)
    _tree_allclose(state_r.ema_G, state_z.ema_G)

    # layout: moments are (n, ceil(P/n)) globally, ONE row per device —
    # each device's optimizer memory is 1/n of the replicated path's
    total_g = sum(int(l.size) for l in jax.tree.leaves(state_z.params_G))
    shard_len = -(-total_g // n)
    assert state_z.opt_G.mu.shape == (n, shard_len)
    local = state_z.opt_G.mu.addressable_shards[0].data
    assert local.shape == (1, shard_len)

    # replicated baseline: every device holds the FULL moment tree
    rep_mu_bytes = sum(
        l.size * l.dtype.itemsize
        for l in jax.tree.leaves(state_r.opt_G)
        if hasattr(l, "dtype")
    )
    z1_local_bytes = 2 * shard_len * 4 + 4
    assert z1_local_bytes < rep_mu_bytes / (n / 2)


def test_zero1_loop_e2e(monkeypatch, tmp_path):
    """DDGAN_TPU_ZERO1=1 through the real train() loop: sharded moments in
    the checkpointed state, finite losses, resume continuity."""
    from ddgan_tpu.train import Zero1OptState
    from ddgan_tpu.train import loop as loop_mod

    monkeypatch.setenv("DDGAN_TPU_ZERO1", "1")
    monkeypatch.chdir(tmp_path)
    common = dict(
        dataset="synthetic", exp="z1", image_size=8, num_channels=1,
        num_channels_dae=8, ch_mult=[1], num_res_blocks=1,
        attn_resolutions=[4], nz=4, z_emb_dim=8, n_mlp=1, t_emb_dim=8,
        ngf=4, num_timesteps=2, batch_size=2, limited_iter=2,
        dropout=0.0, lazy_reg=2, ema_decay=0.999, use_ema=True, seed=7,
        save_content=True, save_content_every=1,
    )
    s1 = loop_mod.train(Config(num_epoch=1, **common))
    n = jax.local_device_count()
    assert isinstance(s1.opt_G, Zero1OptState)
    assert s1.opt_G.mu.shape[0] == n
    assert np.isfinite(np.asarray(s1.params_G["Dense_0"]["kernel"] if "Dense_0" in s1.params_G else jax.tree.leaves(s1.params_G)[0])).all()

    s2 = loop_mod.train(Config(num_epoch=2, resume=True, **common))
    assert int(s2.epoch) > int(s1.epoch) and int(s2.step) > int(s1.step)
    assert isinstance(s2.opt_G, Zero1OptState)
    assert np.isfinite(np.asarray(jax.tree.leaves(s2.params_G)[0])).all()


def test_zero1_requires_mesh():
    cfg = tiny_cfg()
    gen = NCSNpp.from_config(cfg)
    disc = DiscriminatorSmall(
        nc=2 * cfg.num_channels, ngf=cfg.ngf, t_emb_dim=cfg.t_emb_dim
    )
    coeff = DiffusionCoefficients.create(cfg.num_timesteps, cfg.beta_min, cfg.beta_max)
    pos = PosteriorCoefficients.create(cfg.num_timesteps, cfg.beta_min, cfg.beta_max)
    z = make_zero1_optimizer(0.5, 0.9, 0.0, 1.0, 8)
    with pytest.raises(ValueError, match="mesh"):
        make_train_step(
            gen, disc, coeff, pos,
            num_timesteps=cfg.num_timesteps, nz=cfg.nz, r1_gamma=0.0,
            lazy_reg=None, ema_decay=0.999, use_ema=False,
            tx_g=z, tx_d=z, mesh=None,
        )
