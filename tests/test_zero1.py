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


# ---------------------------------------------------------------------------
# optimizer_sharding as a first-class config key + cross-mode resume (r5)
# ---------------------------------------------------------------------------

def _models(cfg):
    gen = NCSNpp.from_config(cfg)
    disc = DiscriminatorSmall(
        nc=2 * cfg.num_channels, ngf=cfg.ngf, t_emb_dim=cfg.t_emb_dim
    )
    return gen, disc


def _fill_distinct(tree):
    """Per-leaf distinct constants so flatten ORDER is verifiable."""
    leaves, td = jax.tree.flatten(tree)
    out = []
    for i, l in enumerate(leaves):
        out.append(jnp.full(l.shape, (i + 1) / 10.0, l.dtype))
    return jax.tree.unflatten(td, out)


def test_optimizer_sharding_config_key(monkeypatch):
    """The durable surface: configs/config.json `optimizer_sharding` reaches
    build_optimizers without env vars; DDGAN_TPU_ZERO1 stays an override."""
    from ddgan_tpu.train.loop import build_optimizers, resolve_optimizer_sharding
    from ddgan_tpu.train.zero1 import Zero1Optimizer
    import optax

    monkeypatch.delenv("DDGAN_TPU_ZERO1", raising=False)
    mesh = make_mesh()
    cfg = tiny_cfg()
    assert resolve_optimizer_sharding(cfg) == "replicated"
    tx_g, tx_d = build_optimizers(cfg, mesh)
    assert isinstance(tx_g, optax.GradientTransformation)

    cfg_z = tiny_cfg().replace(optimizer_sharding="zero1")
    tx_g, tx_d = build_optimizers(cfg_z, mesh)
    assert isinstance(tx_g, Zero1Optimizer)
    assert tx_g.num_shards == mesh.shape["data"]  # data-axis size, not mesh product

    with pytest.raises(ValueError, match="optimizer_sharding"):
        build_optimizers(tiny_cfg().replace(optimizer_sharding="zero2"), mesh)

    # env var overrides the config key in BOTH directions (bisect knob)
    monkeypatch.setenv("DDGAN_TPU_ZERO1", "0")
    assert resolve_optimizer_sharding(cfg_z) == "replicated"
    monkeypatch.setenv("DDGAN_TPU_ZERO1", "1")
    assert resolve_optimizer_sharding(cfg) == "zero1"


def test_cross_mode_checkpoint_conversion(tmp_path):
    """content.ckpt adapts across optimizer_sharding modes at load time:
    replicated Adam moments flatten into the zero1 row layout and back,
    preserving values and tree order (VERDICT r4 item 1 / ADVICE r4)."""
    from ddgan_tpu.train import checkpoint as ckpt

    cfg = tiny_cfg()
    gen, disc = _models(cfg)
    shape = (cfg.image_size, cfg.image_size, cfg.num_channels)
    n = len(jax.devices())

    tx_g = make_optimizer(cfg.beta1_g, cfg.beta2_g, 0.0, cfg.grad_clip_norm)
    tx_d = make_optimizer(cfg.beta1_d, cfg.beta2_d, 0.0, cfg.grad_clip_norm)
    state_r = create_train_state(
        jax.random.PRNGKey(0), gen, disc, tx_g, tx_d, shape, cfg.nz, batch=2
    )
    state_r = state_r.replace(
        opt_G=_fill_distinct(state_r.opt_G), opt_D=_fill_distinct(state_r.opt_D)
    )
    dir_r = tmp_path / "rep"
    ckpt.save_content(dir_r, state_r, cfg)

    # replicated ckpt → zero1 template
    z_g = make_zero1_optimizer(cfg.beta1_g, cfg.beta2_g, 0.0, cfg.grad_clip_norm, n)
    z_d = make_zero1_optimizer(cfg.beta1_d, cfg.beta2_d, 0.0, cfg.grad_clip_norm, n)
    template_z = create_train_state(
        jax.random.PRNGKey(0), gen, disc, z_g, z_d, shape, cfg.nz, batch=2
    )
    loaded_z = ckpt.load_content(dir_r, template_z)
    adam = [s for s in state_r.opt_G if hasattr(s, "mu")][0]
    flat_mu = np.concatenate(
        [np.ravel(np.asarray(l)) for l in jax.tree.leaves(adam.mu)]
    ).astype(np.float32)
    total = flat_mu.size
    got = np.asarray(loaded_z.opt_G.mu).reshape(-1)
    np.testing.assert_allclose(got[:total], flat_mu)
    assert (got[total:] == 0).all()  # zero padding

    # zero1 ckpt → replicated template (roundtrip recovers the tree)
    dir_z = tmp_path / "z1"
    ckpt.save_content(dir_z, loaded_z, cfg)
    template_r = create_train_state(
        jax.random.PRNGKey(0), gen, disc, tx_g, tx_d, shape, cfg.nz, batch=2
    )
    loaded_r = ckpt.load_content(dir_z, template_r)
    adam_back = [s for s in loaded_r.opt_G if hasattr(s, "mu")][0]
    _tree_allclose(adam_back.mu, adam.mu, rtol=0, atol=0)
    _tree_allclose(adam_back.nu, adam.nu, rtol=0, atol=0)

    # zero1 ckpt → zero1 template under a DIFFERENT device count (ADVICE r4:
    # the row layout bakes in num_shards; resharding must be transparent)
    z_g4 = make_zero1_optimizer(cfg.beta1_g, cfg.beta2_g, 0.0, cfg.grad_clip_norm, 4)
    z_d4 = make_zero1_optimizer(cfg.beta1_d, cfg.beta2_d, 0.0, cfg.grad_clip_norm, 4)
    template_z4 = create_train_state(
        jax.random.PRNGKey(0), gen, disc, z_g4, z_d4, shape, cfg.nz, batch=2
    )
    loaded_z4 = ckpt.load_content(dir_z, template_z4)
    assert loaded_z4.opt_G.mu.shape[0] == 4
    got4 = np.asarray(loaded_z4.opt_G.mu).reshape(-1)
    np.testing.assert_allclose(got4[:total], flat_mu)


def test_cross_mode_unrecognizable_raises():
    from ddgan_tpu.train.checkpoint import CheckpointShardingError, _adapt_one_opt
    from ddgan_tpu.train.zero1 import Zero1OptState

    params = {"w": jnp.zeros((3, 2))}
    z_tpl = Zero1OptState(
        mu=jnp.zeros((8, 1)), nu=jnp.zeros((8, 1)), count=jnp.zeros((), jnp.int32)
    )
    with pytest.raises(CheckpointShardingError, match="optimizer_sharding"):
        _adapt_one_opt({"0": {}}, z_tpl, params, "opt_G")


def test_cross_mode_resume_through_loop(monkeypatch, tmp_path):
    """Loop-level: train replicated, resume the same experiment with
    optimizer_sharding='zero1' from the config file (no env var) — the
    checkpoint converts and training continues with sharded moments."""
    from ddgan_tpu.train import Zero1OptState
    from ddgan_tpu.train import loop as loop_mod

    monkeypatch.delenv("DDGAN_TPU_ZERO1", raising=False)
    monkeypatch.chdir(tmp_path)
    common = dict(
        dataset="synthetic", exp="xmode", image_size=8, num_channels=1,
        num_channels_dae=8, ch_mult=[1], num_res_blocks=1,
        attn_resolutions=[4], nz=4, z_emb_dim=8, n_mlp=1, t_emb_dim=8,
        ngf=4, num_timesteps=2, batch_size=2, limited_iter=2,
        dropout=0.0, lazy_reg=2, ema_decay=0.999, use_ema=True, seed=7,
        save_content=True, save_content_every=1,
    )
    s1 = loop_mod.train(Config(num_epoch=1, **common))
    assert not isinstance(s1.opt_G, Zero1OptState)

    s2 = loop_mod.train(
        Config(num_epoch=2, resume=True, optimizer_sharding="zero1", **common)
    )
    assert isinstance(s2.opt_G, Zero1OptState)
    assert int(s2.epoch) > int(s1.epoch) and int(s2.step) > int(s1.step)
    assert np.isfinite(np.asarray(jax.tree.leaves(s2.params_G)[0])).all()

    # and back: zero1 ckpt resumed replicated
    s3 = loop_mod.train(
        Config(num_epoch=3, resume=True, optimizer_sharding="replicated", **common)
    )
    assert not isinstance(s3.opt_G, Zero1OptState)
    assert int(s3.step) > int(s2.step)
    assert np.isfinite(np.asarray(jax.tree.leaves(s3.params_G)[0])).all()
