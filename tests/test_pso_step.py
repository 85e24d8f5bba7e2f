"""PSO train-step protocol test: forward-only losses accumulate in the
device-side ring buffer; the swarm update fires only once more than
`trigger` losses have accumulated (ddgan.py:491-493/:513-515 protocol,
trigger=20 in the reference), params change only then; EMA steps every
iteration.

The default run exercises the IDENTICAL protocol at trigger=5 /
swarm_size=5 to keep the CPU suite under budget (the lax.cond trigger,
ring-buffer reset, replication invariant and epoch-end path are
length-independent). Set DDGAN_TPU_FULL_TESTS=1 to run the
reference-exact trigger=20 / swarm_size=20 version (~8 min on CPU).
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
from ddgan_tpu.train.pso_optim import AdaptivePSO
from ddgan_tpu.train.pso_step import create_pso_train_state, make_pso_train_step

FULL = os.environ.get("DDGAN_TPU_FULL_TESTS", "0") == "1"
TRIGGER = 20 if FULL else 5
SWARM = 20 if FULL else 5


def test_pso_step_protocol():
    cfg = Config(
        image_size=8, num_channels=1, num_channels_dae=8, ch_mult=[1],
        num_res_blocks=1, attn_resolutions=[4], nz=4, z_emb_dim=8, n_mlp=1,
        t_emb_dim=8, ngf=4, num_timesteps=2, dropout=0.0, ema_decay=0.9,
    )
    gen = NCSNpp.from_config(cfg)
    disc = DiscriminatorSmall(nc=2, ngf=4, t_emb_dim=8)
    coeff = DiffusionCoefficients.create(2, cfg.beta_min, cfg.beta_max)
    pos = PosteriorCoefficients.create(2, cfg.beta_min, cfg.beta_max)
    pso = AdaptivePSO(swarm_size=SWARM)
    mesh = make_mesh()
    state = create_pso_train_state(
        jax.random.PRNGKey(0), gen, disc, pso, (8, 8, 1), 4, batch=2,
        buf_len=TRIGGER + 1,
    )
    state = replicate(mesh, state)
    step = make_pso_train_step(
        gen, disc, coeff, pos, pso,
        num_timesteps=2, nz=4, ema_decay=0.9, use_ema=True, mesh=mesh,
        donate=False, trigger=TRIGGER,
    )
    batch = shard_batch(
        mesh,
        jnp.asarray(
            np.random.RandomState(0)
            .uniform(-1, 1, (16, 8, 8, 1))
            .astype(np.float32)
        ),
    )
    lr = jnp.asarray(0.0, jnp.float32)

    def l2diff(a, b):
        return sum(
            float(jnp.sum((x - y) ** 2))
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )

    params0 = state.params_G
    s = state
    for i in range(TRIGGER):
        s, m = step(s, batch, jax.random.PRNGKey(i), lr, lr)
        assert np.isfinite(float(m.errD)) and np.isfinite(float(m.errG))
    # TRIGGER losses accumulated — not yet >TRIGGER → params untouched
    assert int(s.buf_count_G) == TRIGGER
    assert l2diff(params0, s.params_G) == 0.0
    # EMA has stepped every iteration though (decays toward static params)
    assert l2diff(s.ema_G, state.ema_G) >= 0.0

    # (TRIGGER+1)th loss triggers the swarm step → params become gbest
    s, m = step(s, batch, jax.random.PRNGKey(100), lr, lr)
    assert int(s.buf_count_G) == 0  # buffer reset
    assert l2diff(params0, s.params_G) > 0.0
    assert float(s.pso_G.gbest_score) < float("inf")

    # swarm updates must stay REPLICATED across devices (the swarm keys
    # must not fold in the device index) — run past a second fire and
    # check every shard holds identical params and particles
    for i in range(TRIGGER + 1):
        s, _ = step(s, batch, jax.random.PRNGKey(200 + i), lr, lr)
    for tree in (s.params_G, s.pso_G.particles):
        leaf = jax.tree.leaves(tree)[0]
        shards = [np.asarray(x.data) for x in leaf.addressable_shards]
        for sh in shards[1:]:
            np.testing.assert_array_equal(shards[0], sh)

    # ---- epoch-end swarm update (ddgan.py:528-533): fires even when the
    # in-step >TRIGGER trigger never did (short epochs), and resets the
    # ring buffers. Without it, num_epoch=1 PSO-HPO configs with <21
    # iterations never move the params at all.
    from ddgan_tpu.train.pso_step import make_pso_epoch_end, pad_epoch_losses

    fresh = replicate(
        mesh,
        create_pso_train_state(
            jax.random.PRNGKey(1), gen, disc, pso, (8, 8, 1), 4, batch=2,
            buf_len=TRIGGER + 1,
        ),
    )
    params0 = fresh.params_G
    sE = fresh
    n_short = TRIGGER - 2  # a short epoch — never reaches the trigger
    epoch_losses_d, epoch_losses_g = [], []
    for i in range(n_short):
        sE, m = step(sE, batch, jax.random.PRNGKey(300 + i), lr, lr)
        epoch_losses_d.append(float(m.errD))
        epoch_losses_g.append(float(m.errG))
    assert l2diff(params0, sE.params_G) == 0.0  # in-step trigger never fired

    epoch_end = make_pso_epoch_end(pso)
    ld = pad_epoch_losses(epoch_losses_d, pso.swarm_size)
    lg = pad_epoch_losses(epoch_losses_g, pso.swarm_size)
    assert ld.shape == (SWARM,) and np.isinf(ld[n_short:]).all()  # +inf padding
    sE = epoch_end(
        sE,
        replicate(mesh, jnp.asarray(ld)),
        replicate(mesh, jnp.asarray(lg)),
        replicate(mesh, jax.random.PRNGKey(400)),
    )
    assert l2diff(params0, sE.params_G) > 0.0  # params moved to gbest
    assert int(sE.buf_count_G) == 0 and int(sE.buf_count_D) == 0
    assert float(jnp.sum(jnp.abs(sE.loss_buf_G))) == 0.0  # buffers reset
    assert float(sE.pso_G.gbest_score) < float("inf")
    # replication invariant holds through the epoch-end path too
    leaf = jax.tree.leaves(sE.params_G)[0]
    shards = [np.asarray(x.data) for x in leaf.addressable_shards]
    for sh in shards[1:]:
        np.testing.assert_array_equal(shards[0], sh)
