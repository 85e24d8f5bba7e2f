"""Gradient-free train step for kind_of_optim='pso'.

Reference protocol (ddgan.py:438-533 PSO branches): per batch, compute
errD and errG forward-only, accumulate them; once more than 20 losses have
accumulated, call AdaptivePSO.step(losses) for that network and clear the
buffer. EMA still steps every iteration.

Implemented device-side: a fixed ring buffer of 21 losses per network
lives in the state; the PSO swarm update fires under `lax.cond` when the
buffer fills — one compiled step serves every iteration.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map
import functools

from ..diffusion import q_sample_pairs, sample_posterior
from .ema import ema_init, ema_update
from .pso_optim import AdaptivePSO, PSOState
from .step import StepMetrics

softplus = jax.nn.softplus

_BUF = 21  # reference triggers at len(local_loss) > 20 (ddgan.py:491,:513)


@struct.dataclass
class PSOTrainState:
    params_G: Any
    params_D: Any
    buffers_G: Any
    pso_G: PSOState
    pso_D: PSOState
    ema_G: Any
    loss_buf_G: jnp.ndarray  # (_BUF,)
    loss_buf_D: jnp.ndarray
    buf_count_G: jnp.ndarray
    buf_count_D: jnp.ndarray
    step: jnp.ndarray
    epoch: jnp.ndarray


def create_pso_train_state(
    key, gen, disc, pso: AdaptivePSO, image_shape, nz, batch=2, use_ema=True,
    buf_len: int = _BUF,
) -> PSOTrainState:
    kg, kd, kdrop, kpg, kpd = jax.random.split(key, 5)
    h, w, c = image_shape
    x = jnp.zeros((batch, h, w, c), jnp.float32)
    t = jnp.zeros((batch,), jnp.int32)
    z = jnp.zeros((batch, nz), jnp.float32)
    g_vars = gen.init({"params": kg, "dropout": kdrop}, x, t, z)
    params_G = g_vars["params"]
    buffers_G = g_vars.get("buffers", {})
    params_D = disc.init(kd, x, t, x)["params"]
    return PSOTrainState(
        params_G=params_G,
        params_D=params_D,
        buffers_G=buffers_G,
        pso_G=pso.init(kpg, params_G),
        pso_D=pso.init(kpd, params_D),
        ema_G=ema_init(params_G) if use_ema else None,
        loss_buf_G=jnp.zeros((buf_len,)),
        loss_buf_D=jnp.zeros((buf_len,)),
        buf_count_G=jnp.zeros((), jnp.int32),
        buf_count_D=jnp.zeros((), jnp.int32),
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
    )


def make_pso_train_step(
    gen, disc, coeff, pos_coeff, pso: AdaptivePSO,
    *, num_timesteps, nz, ema_decay, use_ema,
    mesh: Mesh | None = None, axis_name: str = "data", donate: bool = True,
    trigger: int = 20,
):
    """trigger: the swarm update fires once MORE THAN this many losses
    have accumulated (reference hardcodes 20, ddgan.py:491/:513); the
    state's ring buffers must hold trigger+1 entries
    (create_pso_train_state(buf_len=trigger+1)). Non-default values are
    for tests that exercise the identical protocol at shorter length."""
    def apply_D(params_D, x, t, x_t):
        return disc.apply({"params": params_D}, x, t, x_t).reshape(-1)

    def apply_G(params_G, buffers_G, x, t, z, dropout_key):
        variables = {"params": params_G}
        if buffers_G:
            variables["buffers"] = buffers_G
        return gen.apply(variables, x, t, z, train=True, rngs={"dropout": dropout_key})

    def local_step(coeff_, pos_coeff_, state: PSOTrainState, real, key, lr_g, lr_d):
        del lr_g, lr_d  # PSO has no learning rate
        # swarm-update keys MUST be identical on every device (the swarm
        # state is replicated; per-device randomness would silently
        # diverge params across shards) — derive them BEFORE folding in
        # the device index, which only the per-shard data noise uses
        key = jax.random.fold_in(key, state.step)
        k_psod, k_psog, key = jax.random.split(key, 3)
        if mesh is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        (kd_t, kd_q, kd_z, kd_post, kd_drop,
         kg_t, kg_q, kg_z, kg_post, kg_drop) = jax.random.split(key, 10)
        b = real.shape[0]

        # ---- D loss (forward only; ddgan.py:450-477 minus backward)
        t = jax.random.randint(kd_t, (b,), 0, num_timesteps)
        x_t, x_tp1 = q_sample_pairs(coeff_, real, t, kd_q)
        d_real = apply_D(state.params_D, x_t, t, x_tp1)
        errD_real = softplus(-d_real).mean()
        latent_z = jax.random.normal(kd_z, (b, nz), real.dtype)
        x0 = apply_G(state.params_G, state.buffers_G, x_tp1, t, latent_z, kd_drop)
        x_pos = sample_posterior(pos_coeff_, x0, x_tp1, t, kd_post)
        errD_fake = softplus(apply_D(state.params_D, x_pos, t, x_tp1)).mean()
        errD = errD_real + errD_fake

        # ---- G loss (fresh draws; ddgan.py:495-503)
        t2 = jax.random.randint(kg_t, (b,), 0, num_timesteps)
        _, x_tp1_g = q_sample_pairs(coeff_, real, t2, kg_q)
        latent_z2 = jax.random.normal(kg_z, (b, nz), real.dtype)
        x0g = apply_G(state.params_G, state.buffers_G, x_tp1_g, t2, latent_z2, kg_drop)
        x_pos_g = sample_posterior(pos_coeff_, x0g, x_tp1_g, t2, kg_post)
        errG = softplus(-apply_D(state.params_D, x_pos_g, t2, x_tp1_g)).mean()

        if mesh is not None:
            errD = jax.lax.pmean(errD, axis_name)
            errG = jax.lax.pmean(errG, axis_name)
            errD_real = jax.lax.pmean(errD_real, axis_name)
            errD_fake = jax.lax.pmean(errD_fake, axis_name)

        # ---- accumulate & maybe swarm-step (ddgan.py:491-493, :513-515)
        buf_len = state.loss_buf_D.shape[0]
        loss_buf_D = state.loss_buf_D.at[state.buf_count_D % buf_len].set(errD)
        cnt_d = state.buf_count_D + 1
        loss_buf_G = state.loss_buf_G.at[state.buf_count_G % buf_len].set(errG)
        cnt_g = state.buf_count_G + 1

        def do_pso_d(op):
            st, params, buf = op
            new_pso, new_params = pso.step(st, params, buf, k_psod)
            return new_pso, new_params, jnp.zeros((), jnp.int32)

        pso_D, params_D, new_cnt_d = jax.lax.cond(
            cnt_d > trigger,
            do_pso_d,
            lambda op: (op[0], op[1], cnt_d),
            (state.pso_D, state.params_D, loss_buf_D),
        )

        def do_pso_g(op):
            st, params, buf = op
            new_pso, new_params = pso.step(st, params, buf, k_psog)
            return new_pso, new_params, jnp.zeros((), jnp.int32)

        pso_G, params_G, new_cnt_g = jax.lax.cond(
            cnt_g > trigger,
            do_pso_g,
            lambda op: (op[0], op[1], cnt_g),
            (state.pso_G, state.params_G, loss_buf_G),
        )

        ema_G = ema_update(state.ema_G, params_G, ema_decay) if use_ema else state.ema_G

        metrics = StepMetrics(
            errD=errD, errD_real=errD_real, errD_fake=errD_fake,
            errG=errG, grad_penalty=jnp.zeros(()),
        )
        new_state = state.replace(
            params_G=params_G, params_D=params_D,
            pso_G=pso_G, pso_D=pso_D, ema_G=ema_G,
            loss_buf_G=loss_buf_G, loss_buf_D=loss_buf_D,
            buf_count_G=new_cnt_g, buf_count_D=new_cnt_d,
            step=state.step + 1,
        )
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(
            functools.partial(local_step, coeff, pos_coeff),
            donate_argnums=donate_argnums,
        )

    sharded = shard_map(
        functools.partial(local_step, coeff, pos_coeff),
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    # donate the state: params/opt/EMA buffers are updated in place in HBM
    # instead of being copied every step
    return jax.jit(sharded, donate_argnums=donate_argnums)


def make_pso_epoch_end(pso: AdaptivePSO):
    """Epoch-end swarm update (ddgan.py:528-533).

    The reference calls `optimizer.step(loss_values)` once more after the
    iteration loop with the FULL epoch loss list — fitness for particle i is
    `loss_values[i]`, i.e. the epoch's FIRST swarm_size batch losses — and
    its `local_loss_*` in-epoch buffers are re-declared every epoch
    (ddgan.py:436-437), so the in-step ring buffer resets at the boundary.

    The host pads epochs shorter than the swarm with +inf (an absent fitness
    never improves a particle); the reference would IndexError on such an
    epoch — fixed to intent, quirk-ledgered in STATUS.md.

    All inputs are replicated over the mesh; a plain jit preserves that, and
    the swarm keys are shared so the replicated swarm state stays identical
    on every device (same invariant as the in-step trigger above).
    """

    def epoch_end(state: PSOTrainState, loss_d, loss_g, key):
        kd, kg = jax.random.split(key)
        pso_D, params_D = pso.step(state.pso_D, state.params_D, loss_d, kd)
        pso_G, params_G = pso.step(state.pso_G, state.params_G, loss_g, kg)
        # EMA is per-iteration only in the reference (ddgan.py:518-519);
        # the epoch-end swarm step does not touch it.
        return state.replace(
            params_G=params_G, params_D=params_D,
            pso_G=pso_G, pso_D=pso_D,
            loss_buf_G=jnp.zeros_like(state.loss_buf_G),
            loss_buf_D=jnp.zeros_like(state.loss_buf_D),
            buf_count_G=jnp.zeros((), jnp.int32),
            buf_count_D=jnp.zeros((), jnp.int32),
        )

    return jax.jit(epoch_end, donate_argnums=(0,))


def pad_epoch_losses(losses, swarm_size: int):
    """Host helper: epoch loss list → (swarm_size,) fitness vector
    (first swarm_size losses, +inf-padded — see make_pso_epoch_end)."""
    import numpy as np

    out = np.full((swarm_size,), np.inf, np.float32)
    k = min(len(losses), swarm_size)
    out[:k] = np.asarray(losses[:k], np.float32)
    return out
