"""The fused DDGAN train step: D update, G update, EMA — one jitted SPMD
program over a `jax.sharding.Mesh`.

Reference semantics (ddgan.py:438-522, per batch):
  D: t ~ U[0,T); (x_t, x_{t+1}) = q_sample_pairs; errD_real =
     softplus(-D(x_t,t,x_{t+1})).mean(); lazy R1 penalty r1_gamma/2 *
     E||∂ D(x_t).sum()/∂x_t||² every `lazy_reg` steps (grad-of-grad);
     fakes from G → sample_posterior → errD_fake = softplus(D(·)).mean();
     clip grads, Adam step.
  G: fresh t/pairs/z; errG = softplus(-D(x_pos,t,x_{t+1})).mean() against
     the FRESHLY UPDATED D; clip, Adam step.
  EMA update on G params each iteration.

TPU design vs the reference's DDP:
  * the whole iteration is ONE compiled function under `shard_map` over a
    1-D 'data' mesh axis — batch sharded on axis 0, params replicated.
  * gradient all-reduce = `lax.pmean` over ICI (replaces NCCL bucket
    all-reduce inside DDP backward, ddgan.py:363-365); clipping happens on
    the averaged gradient, same math as torch clipping post-all-reduce
    local grads.
  * the R1 grad-of-grad flows through the XLA dilated-conv upfirdn2d, so no
    hand-written double-backward is needed (reference upfirdn2d.py:27-150).
  * randomness: the device key is fold_in(axis_index) — the SPMD analog of
    the reference's per-rank `seed + rank` (ddgan.py:189-191).
  * minibatch-stddev groups stay within each device's shard (exactly DDP's
    per-process semantics) because the whole loss runs per-shard under
    shard_map.
  * lazy R1 is a `lax.cond` on `step % lazy_reg` so one compiled step
    serves both branches. The reference's precedence bug (applies R1 for
    PSO runs too; crashes when lazy_reg is None with adam, ddgan.py:462)
    is fixed to the documented intent: R1 every lazy_reg steps, every step
    if lazy_reg is None (SURVEY.md §7 quirks).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..diffusion import (
    DiffusionCoefficients,
    PosteriorCoefficients,
    q_sample_pairs,
    sample_posterior,
)
from .ema import ema_update
from .optim import apply_lr
from .state import TrainState
from .zero1 import Zero1Optimizer, Zero1OptState, zero1_update_sharded

softplus = jax.nn.softplus


def _as_rbg_key(key: jnp.ndarray) -> jnp.ndarray:
    """Re-wrap a (possibly raw uint32[2]) threefry key as an 'rbg' typed key.

    Dropout masks are the largest random draws in the step (one
    [B,H,W,C] mask per resblock, regenerated again inside the backward
    pass). Under the default threefry impl the ~20-round xor/shift bit
    generation is fused into each Conv prologue and stalls the MXU —
    profiled at 89 vs 185 TFLOP/s for otherwise-identical resblock convs
    on v5e. The 'rbg' impl lowers bit generation to the TPU hardware
    `rng-bit-generator` op (key derivation via split/fold_in stays
    threefry on the 4-word key, so streams remain deterministic per
    (seed, shard, step)). Idempotent: an already-'rbg' key passes
    through unchanged.
    """
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        if jax.random.key_impl(key) == jax.random.key_impl(
            jax.random.key(0, impl="rbg")
        ):
            return key
        data = jax.random.key_data(key)
    else:
        data = key
    # The tile-to-4-words trick assumes 2-word threefry key data. If
    # jax_default_prng_impl were ever rbg/unsafe_rbg, raw keys would be
    # 4 words already and tiling would build an invalid 8-word buffer.
    if data.shape[-1] == 4:
        return jax.random.wrap_key_data(data, impl="rbg")
    assert data.shape[-1] == 2, f"unexpected PRNG key data shape {data.shape}"
    return jax.random.wrap_key_data(jnp.tile(data, 2), impl="rbg")


class StepMetrics(NamedTuple):
    errD: jnp.ndarray
    errD_real: jnp.ndarray
    errD_fake: jnp.ndarray
    errG: jnp.ndarray
    grad_penalty: jnp.ndarray


def make_train_step(
    gen,
    disc,
    coeff: DiffusionCoefficients,
    pos_coeff: PosteriorCoefficients,
    *,
    num_timesteps: int,
    nz: int,
    r1_gamma: float,
    lazy_reg: int | None,
    ema_decay: float,
    use_ema: bool,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    mesh: Mesh | None = None,
    axis_name: str = "data",
    update_g: bool = True,
    donate: bool = True,
    pair_d: bool | None = None,
    r1_shared: str = "auto",
) -> Callable:
    """Build the jitted train step.

    Returns step(state, batch, key, lr_g, lr_d) -> (state, StepMetrics).
    `batch` is the GLOBAL batch (NHWC), sharded over `axis_name` when a
    mesh is given. `lr_g`/`lr_d` are traced scalars from the per-epoch
    cosine schedule. With update_g=False, only D is updated (the
    d_updates_per_g_update>1 mode — parsed but dead in the reference,
    implemented here; SURVEY.md §7 quirks).
    """

    if pair_d is None:
        pair_d = os.environ.get("DDGAN_TPU_PAIR_D", "0") == "1"
    r1_shared = str(r1_shared).lower()
    if r1_shared not in ("auto", "yes", "no"):
        raise ValueError(
            f"r1_shared must be 'auto', 'yes' or 'no', got {r1_shared!r}"
        )

    # ZeRO-1: a Zero1Optimizer in place of the optax transformation shards
    # the Adam moments over the data axis (see zero1.py) — requires a mesh
    # (the sharding IS the point) and routes around the pmean+tx.update
    # path below.
    zero1_g = isinstance(tx_g, Zero1Optimizer)
    zero1_d = isinstance(tx_d, Zero1Optimizer)
    if (zero1_g or zero1_d) and mesh is None:
        raise ValueError("Zero1Optimizer requires a mesh (sharded moments)")

    def apply_D(params_D, x, t, x_t):
        # head returns float32 already; keep losses in full precision
        return disc.apply({"params": params_D}, x, t, x_t).reshape(-1).astype(
            jnp.float32
        )

    def apply_D_pair(params_D, x_a, x_b, t, x_t):
        """One batched D trunk call over concat(real, fake) — the big MXU
        convs run once at 2× batch instead of twice (the reference's two
        sequential D calls, ddgan.py:445-476). segments=2 keeps the
        minibatch-stddev statistic per sub-batch, so the math is identical
        to two separate calls (tested exactly in test_train_step.py)."""
        b = x_a.shape[0]
        out = disc.apply(
            {"params": params_D},
            jnp.concatenate([x_a, x_b], axis=0),
            jnp.concatenate([t, t], axis=0),
            jnp.concatenate([x_t, x_t], axis=0),
            segments=2,
        ).reshape(-1).astype(jnp.float32)
        return out[:b], out[b:]

    def apply_G(params_G, buffers_G, x, t, z, dropout_key):
        variables = {"params": params_G}
        if buffers_G:
            variables["buffers"] = buffers_G
        return gen.apply(
            variables, x, t, z, train=True, rngs={"dropout": dropout_key}
        )

    def local_step(coeff_, pos_coeff_, state: TrainState, real, key, lr_g, lr_d):
        # NOTE: only the dropout keys go through _as_rbg_key. Routing the
        # WHOLE step key through 'rbg' was measured 1% slower (1514 vs
        # 1528 samples/s) — the image-sized threefry noise draws already
        # fuse well, and they are tiny next to the per-resblock masks.
        if mesh is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        key = jax.random.fold_in(key, state.step)
        (
            kd_t, kd_q, kd_z, kd_post, kd_drop,
            kg_t, kg_q, kg_z, kg_post, kg_drop,
        ) = jax.random.split(key, 10)
        b = real.shape[0]

        # ---------------- D step ----------------
        t = jax.random.randint(kd_t, (b,), 0, num_timesteps)
        x_t, x_tp1 = q_sample_pairs(coeff_, real, t, kd_q)

        latent_z = jax.random.normal(kd_z, (b, nz), real.dtype)
        x_0_pred = apply_G(
            state.params_G, state.buffers_G, x_tp1, t, latent_z, _as_rbg_key(kd_drop)
        )
        x_pos = sample_posterior(pos_coeff_, x_0_pred, x_tp1, t, kd_post)
        x_pos = jax.lax.stop_gradient(x_pos)

        if lazy_reg is None:
            apply_r1 = jnp.asarray(True)
        else:
            apply_r1 = (state.step % lazy_reg) == 0

        def d_loss_fn(params_D):
            if pair_d:
                d_real, d_fake = apply_D_pair(params_D, x_t, x_pos, t, x_tp1)
            else:
                d_fake = apply_D(params_D, x_pos, t, x_tp1)
                d_real = None
            errD_fake = softplus(d_fake).mean()

            # ONE D(x_t) forward serves both the real loss and the R1
            # penalty: jax.vjp of the SAME application runs unconditionally
            # (its primal IS d_real) and only the input-gradient PULLBACK
            # sits inside the lazy-reg cond — the reference's separate
            # autograd.grad call (ddgan.py:452-462) recomputed the forward,
            # and so did r3 here: one full extra D(x_t) every lazy_reg
            # steps. The cond branch is backward-only; no forward lives
            # inside a conditional.
            #
            # Measured: −2.6 ms at 256² (the D forward is expensive there),
            # but a 20% LOSS at 32² (1254.7 vs 1558 samples/s/chip) — the
            # always-materialized vjp residuals cost more than the 1/15
            # recomputed forward when D is cheap. Default: shared only for
            # images ≥ 256². DDGAN_TPU_R1_SHARED=0/1 forces either
            # formulation (bisect/rollback knob, read at trace time).
            def r1_penalty_recompute(_):
                grad_real = jax.grad(
                    lambda xi: apply_D(params_D, xi, t, x_tp1).sum()
                )(x_t)
                grad_real = grad_real.astype(jnp.float32)
                gp = (grad_real.reshape(b, -1) ** 2).sum(axis=1).mean()
                return r1_gamma / 2.0 * gp

            # resolution order: env override (bisect knob) > config key
            # r1_shared ("yes"/"no") > "auto" = shared at ≥256² (trace-time)
            r1_shared_env = os.environ.get("DDGAN_TPU_R1_SHARED")
            if r1_shared_env is not None:
                use_shared = r1_shared_env != "0"
            elif r1_shared != "auto":
                use_shared = r1_shared == "yes"
            else:
                use_shared = x_t.shape[1] >= 256  # NHWC height, trace-time
            if pair_d or not use_shared:
                if d_real is None:
                    d_real = apply_D(params_D, x_t, t, x_tp1)
                penalty = jax.lax.cond(
                    apply_r1, r1_penalty_recompute,
                    lambda _: jnp.zeros(()), operand=None,
                )
            else:
                d_real, pullback = jax.vjp(
                    lambda xi: apply_D(params_D, xi, t, x_tp1), x_t
                )

                def r1_from_pullback(_):
                    (grad_real,) = pullback(jnp.ones_like(d_real))
                    grad_real = grad_real.astype(jnp.float32)
                    gp = (grad_real.reshape(b, -1) ** 2).sum(axis=1).mean()
                    return r1_gamma / 2.0 * gp

                penalty = jax.lax.cond(
                    apply_r1, r1_from_pullback,
                    lambda _: jnp.zeros(()), operand=None,
                )
            errD_real = softplus(-d_real).mean()
            loss = errD_real + errD_fake + penalty
            return loss, (errD_real, errD_fake, penalty)

        (_, (errD_real, errD_fake, penalty)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.params_D)
        if zero1_d:
            d_updates, opt_D = zero1_update_sharded(
                tx_d, d_grads, state.opt_D, state.params_D, axis_name
            )
        else:
            if mesh is not None:
                d_grads = jax.lax.pmean(d_grads, axis_name)
            d_updates, opt_D = tx_d.update(d_grads, state.opt_D, state.params_D)
        params_D = optax.apply_updates(state.params_D, apply_lr(d_updates, lr_d))

        # ---------------- G step (fresh t/pairs/z, updated D) ----------------
        if update_g:
            t2 = jax.random.randint(kg_t, (b,), 0, num_timesteps)
            _, x_tp1_g = q_sample_pairs(coeff_, real, t2, kg_q)
            latent_z2 = jax.random.normal(kg_z, (b, nz), real.dtype)

            def g_loss_fn(params_G):
                x0 = apply_G(
                    params_G, state.buffers_G, x_tp1_g, t2, latent_z2, _as_rbg_key(kg_drop)
                )
                x_pos_g = sample_posterior(pos_coeff_, x0, x_tp1_g, t2, kg_post)
                out = apply_D(params_D, x_pos_g, t2, x_tp1_g)
                return softplus(-out).mean()

            errG, g_grads = jax.value_and_grad(g_loss_fn)(state.params_G)
            if zero1_g:
                g_updates, opt_G = zero1_update_sharded(
                    tx_g, g_grads, state.opt_G, state.params_G, axis_name
                )
            else:
                if mesh is not None:
                    g_grads = jax.lax.pmean(g_grads, axis_name)
                g_updates, opt_G = tx_g.update(g_grads, state.opt_G, state.params_G)
            params_G = optax.apply_updates(
                state.params_G, apply_lr(g_updates, lr_g)
            )
            ema_G = (
                ema_update(state.ema_G, params_G, ema_decay)
                if use_ema
                else state.ema_G
            )
        else:
            errG = jnp.zeros(())
            params_G, opt_G, ema_G = state.params_G, state.opt_G, state.ema_G

        metrics = StepMetrics(
            errD=errD_real + errD_fake,
            errD_real=errD_real,
            errD_fake=errD_fake,
            errG=errG,
            grad_penalty=penalty,
        )
        if mesh is not None:
            metrics = jax.lax.pmean(metrics, axis_name)

        new_state = state.replace(
            params_G=params_G,
            params_D=params_D,
            opt_G=opt_G,
            opt_D=opt_D,
            ema_G=ema_G,
            step=state.step + 1,
        )
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(
            functools.partial(local_step, coeff, pos_coeff),
            donate_argnums=donate_argnums,
        )

    if zero1_g or zero1_d:
        # exact spec tree for the state: moments row-sharded over the data
        # axis, everything else replicated (prefix P() can't express a
        # mixed state, so spell the TrainState out)
        z1spec = Zero1OptState(mu=P(axis_name), nu=P(axis_name), count=P())
        state_spec = TrainState(
            params_G=P(), params_D=P(), buffers_G=P(),
            opt_G=z1spec if zero1_g else P(),
            opt_D=z1spec if zero1_d else P(),
            ema_G=P(), step=P(), epoch=P(),
        )
    else:
        state_spec = P()

    sharded = shard_map(
        functools.partial(local_step, coeff, pos_coeff),
        mesh=mesh,
        in_specs=(state_spec, P(axis_name), P(), P(), P()),
        out_specs=(state_spec, P()),
        check_vma=False,
    )
    # donate the state: params/opt/EMA buffers are updated in place in HBM
    # instead of being copied every step
    return jax.jit(sharded, donate_argnums=donate_argnums)
