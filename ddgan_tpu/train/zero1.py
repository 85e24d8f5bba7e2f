"""ZeRO-1 sharded optimizer state over the data mesh.

The reference's DDP (ddgan.py:363-365) — and our replicated default —
keeps a full copy of both Adam moment trees on every device: 2 extra
parameter-sized f32 buffers per network per chip. This module shards the
moments across the 'data' axis instead (ZeRO stage 1 / FSDP-style
optimizer-state sharding), the idiomatic TPU formulation:

  * gradients arrive per-device (pre-mean) → ONE `lax.psum_scatter`
    yields each device its 1/n slice of the summed gradient (half the
    bytes of the all-reduce the replicated path pays, on the same ICI
    ring),
  * global-norm clipping needs only a scalar `psum` of per-shard
    squared norms — exact, not approximate,
  * each device runs Adam (torch semantics: L2-into-grad weight decay,
    bias correction, eps outside the sqrt — ddgan.py:297-313) on its
    1/n flat shard,
  * ONE `lax.all_gather` rebuilds the full preconditioned update, which
    `apply_lr` + `optax.apply_updates` consume unchanged.

reduce_scatter + all_gather moves exactly the same bytes as the
all-reduce it replaces, so the step cost is unchanged while per-chip
optimizer memory drops from 2·P to 2·P/n — at the CelebA-HQ 256 recipe's
39.8M-param G on an 8-chip mesh, 318 MB → 40 MB per chip per network.

Update order matches `make_optimizer` exactly (clip → weight decay →
Adam), so trajectories agree with the replicated path to float
associativity (tests/test_zero1.py asserts multi-step closeness on the
8-device CPU mesh).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Zero1OptState(NamedTuple):
    """Global view: mu/nu are (num_shards, shard_len) f32, sharded along
    axis 0 over the data mesh (each device holds one row); count is the
    replicated Adam step counter."""

    mu: jnp.ndarray
    nu: jnp.ndarray
    count: jnp.ndarray


class Zero1Optimizer(NamedTuple):
    """Drop-in for the optax transformation in create_train_state /
    make_train_step: `init(params)` builds the sharded-moment state; the
    train step detects the type and routes through
    `zero1_update_sharded` inside shard_map instead of pmean+tx.update."""

    beta1: float
    beta2: float
    weight_decay: float
    grad_clip_norm: float | None
    num_shards: int
    eps: float = 1e-8

    def init(self, params) -> Zero1OptState:
        total = sum(int(l.size) for l in jax.tree.leaves(params))
        shard = -(-total // self.num_shards)
        return Zero1OptState(
            mu=jnp.zeros((self.num_shards, shard), jnp.float32),
            nu=jnp.zeros((self.num_shards, shard), jnp.float32),
            count=jnp.zeros((), jnp.int32),
        )


def make_zero1_optimizer(
    beta1: float,
    beta2: float,
    weight_decay: float = 0.0,
    grad_clip_norm: float | None = 1.0,
    num_shards: int = 1,
) -> Zero1Optimizer:
    """Mirror of optim.make_optimizer with sharded state (same semantics)."""
    return Zero1Optimizer(beta1, beta2, weight_decay, grad_clip_norm, num_shards)


def _flatten_f32(tree) -> jnp.ndarray:
    return jnp.concatenate(
        [jnp.ravel(l).astype(jnp.float32) for l in jax.tree.leaves(tree)]
    )


def zero1_update_sharded(
    opt: Zero1Optimizer, grads, opt_state: Zero1OptState, params, axis_name: str
):
    """Per-device body (call INSIDE shard_map): grads are this device's
    local (pre-mean) gradients; opt_state is the local (1, shard_len)
    view of the moments. Returns (updates_tree, new_opt_state) shaped
    exactly like optax's `tx.update`."""
    n = opt.num_shards
    leaves, treedef = jax.tree.flatten(params)
    total = sum(int(l.size) for l in leaves)
    shard = -(-total // n)
    pad = n * shard - total

    flat_g = _flatten_f32(grads)
    if pad:
        flat_g = jnp.concatenate([flat_g, jnp.zeros((pad,), jnp.float32)])
    # mean gradient, scattered: device i receives sum_over_devices(slice i)/n
    g_shard = (
        jax.lax.psum_scatter(
            flat_g.reshape(n, shard), axis_name, scatter_dimension=0
        )
        / n
    )

    # clip by the GLOBAL norm of the mean gradient (optax.clip_by_global_norm
    # semantics: scale only when the norm exceeds the bound, no epsilon)
    if opt.grad_clip_norm is not None and opt.grad_clip_norm > 0:
        g_norm = jnp.sqrt(jax.lax.psum(jnp.sum(g_shard * g_shard), axis_name))
        scale = jnp.where(
            g_norm < opt.grad_clip_norm, 1.0, opt.grad_clip_norm / g_norm
        )
        g_shard = g_shard * scale

    # torch-style L2: wd * param added to the gradient BEFORE the moments
    if opt.weight_decay:
        idx = jax.lax.axis_index(axis_name)
        flat_p = _flatten_f32(params)
        if pad:
            flat_p = jnp.concatenate([flat_p, jnp.zeros((pad,), jnp.float32)])
        p_shard = jax.lax.dynamic_slice(flat_p, (idx * shard,), (shard,))
        g_shard = g_shard + opt.weight_decay * p_shard

    mu = opt_state.mu.reshape(-1)
    nu = opt_state.nu.reshape(-1)
    count = opt_state.count + 1
    mu = opt.beta1 * mu + (1.0 - opt.beta1) * g_shard
    nu = opt.beta2 * nu + (1.0 - opt.beta2) * (g_shard * g_shard)
    c = count.astype(jnp.float32)
    mu_hat = mu / (1.0 - opt.beta1**c)
    nu_hat = nu / (1.0 - opt.beta2**c)
    upd_shard = mu_hat / (jnp.sqrt(nu_hat) + opt.eps)

    upd_full = jax.lax.all_gather(upd_shard, axis_name, tiled=True)[:total]

    updates = []
    offset = 0
    for l in leaves:
        updates.append(
            upd_full[offset : offset + l.size].reshape(l.shape).astype(l.dtype)
        )
        offset += l.size
    new_state = Zero1OptState(
        mu=mu.reshape(1, shard), nu=nu.reshape(1, shard), count=count
    )
    return jax.tree.unflatten(treedef, updates), new_state


def place_zero1_state(mesh, state, axis_name: str = "data"):
    """Device placement for a TrainState whose opt trees may be Zero1:
    moments sharded along the mesh axis, everything else replicated
    (the zero1 analog of parallel.replicate).

    Multi-host: `jax.device_put` of a host array to a sharded layout only
    works when every mesh device is addressable, so on a multi-process
    mesh the moments go through `make_array_from_process_local_data` with
    each host contributing its slice of the (identical, host-replicated)
    global moment rows — the same mechanism shard_batch uses (ADVICE r4).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    shd = NamedSharding(mesh, P(axis_name))

    def _put_sharded(x):
        if jax.process_count() == 1:
            return jax.device_put(x, shd)
        import numpy as np

        n_local = x.shape[0] // jax.process_count()
        lo = jax.process_index() * n_local
        return jax.make_array_from_process_local_data(
            shd, np.asarray(x[lo : lo + n_local])
        )

    def place_opt(o):
        if isinstance(o, Zero1OptState):
            return Zero1OptState(
                mu=_put_sharded(o.mu),
                nu=_put_sharded(o.nu),
                count=jax.device_put(o.count, rep),
            )
        return jax.tree.map(lambda x: jax.device_put(x, rep), o)

    placed = jax.tree.map(
        lambda x: jax.device_put(x, rep),
        state.replace(opt_G=None, opt_D=None),
    )
    return placed.replace(
        opt_G=place_opt(state.opt_G), opt_D=place_opt(state.opt_D)
    )
