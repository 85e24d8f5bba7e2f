"""AdaptivePSO — the reference's gradient-free inner optimizer, as a
vectorized JAX swarm update (reference: pso_optim.py).

Faithful semantics, including the reference's quirks (documented, kept):
  * velocity update is relative to the MODEL parameters, not the particle's
    own position: v = w*v + c1*r1*(pbest_i - p) + c2*r2*(gbest - p)
    (pso_optim.py:103-107 uses `p.data`).
  * fitness for particle i is the i-th ACCUMULATED BATCH LOSS — all
    evaluated under the same model params (the trainer feeds >20 batch
    losses, ddgan.py:491-493/:513-515) — not a per-particle evaluation.
  * the global best evolves sequentially WITHIN the per-particle loop
    (particle j sees updates from particles k<j). Vectorized here as a
    prefix-minimum over the swarm — bit-identical outcome because particle
    positions read for gbest are pre-update clones (pso_optim.py:96-99).
  * after the update, the global best position is copied into the model
    params (pso_optim.py:136-140).
  * c1/c2 adapt by the pbest improvement ratio vs thresholds
    (pso_optim.py:120-134).

The per-particle Python loops become one vmapped update over a stacked
particle pytree (leading swarm axis) — TPU-friendly; the whole step jits.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PSOState:
    particles: Any  # pytree of (swarm, *param_shape)
    velocities: Any
    pbest_pos: Any
    pbest_scores: jnp.ndarray  # (swarm,)
    gbest_pos: Any  # pytree of param_shape
    gbest_score: jnp.ndarray  # ()
    c1: jnp.ndarray
    c2: jnp.ndarray
    iteration: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class AdaptivePSO:
    swarm_size: int = 20
    inertia_weight: float = 0.729
    inertia_weight_strategy: str = "constant"
    c1: float = 1.49445
    c1_min: float = 1.0
    c1_max: float = 2.0
    c2: float = 1.49445
    c2_min: float = 1.0
    c2_max: float = 2.0
    max_iter: int = 1000
    weight_decay: float = 0.0  # parsed-but-unused in the reference too
    velocity_clamp: tuple[float, float] | None = (-1.0, 1.0)
    position_clamp: tuple[float, float] | None = (-10.0, 10.0)
    threshold_low: float = 0.2
    threshold_high: float = 0.5
    c_adjust_step: float = 0.05

    def init(self, key: jax.Array, params) -> PSOState:
        """Swarm init: particles = params + 0.05*N(0,1). (pso_optim.py:44-65)"""
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(key, len(leaves))
        particles = jax.tree.unflatten(
            treedef,
            [
                p[None] + 0.05 * jax.random.normal(k, (self.swarm_size,) + p.shape, p.dtype)
                for p, k in zip(leaves, keys)
            ],
        )
        zeros = jax.tree.map(
            lambda p: jnp.zeros((self.swarm_size,) + p.shape, p.dtype), params
        )
        return PSOState(
            particles=particles,
            velocities=zeros,
            pbest_pos=jax.tree.map(jnp.array, particles),
            pbest_scores=jnp.full((self.swarm_size,), jnp.inf),
            gbest_pos=jax.tree.map(jnp.array, params),
            gbest_score=jnp.asarray(jnp.inf),
            c1=jnp.asarray(self.c1, jnp.float32),
            c2=jnp.asarray(self.c2, jnp.float32),
            iteration=jnp.zeros((), jnp.int32),
        )

    def step(self, state: PSOState, params, loss_values: jnp.ndarray, key: jax.Array):
        """One swarm update. Returns (new_state, new_params).

        loss_values: (swarm_size,) fitness per particle (the trainer's
        accumulated batch losses, first swarm_size of them).
        """
        s = self.swarm_size
        loss = loss_values[:s].astype(jnp.float32)

        if self.inertia_weight_strategy == "linear":
            w_max, w_min = 0.9, 0.4
            w = w_max - (w_max - w_min) * state.iteration.astype(jnp.float32) / self.max_iter
        else:
            w = jnp.asarray(self.inertia_weight, jnp.float32)

        # --- personal bests (pso_optim.py:88-92)
        improved = loss < state.pbest_scores
        pbest_scores = jnp.where(improved, loss, state.pbest_scores)
        pbest_pos = jax.tree.map(
            lambda pb, part: jnp.where(
                improved.reshape((-1,) + (1,) * (part.ndim - 1)), part, pb
            ),
            state.pbest_pos,
            state.particles,
        )

        # --- global best as seen by each particle: sequential prefix-min
        # (pso_optim.py:94-99; positions read are pre-update clones).
        # Strict '<' ties: an equal score never displaces the incumbent.
        prefix_min = jax.lax.associative_scan(jnp.minimum, loss)
        prev_min = jnp.concatenate([jnp.array([jnp.inf]), prefix_min[:-1]])
        improved_glob = loss < jnp.minimum(state.gbest_score, prev_min)
        idx_iota = jnp.arange(s)
        masked_idx = jnp.where(improved_glob, idx_iota, -1)
        prefix_arg = jax.lax.associative_scan(jnp.maximum, masked_idx)
        use_new = prefix_arg >= 0
        gather_idx = jnp.maximum(prefix_arg, 0)

        def per_particle_gbest(part_leaf, gbest_leaf):
            new = part_leaf[gather_idx]  # (s, *shape)
            return jnp.where(
                use_new.reshape((-1,) + (1,) * (gbest_leaf.ndim)), new,
                gbest_leaf[None],
            )

        gbest_per_particle = jax.tree.map(
            per_particle_gbest, state.particles, state.gbest_pos
        )

        # final global best after the whole swarm
        final_better = prefix_arg[-1] >= 0
        final_idx = jnp.maximum(prefix_arg[-1], 0)
        gbest_score = jnp.minimum(prefix_min[-1], state.gbest_score)
        gbest_pos = jax.tree.map(
            lambda part, old: jnp.where(final_better, part[final_idx], old),
            state.particles,
            state.gbest_pos,
        )

        # --- velocity/position updates (pso_optim.py:101-118)
        leaves, treedef = jax.tree.flatten(params)
        n = len(leaves)
        keys = jax.random.split(key, 2 * n)
        k1, k2 = keys[:n], keys[n:]

        def upd(vel, pb, gb, p, key1, key2):
            r1 = jax.random.uniform(key1, (s,) + p.shape, p.dtype)
            r2 = jax.random.uniform(key2, (s,) + p.shape, p.dtype)
            cognitive = state.c1 * r1 * (pb - p[None])
            social = state.c2 * r2 * (gb - p[None])
            v = w * vel + cognitive + social
            if self.velocity_clamp is not None:
                v = jnp.clip(v, self.velocity_clamp[0], self.velocity_clamp[1])
            return v

        vel_leaves = jax.tree.leaves(state.velocities)
        pb_leaves = jax.tree.leaves(pbest_pos)
        gb_leaves = jax.tree.leaves(gbest_per_particle)
        new_vel = [
            upd(v, pb, gb, p, a, b)
            for v, pb, gb, p, a, b in zip(
                vel_leaves, pb_leaves, gb_leaves, leaves, k1, k2
            )
        ]
        part_leaves = jax.tree.leaves(state.particles)
        new_parts = []
        for part, v in zip(part_leaves, new_vel):
            np_ = part + v
            if self.position_clamp is not None:
                np_ = jnp.clip(np_, self.position_clamp[0], self.position_clamp[1])
            new_parts.append(np_)

        velocities = jax.tree.unflatten(treedef, new_vel)
        particles = jax.tree.unflatten(treedef, new_parts)

        # --- c1/c2 adaptation (pso_optim.py:120-134)
        ratio = improved.sum().astype(jnp.float32) / s
        low = ratio < self.threshold_low
        high = ratio > self.threshold_high
        c1 = jnp.where(
            low,
            jnp.minimum(state.c1 + self.c_adjust_step, self.c1_max),
            jnp.where(high, jnp.maximum(state.c1 - self.c_adjust_step, self.c1_min), state.c1),
        )
        c2 = jnp.where(
            low,
            jnp.maximum(state.c2 - self.c_adjust_step, self.c2_min),
            jnp.where(high, jnp.minimum(state.c2 + self.c_adjust_step, self.c2_max), state.c2),
        )

        new_state = PSOState(
            particles=particles,
            velocities=velocities,
            pbest_pos=pbest_pos,
            pbest_scores=pbest_scores,
            gbest_pos=gbest_pos,
            gbest_score=gbest_score,
            c1=c1,
            c2=c2,
            iteration=state.iteration + 1,
        )
        # copy global best into params (pso_optim.py:136-140)
        new_params = jax.tree.map(lambda g: g, gbest_pos)
        return new_state, new_params
