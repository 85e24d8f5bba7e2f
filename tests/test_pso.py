"""AdaptivePSO parity vs the reference torch implementation.

Both sides get identical particle initializations (shared numpy arrays),
identical fitness sequences, and a CONSTANT uniform sampler (r1 = r2 =
0.37 via monkeypatching), removing RNG-backend differences so the full
trajectory — pbest/gbest bookkeeping, sequential-gbest semantics,
velocity/position updates with clamping, c1/c2 adaptation, and the final
copy-gbest-into-params — must match to float32 tolerance.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ddgan_tpu.train.pso_optim import AdaptivePSO

from torch_ref import install_reference

install_reference()

from pso_optim import AdaptivePSO as TorchAdaptivePSO  # noqa: E402

SWARM = 5
CONST = 0.37


@pytest.fixture
def const_uniform(monkeypatch):
    def fake_uniform(key, shape=(), dtype=float, minval=0.0, maxval=1.0):
        return jnp.full(shape, CONST, dtype)

    monkeypatch.setattr(jax.random, "uniform", fake_uniform)
    monkeypatch.setattr(torch, "rand_like", lambda t: torch.full_like(t, CONST))
    yield


def test_pso_trajectory_parity(const_uniform):
    torch.manual_seed(0)
    lin = torch.nn.Linear(3, 2)
    ref_opt = TorchAdaptivePSO(
        lin.parameters(), swarm_size=SWARM,
        velocity_clamp=(-1.0, 1.0), position_clamp=(-10.0, 10.0),
    )

    # .copy(): on the CPU backend jnp.asarray zero-copies numpy VIEWS of
    # torch storage — without the copy, torch's in-place gbest write into
    # lin.weight would silently mutate these arrays mid-test.
    params = {
        "w": jnp.asarray(lin.weight.detach().numpy().copy()),
        "b": jnp.asarray(lin.bias.detach().numpy().copy()),
    }
    pso = AdaptivePSO(swarm_size=SWARM)
    state = pso.init(jax.random.PRNGKey(0), params)

    # overwrite BOTH sides' particles with shared arrays
    rng = np.random.RandomState(42)
    names = ["w", "b"]
    stacked = {n: [] for n in names}
    group = ref_opt.param_groups[0]
    for i in range(SWARM):
        for name, p in zip(names, group["particles"][i]):
            shared = (rng.randn(*p.shape) * 0.05).astype(np.float32) + np.asarray(
                params[name]
            )
            p.copy_(torch.from_numpy(shared))
            group["personal_best_positions"][i][names.index(name)].copy_(
                torch.from_numpy(shared)
            )
            stacked[name].append(shared)
    state = state.replace(
        particles={n: jnp.asarray(np.stack(stacked[n])) for n in names},
        pbest_pos={n: jnp.asarray(np.stack(stacked[n])) for n in names},
    )

    rng2 = np.random.RandomState(7)
    for it in range(4):
        losses = rng2.rand(SWARM).astype(np.float64) * 2.0
        ref_opt.step(list(losses))
        state, params = pso.step(
            state, params, jnp.asarray(losses), jax.random.PRNGKey(it)
        )

    np.testing.assert_allclose(
        np.asarray(params["w"]), lin.weight.detach().numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(params["b"]), lin.bias.detach().numpy(), rtol=1e-5, atol=1e-6
    )
    group = ref_opt.param_groups[0]
    assert abs(float(state.gbest_score) - group["global_best_score"]) < 1e-6
    # c1/c2 accumulate in float32 on our side vs python float64 — epsilon diff
    assert abs(float(state.c1) - group["c1"]) < 1e-6
    assert abs(float(state.c2) - group["c2"]) < 1e-6
    np.testing.assert_allclose(
        np.asarray(state.pbest_scores),
        np.asarray(group["personal_best_scores"]),
        rtol=1e-6,
    )
    # particle clouds must coincide too
    for i in range(SWARM):
        for name, p in zip(names, group["particles"][i]):
            np.testing.assert_allclose(
                np.asarray(state.particles[name][i]), p.numpy(), rtol=1e-5, atol=1e-6
            )


def test_pso_gbest_strict_tie_semantics():
    """Equal scores must not displace the incumbent global best."""
    params = {"w": jnp.zeros((2,))}
    pso = AdaptivePSO(swarm_size=3)
    state = pso.init(jax.random.PRNGKey(0), params)
    losses = jnp.asarray([1.0, 1.0, 2.0])
    p0 = jax.tree.map(lambda a: a[0], state.particles)
    state, params = pso.step(state, params, losses, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(params["w"]), np.asarray(p0["w"]))
