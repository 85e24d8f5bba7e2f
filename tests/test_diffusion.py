"""Diffusion math tests: closed-form values + parity vs torch reference formulas.

The torch side re-derives the reference equations (ddgan.py:36-183)
independently here; both pipelines are fed identical noise so results must
agree to float32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ddgan_tpu.diffusion import (
    DiffusionCoefficients,
    PosteriorCoefficients,
    get_sigma_schedule,
    get_time_schedule,
    q_sample,
    q_sample_pairs_with_noise,
    sample_posterior_with_noise,
)

BETA_MIN, BETA_MAX = 0.1, 20.0


def torch_sigma_schedule(n_timestep, beta_min, beta_max, use_geometric=False):
    eps_small = 1e-3
    t = np.arange(0, n_timestep + 1, dtype=np.float64) / n_timestep
    t = torch.from_numpy(t) * (1.0 - eps_small) + eps_small
    if use_geometric:
        var = beta_min * ((beta_max / beta_min) ** t)
    else:
        log_mean_coeff = -0.25 * t**2 * (beta_max - beta_min) - 0.5 * t * beta_min
        var = 1.0 - torch.exp(2.0 * log_mean_coeff)
    alpha_bars = 1.0 - var
    betas = 1 - alpha_bars[1:] / alpha_bars[:-1]
    betas = torch.cat((torch.tensor(1e-8)[None], betas)).type(torch.float32)
    sigmas = betas**0.5
    a_s = torch.sqrt(1 - betas)
    return sigmas, a_s, betas


@pytest.mark.parametrize("T", [1, 2, 4])
@pytest.mark.parametrize("geometric", [False, True])
def test_sigma_schedule_matches_torch(T, geometric):
    # geometric requires beta_max < 1 (var(t) <= beta_max must stay
    # below 1); the VP betas keep the reference's (0.1, 20) recipe
    bmax = 0.9 if geometric else BETA_MAX
    sig, a_s, betas = get_sigma_schedule(T, BETA_MIN, bmax, geometric)
    tsig, ta_s, tbetas = torch_sigma_schedule(T, BETA_MIN, bmax, geometric)
    np.testing.assert_allclose(np.asarray(sig), tsig.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a_s), ta_s.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(betas), tbetas.numpy(), rtol=1e-6)
    assert betas.shape == (T + 1,)
    assert float(betas[0]) == pytest.approx(1e-8)
    assert np.isfinite(np.asarray(betas)).all()  # no silent-NaN schedules


def test_geometric_invalid_domain_raises():
    """The reference silently yields NaN coefficients for geometric
    schedules with beta_max >= 1 (ddgan.py:45-47 with the default
    beta_max=20); we raise a loud ValueError instead (fixed-to-intent)."""
    with pytest.raises(ValueError, match="use_geometric"):
        get_sigma_schedule(4, BETA_MIN, BETA_MAX, use_geometric=True)
    # decreasing variance (beta_min > beta_max) makes alpha_bar ratios
    # exceed 1 → negative betas → NaN sigmas; must also fail loudly
    with pytest.raises(ValueError, match="beta_min <= beta_max"):
        get_sigma_schedule(4, 0.5, 0.1, use_geometric=True)
    # beta_min outside (0,1) is NaN even when beta_max is fine
    with pytest.raises(ValueError, match="use_geometric"):
        get_sigma_schedule(4, 1.5, 0.9, use_geometric=True)


def test_time_schedule():
    t = get_time_schedule(4)
    expected = np.arange(5, dtype=np.float64) / 4 * (1 - 1e-3) + 1e-3
    np.testing.assert_allclose(np.asarray(t), expected.astype(np.float32), rtol=1e-7)


@pytest.mark.parametrize("T", [2, 4])
def test_diffusion_coefficients(T):
    coeff = DiffusionCoefficients.create(T, BETA_MIN, BETA_MAX)
    _, a_s, _ = torch_sigma_schedule(T, BETA_MIN, BETA_MAX)
    a_s_cum = np.cumprod(a_s.numpy())
    np.testing.assert_allclose(np.asarray(coeff.a_s_cum), a_s_cum, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(coeff.sigmas_cum), np.sqrt(1 - a_s_cum**2), rtol=1e-5
    )
    assert float(coeff.a_s_prev[-1]) == 1.0
    np.testing.assert_allclose(
        np.asarray(coeff.a_s_prev[:-1]), np.asarray(coeff.a_s[:-1])
    )


@pytest.mark.parametrize("T", [2, 4])
def test_posterior_coefficients(T):
    pc = PosteriorCoefficients.create(T, BETA_MIN, BETA_MAX)
    _, _, betas_t = torch_sigma_schedule(T, BETA_MIN, BETA_MAX)
    betas = betas_t.numpy()[1:]
    alphas = 1 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.concatenate([[1.0], acp[:-1]]).astype(np.float32)
    post_var = betas * (1 - acp_prev) / (1 - acp)
    np.testing.assert_allclose(np.asarray(pc.betas), betas, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pc.alphas_cumprod), acp, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pc.posterior_variance), post_var, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pc.posterior_mean_coef1),
        betas * np.sqrt(acp_prev) / (1 - acp),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(pc.posterior_mean_coef2),
        (1 - acp_prev) * np.sqrt(alphas) / (1 - acp),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(pc.posterior_log_variance_clipped),
        np.log(np.maximum(post_var, 1e-20)),
        rtol=1e-5,
    )


def test_q_sample_pairs_with_injected_noise():
    T = 4
    coeff = DiffusionCoefficients.create(T, BETA_MIN, BETA_MAX)
    rng = np.random.RandomState(0)
    x0 = rng.randn(8, 16, 16, 3).astype(np.float32)
    n1 = rng.randn(*x0.shape).astype(np.float32)
    n2 = rng.randn(*x0.shape).astype(np.float32)
    t = rng.randint(0, T, size=(8,))

    x_t, x_tp1 = q_sample_pairs_with_noise(
        coeff, jnp.asarray(x0), jnp.asarray(t), jnp.asarray(n1), jnp.asarray(n2)
    )
    a_cum = np.asarray(coeff.a_s_cum)
    s_cum = np.asarray(coeff.sigmas_cum)
    a_s = np.asarray(coeff.a_s)
    sig = np.asarray(coeff.sigmas)
    bc = lambda v: v[t][:, None, None, None]
    exp_xt = bc(a_cum) * x0 + bc(s_cum) * n1
    bc1 = lambda v: v[t + 1][:, None, None, None]
    exp_xtp1 = bc1(a_s) * exp_xt + bc1(sig) * n2
    np.testing.assert_allclose(np.asarray(x_t), exp_xt, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(x_tp1), exp_xtp1, rtol=1e-5, atol=1e-6)


def test_sample_posterior_t0_is_deterministic_mean():
    T = 4
    pc = PosteriorCoefficients.create(T, BETA_MIN, BETA_MAX)
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(4, 8, 8, 1).astype(np.float32))
    xt = jnp.asarray(rng.randn(4, 8, 8, 1).astype(np.float32))
    noise = jnp.asarray(rng.randn(4, 8, 8, 1).astype(np.float32))
    t0 = jnp.zeros((4,), dtype=jnp.int32)
    out = sample_posterior_with_noise(pc, x0, xt, t0, noise)
    mean = (
        np.asarray(pc.posterior_mean_coef1)[0] * np.asarray(x0)
        + np.asarray(pc.posterior_mean_coef2)[0] * np.asarray(xt)
    )
    np.testing.assert_allclose(np.asarray(out), mean, rtol=1e-5, atol=1e-6)

    t1 = jnp.ones((4,), dtype=jnp.int32)
    out1 = sample_posterior_with_noise(pc, x0, xt, t1, noise)
    mean1 = (
        np.asarray(pc.posterior_mean_coef1)[1] * np.asarray(x0)
        + np.asarray(pc.posterior_mean_coef2)[1] * np.asarray(xt)
    )
    std1 = np.exp(0.5 * np.asarray(pc.posterior_log_variance_clipped)[1])
    np.testing.assert_allclose(
        np.asarray(out1), mean1 + std1 * np.asarray(noise), rtol=1e-4, atol=1e-5
    )


def test_q_sample_jit_and_vmap():
    T = 4
    coeff = DiffusionCoefficients.create(T, BETA_MIN, BETA_MAX)
    x0 = jnp.ones((2, 4, 4, 3))
    t = jnp.array([0, 3])
    noise = jnp.zeros_like(x0)
    out = jax.jit(q_sample)(coeff, x0, t, noise)
    np.testing.assert_allclose(
        np.asarray(out[0, 0, 0, 0]), np.asarray(coeff.a_s_cum)[0], rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out[1, 0, 0, 0]), np.asarray(coeff.a_s_cum)[3], rtol=1e-6
    )
