"""DDGAN diffusion math: discrete VP / geometric schedules, q/p sampling.

This is the heart of DDGAN (reference semantics: ddgan.py:36-183 and the
duplicate in test_ddgan.py:10-125). Everything here is a pure function of
immutable coefficient pytrees, so it jits, vmaps and shards freely.

Schedules are computed host-side in float64 (matching the reference's
numpy-float64 pipeline) and stored as float32 device constants; the sampling
functions are pure jnp and differentiate/scan cleanly.

Conventions:
  * images are NHWC (TPU-native layout) — `extract` broadcasts per-sample
    scalars over trailing dims, so it is layout-agnostic.
  * all randomness is explicit: functions either take a `jax.random` key or
    pre-drawn noise (the latter enables bit-parity tests against the
    reference given identical injected noise).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def var_func_vp(t: np.ndarray, beta_min: float, beta_max: float) -> np.ndarray:
    """VP-SDE marginal variance 1 - exp(2 * log_mean_coeff). (ddgan.py:38-42)"""
    log_mean_coeff = -0.25 * t**2 * (beta_max - beta_min) - 0.5 * t * beta_min
    return 1.0 - np.exp(2.0 * log_mean_coeff)


def var_func_geometric(t: np.ndarray, beta_min: float, beta_max: float) -> np.ndarray:
    """Geometric-progression variance beta_min * (beta_max/beta_min)**t. (ddgan.py:45-47)"""
    return beta_min * ((beta_max / beta_min) ** t)


def get_time_schedule(num_timesteps: int) -> jnp.ndarray:
    """t-grid arange(0, T+1)/T * (1 - 1e-3) + 1e-3, float32. (ddgan.py:58-65)"""
    eps_small = 1e-3
    t = np.arange(0, num_timesteps + 1, dtype=np.float64) / num_timesteps
    t = t * (1.0 - eps_small) + eps_small
    return jnp.asarray(t, dtype=jnp.float32)


def get_sigma_schedule(
    num_timesteps: int,
    beta_min: float,
    beta_max: float,
    use_geometric: bool = False,
):
    """(sigmas, a_s, betas), each of length T+1 with betas[0] = 1e-8 prepended.

    Reference semantics: ddgan.py:68-91. Computed in float64, returned float32.
    """
    eps_small = 1e-3
    t = np.arange(0, num_timesteps + 1, dtype=np.float64) / num_timesteps
    t = t * (1.0 - eps_small) + eps_small

    if use_geometric:
        var = var_func_geometric(t, beta_min, beta_max)
        # Valid domain: the geometric VARIANCE schedule (ddgan.py:45-47)
        # needs var(t) = beta_min*(beta_max/beta_min)**t < 1 on (0, 1] —
        # i.e. beta_max < 1 — else alpha_bar goes non-positive and every
        # coefficient downstream is NaN (sqrt of a negative). The reference
        # propagates those NaNs silently; we fail loudly (fixed-to-intent,
        # quirk-ledgered in STATUS.md).
        if not (0.0 < beta_min <= beta_max < 1.0):
            raise ValueError(
                "use_geometric=True requires 0 < beta_min <= beta_max < 1 "
                f"(got beta_min={beta_min}, beta_max={beta_max}): var(t)="
                "beta_min*(beta_max/beta_min)**t must stay below 1 AND be "
                "non-decreasing, else alpha_bar ratios exceed 1, betas go "
                "negative, and sigmas = sqrt(betas) are NaN (ddgan.py:45-47)."
            )
    else:
        var = var_func_vp(t, beta_min, beta_max)
    alpha_bars = 1.0 - var
    betas = 1.0 - alpha_bars[1:] / alpha_bars[:-1]

    betas = np.concatenate([np.array([1e-8]), betas]).astype(np.float32)
    sigmas = betas**0.5
    a_s = np.sqrt(1.0 - betas)
    return (
        jnp.asarray(sigmas, dtype=jnp.float32),
        jnp.asarray(a_s, dtype=jnp.float32),
        jnp.asarray(betas, dtype=jnp.float32),
    )


def extract(coeffs: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-sample coefficients and broadcast over `ndim - 1` trailing dims.

    Equivalent to the reference's gather+reshape (ddgan.py:50-55) but takes the
    target rank instead of a shape so it is shape-polymorphic under vmap.
    """
    out = coeffs[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionCoefficients:
    """Forward-process coefficients (ddgan.py:94-106).

    a_s_cum[i]    = prod_{j<=i} a_s[j]
    sigmas_cum[i] = sqrt(1 - a_s_cum[i]^2)
    a_s_prev      = a_s with the last entry replaced by 1.
    """

    sigmas: jnp.ndarray
    a_s: jnp.ndarray
    a_s_cum: jnp.ndarray
    sigmas_cum: jnp.ndarray
    a_s_prev: jnp.ndarray

    @staticmethod
    def create(
        num_timesteps: int,
        beta_min: float,
        beta_max: float,
        use_geometric: bool = False,
    ) -> "DiffusionCoefficients":
        sigmas, a_s, _ = get_sigma_schedule(
            num_timesteps, beta_min, beta_max, use_geometric
        )
        a_s_cum = np.cumprod(np.asarray(a_s, dtype=np.float32))
        sigmas_cum = np.sqrt(1.0 - a_s_cum.astype(np.float32) ** 2)
        a_s_prev = np.asarray(a_s).copy()
        a_s_prev[-1] = 1.0
        return DiffusionCoefficients(
            sigmas=sigmas,
            a_s=a_s,
            a_s_cum=jnp.asarray(a_s_cum, dtype=jnp.float32),
            sigmas_cum=jnp.asarray(sigmas_cum, dtype=jnp.float32),
            a_s_prev=jnp.asarray(a_s_prev, dtype=jnp.float32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PosteriorCoefficients:
    """Reverse-process posterior coefficients (ddgan.py:131-148).

    Built from betas[1:] (the 1e-8 sentinel dropped), all float32.
    """

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    posterior_variance: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray

    @staticmethod
    def create(
        num_timesteps: int,
        beta_min: float,
        beta_max: float,
        use_geometric: bool = False,
    ) -> "PosteriorCoefficients":
        _, _, betas_full = get_sigma_schedule(
            num_timesteps, beta_min, beta_max, use_geometric
        )
        betas = np.asarray(betas_full, dtype=np.float32)[1:]
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        alphas_cumprod_prev = np.concatenate(
            [np.array([1.0], dtype=np.float32), alphas_cumprod[:-1]]
        )
        posterior_variance = (
            betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        )
        return PosteriorCoefficients(
            betas=jnp.asarray(betas),
            alphas=jnp.asarray(alphas),
            alphas_cumprod=jnp.asarray(alphas_cumprod),
            alphas_cumprod_prev=jnp.asarray(alphas_cumprod_prev),
            posterior_variance=jnp.asarray(posterior_variance),
            sqrt_alphas_cumprod=jnp.asarray(np.sqrt(alphas_cumprod)),
            sqrt_recip_alphas_cumprod=jnp.asarray(1.0 / np.sqrt(alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=jnp.asarray(
                np.sqrt(1.0 / alphas_cumprod - 1.0)
            ),
            posterior_mean_coef1=jnp.asarray(
                betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            ),
            posterior_mean_coef2=jnp.asarray(
                (1.0 - alphas_cumprod_prev)
                * np.sqrt(alphas)
                / (1.0 - alphas_cumprod)
            ),
            posterior_log_variance_clipped=jnp.asarray(
                np.log(np.maximum(posterior_variance, 1e-20))
            ),
        )


def q_sample(
    coeff: DiffusionCoefficients,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Diffuse x_start to time t: a_s_cum[t] * x0 + sigmas_cum[t] * noise. (ddgan.py:109-117)"""
    nd = x_start.ndim
    return extract(coeff.a_s_cum, t, nd) * x_start + extract(
        coeff.sigmas_cum, t, nd
    ) * noise


def q_sample_pairs(
    coeff: DiffusionCoefficients,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
):
    """Training pair (x_t, x_{t+1}); two independent noises. (ddgan.py:120-126)"""
    key_q, key_next = jax.random.split(key)
    noise_q = jax.random.normal(key_q, x_start.shape, x_start.dtype)
    noise_next = jax.random.normal(key_next, x_start.shape, x_start.dtype)
    return q_sample_pairs_with_noise(coeff, x_start, t, noise_q, noise_next)


def q_sample_pairs_with_noise(
    coeff: DiffusionCoefficients,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    noise_q: jnp.ndarray,
    noise_next: jnp.ndarray,
):
    """Pair sampling with externally supplied noise (for parity tests)."""
    nd = x_start.ndim
    x_t = q_sample(coeff, x_start, t, noise_q)
    x_t_plus_one = extract(coeff.a_s, t + 1, nd) * x_t + extract(
        coeff.sigmas, t + 1, nd
    ) * noise_next
    return x_t, x_t_plus_one


def sample_posterior(
    coefficients: PosteriorCoefficients,
    x_0: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
) -> jnp.ndarray:
    """Ancestral posterior sample; noise gated off at t == 0. (ddgan.py:151-169)"""
    noise = jax.random.normal(key, x_t.shape, x_t.dtype)
    return sample_posterior_with_noise(coefficients, x_0, x_t, t, noise)


def sample_posterior_with_noise(
    coefficients: PosteriorCoefficients,
    x_0: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """Posterior sampling with externally supplied noise (for parity tests)."""
    nd = x_t.ndim
    mean = (
        extract(coefficients.posterior_mean_coef1, t, nd) * x_0
        + extract(coefficients.posterior_mean_coef2, t, nd) * x_t
    )
    log_var = extract(coefficients.posterior_log_variance_clipped, t, nd)
    nonzero_mask = (1.0 - (t == 0).astype(x_t.dtype)).reshape(
        (-1,) + (1,) * (nd - 1)
    )
    return mean + nonzero_mask * jnp.exp(0.5 * log_var) * noise


@partial(jax.jit, static_argnames=("generator", "n_time", "nz"))
def sample_from_model(
    coefficients: PosteriorCoefficients,
    generator,
    n_time: int,
    x_init: jnp.ndarray,
    key: jax.Array,
    nz: int,
    generator_args=(),
) -> jnp.ndarray:
    """T-step reverse sampler, fresh z each step. (ddgan.py:172-183)

    `generator` is a callable (x, t, z) -> x0_hat closed over params (make it
    hashable/static, e.g. a partial of a jitted apply). Iterates
    i = T-1 .. 0.

    DDGAN's T is tiny and static (2-8), so the loop is UNROLLED rather
    than a lax.scan: profiled on v5e, the scan's while op carried 50% of
    sampler device time as un-overlapped loop overhead (120 of 240 ms at
    batch 256 / T=4); unrolling lets XLA schedule and prefetch across
    steps. The key-split chain is identical to the former scan body, so
    samples are bit-identical. Falls back to lax.scan above T=16.
    """
    batch = x_init.shape[0]

    def step(carry, i):
        x, k = carry
        k, kz, kp = jax.random.split(k, 3)
        t = jnp.full((batch,), i, dtype=jnp.int32)
        latent_z = jax.random.normal(kz, (batch, nz), x.dtype)
        x_0 = generator(x, t, latent_z, *generator_args)
        x = sample_posterior(coefficients, x_0, x, t, kp)
        return (x, k), None

    if n_time <= 16:
        carry = (x_init, key)
        for i in range(n_time - 1, -1, -1):
            carry, _ = step(carry, jnp.int32(i))
        return carry[0]

    ts = jnp.arange(n_time - 1, -1, -1, dtype=jnp.int32)
    (x, _), _ = jax.lax.scan(step, (x_init, key), ts)
    return x


def make_sharded_sampler(
    coefficients: PosteriorCoefficients,
    generator,
    n_time: int,
    image_shape: tuple[int, int, int],
    nz: int,
    mesh,
    per_device_batch: int,
    axis_name: str = "data",
):
    """Mesh-sharded batch generation: every device runs the T-step
    `sample_from_model` scan on its own `per_device_batch` slice, so FID-set
    generation scales linearly over the chips exactly like training does
    (the reference evals on a single V100, test_ddgan.py:180-208 — here the
    sampler rides the same 1-D data mesh as the train step).

    Returns `sample(key) -> (n_devices * per_device_batch, H, W, C)` global
    array. The key is replicated; each shard folds in its axis index, so
    shard i's output is bit-identical to a single-device `sample_from_model`
    run with `fold_in(key, i)` (tested on the 8-device CPU mesh).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    h, w, c = image_shape

    def local_sample(coeff_, key):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        kx, ks = jax.random.split(key)
        x_init = jax.random.normal(kx, (per_device_batch, h, w, c))
        return sample_from_model(coeff_, generator, n_time, x_init, ks, nz)

    sharded = shard_map(
        partial(local_sample, coefficients),
        mesh=mesh,
        in_specs=(P(),),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(sharded)
