"""Model registry. (reference: score_sde/models/utils.py:34-57)"""

from __future__ import annotations

_MODELS: dict[str, type] = {}


def register_model(cls=None, *, name: str | None = None):
    """Decorator registering a model class under `name` (or its class name)."""

    def _register(c):
        local_name = name if name is not None else c.__name__
        if local_name in _MODELS:
            raise ValueError(f"Already registered model with name: {local_name}")
        _MODELS[local_name] = c
        return c

    if cls is None:
        return _register
    return _register(cls)


def get_model(name: str) -> type:
    return _MODELS[name]


# ---- reference score_sde/models/utils.py helpers (:60-148) ----------------
import numpy as _np


def get_sigmas(config):
    """SMLD noise levels: geometric from sigma_max to sigma_min.
    (utils.py:60-70)"""
    return _np.exp(
        _np.linspace(
            _np.log(config.sigma_max), _np.log(config.sigma_min),
            config.num_scales,
        )
    )


def get_ddpm_params(config):
    """Original-DDPM betas/alphas over 1000 steps. (utils.py:73-97)"""
    num_diffusion_timesteps = 1000
    beta_start = config.beta_min / config.num_scales
    beta_end = config.beta_max / config.num_scales
    betas = _np.linspace(beta_start, beta_end, num_diffusion_timesteps,
                         dtype=_np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = _np.cumprod(alphas, axis=0)
    return {
        "betas": betas,
        "alphas": alphas,
        "alphas_cumprod": alphas_cumprod,
        "sqrt_alphas_cumprod": _np.sqrt(alphas_cumprod),
        "sqrt_1m_alphas_cumprod": _np.sqrt(1.0 - alphas_cumprod),
        "beta_min": beta_start * (num_diffusion_timesteps - 1),
        "beta_max": beta_end * (num_diffusion_timesteps - 1),
        "num_diffusion_timesteps": num_diffusion_timesteps,
    }


def create_model(config):
    """Instantiate a registered model from config. (utils.py:100-106;
    the torch DataParallel wrap has no JAX analog — sharding is explicit.)"""
    return get_model(config.name).from_config(config)


def get_model_fn(model, variables, train: bool = False):
    """Callable (x, labels) -> output closing over variables.
    (utils.py:109-134; train/eval switching is the `train` kwarg.)"""

    def model_fn(x, labels, **kw):
        return model.apply(variables, x, labels, train=train, **kw)

    return model_fn
