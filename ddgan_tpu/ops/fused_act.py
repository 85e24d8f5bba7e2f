"""Fused bias-add + activation (linear / scaled LeakyReLU).

Reference: score_sde/op/fused_act.py (CUDA kernel + CPU fallback
`leaky_relu(x + b) * scale`). The CUDA switch
(score_sde/op/fused_bias_act_kernel.cu:20-51) exposes act ∈ {linear,
lrelu} × {fwd, grad, grad2}; here the act modes are `fused_bias_act`
below, and the grad/grad2 entries are obsoleted by design — both modes
are simple jnp expressions that JAX differentiates to arbitrary order
and XLA fuses into one elementwise kernel, so no hand kernel or custom
double-backward is needed. Kept as library ops for API parity (the
reference models never call them either; see SURVEY.md §2.3).

Layout: NHWC — bias broadcasts over the trailing channel axis.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
) -> jnp.ndarray:
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jax.nn.leaky_relu(x, negative_slope) * scale


def fused_bias_act(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    act: str = "lrelu",
    alpha: float = 0.2,
    scale: float | None = None,
) -> jnp.ndarray:
    """The CUDA kernel's full act switch (fused_bias_act_kernel.cu:20-51).

    act="linear": (x + b) * scale   (the kernel's cases 1-2, default
    scale 1.0).
    act="lrelu":  leaky_relu(x + b, alpha) * scale  (cases 3-5, default
    scale sqrt(2)).

    scale=None resolves to the per-act kernel default above, so the
    default call matches the reference kernel for BOTH modes.
    """
    if scale is None:
        scale = 1.0 if act == "linear" else math.sqrt(2.0)
    if act == "linear":
        if bias is not None:
            x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
        return x * scale
    if act == "lrelu":
        return fused_leaky_relu(x, bias, alpha, scale)
    raise ValueError(f"unknown act {act!r}; expected 'linear' or 'lrelu'")
