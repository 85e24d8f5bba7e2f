"""Fused bias-add + scaled LeakyReLU.

Reference: score_sde/op/fused_act.py (CUDA kernel + CPU fallback
`leaky_relu(x + b) * scale`). On TPU this is a pure-jnp expression — XLA
fuses the bias add, the select and the scale into one elementwise kernel,
so no Pallas is needed. Kept as a library op for API parity (the reference
models never call it either; see SURVEY.md §2.3).

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
