"""Exponential moving average of a parameter pytree.

Reference: ema.py:45-55 — ema = decay * ema + (1 - decay) * param, applied
to all trainable params after every G step. decay <= 0 disables EMA
(ema.py:33). The reference's swap-save-swap dance (ema.py:57-80,
ddgan.py:563-569) is unnecessary functionally: checkpoint code simply
writes the EMA tree where generator weights are wanted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    """Clone params as the initial EMA state. (ema.py:37-43)"""
    return jax.tree.map(jnp.array, params)


def ema_update(ema, params, decay: float | jnp.ndarray):
    """One EMA step: decay * ema + (1 - decay) * param. (ema.py:45-55)"""
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema, params)
