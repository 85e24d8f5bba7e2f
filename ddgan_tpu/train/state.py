"""Train state: one pytree holding everything the reference's content.pth
checkpoints (ddgan.py:545-561) — G/D params, both optimizer states, EMA
shadow, step/epoch counters. Being a single pytree, it jits, shards and
checkpoints as a unit.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from .ema import ema_init


@struct.dataclass
class TrainState:
    params_G: Any
    params_D: Any
    buffers_G: Any  # non-trainable variables (e.g. Fourier projection W)
    opt_G: Any
    opt_D: Any
    ema_G: Any
    step: jnp.ndarray  # global step, int32
    epoch: jnp.ndarray  # current epoch, int32


def create_train_state(
    key: jax.Array,
    gen,
    disc,
    tx_g,
    tx_d,
    image_shape: tuple[int, int, int],
    nz: int,
    batch: int = 2,
    use_ema: bool = True,
) -> TrainState:
    """Initialize G/D params and optimizer states.

    Initialization is replicated-by-construction: every host/device calls
    this with the same key, replacing the reference's rank-0 parameter
    broadcast (ddgan.py:30-33, :292-294).
    """
    kg, kd, kdrop = jax.random.split(key, 3)
    h, w, c = image_shape
    x = jnp.zeros((batch, h, w, c), jnp.float32)
    t = jnp.zeros((batch,), jnp.int32)
    z = jnp.zeros((batch, nz), jnp.float32)

    g_vars = gen.init({"params": kg, "dropout": kdrop}, x, t, z)
    params_G = g_vars["params"]
    buffers_G = g_vars.get("buffers", {})
    d_vars = disc.init(kd, x, t, x)
    params_D = d_vars["params"]

    return TrainState(
        params_G=params_G,
        params_D=params_D,
        buffers_G=buffers_G,
        opt_G=tx_g.init(params_G),
        opt_D=tx_d.init(params_D),
        ema_G=ema_init(params_G) if use_ema else None,
        step=jnp.zeros((), jnp.int32),
        epoch=jnp.zeros((), jnp.int32),
    )
