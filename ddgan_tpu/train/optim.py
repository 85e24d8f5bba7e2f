"""Optax optimizers matching the reference's torch Adam semantics.

Reference (ddgan.py:297-313): Adam(lr, betas=(beta1_{g,d}, beta2_{g,d}),
weight_decay) with per-network hyperparams, torch-style L2 weight decay
(wd * p added to the gradient BEFORE Adam moments — not decoupled AdamW),
gradient clipping by global norm BEFORE the optimizer step
(ddgan.py:484,507; note torch clips local grads after DDP all-reduce,
which equals clipping the mean gradient — same here, clip after pmean),
and per-epoch CosineAnnealingLR with eta_min=1e-5 (ddgan.py:312-313).

The learning rate is injected at update time (a traced scalar), so one
compiled train step serves every epoch of the cosine schedule.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import optax


def make_optimizer(
    beta1: float,
    beta2: float,
    weight_decay: float = 0.0,
    grad_clip_norm: float | None = 1.0,
) -> optax.GradientTransformation:
    """Clip → L2-into-grad → Adam scaling. LR applied by `apply_lr`."""
    parts = []
    if grad_clip_norm is not None and grad_clip_norm > 0:
        parts.append(optax.clip_by_global_norm(grad_clip_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=beta1, b2=beta2, eps=1e-8))
    return optax.chain(*parts)


def apply_lr(updates, lr):
    """Scale Adam-preconditioned updates by -lr (lr may be traced)."""
    return jax.tree.map(lambda u: -lr * u, updates)


def cosine_lr(
    base_lr: float, epoch, num_epoch: int, eta_min: float = 1e-5
) -> jnp.ndarray:
    """torch CosineAnnealingLR stepped once per epoch. (ddgan.py:312-313,:524-526)

    num_epoch <= 0 returns base_lr: T_max=0 would divide by zero (NaN lr
    poisoning every parameter after one step — torch raises there instead;
    a 1-epoch run configured as num_epoch=0 should just use the base LR).
    """
    if num_epoch <= 0:
        return jnp.asarray(base_lr, jnp.float32)
    t = jnp.minimum(jnp.asarray(epoch, jnp.float32), num_epoch)
    return eta_min + 0.5 * (base_lr - eta_min) * (
        1.0 + jnp.cos(math.pi * t / num_epoch)
    )
