"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's Gloo-on-CPU affordance (train_ddgan.py:100) — the JAX
analog is the CPU backend with XLA_FLAGS forcing 8 host devices, which lets
multi-chip sharding be exercised without TPU hardware.

NOTE: this environment's sitecustomize registers the remote 'axon' TPU
backend and overrides JAX_PLATFORMS, so env vars alone do NOT select CPU —
`jax.config.update('jax_platforms', 'cpu')` after import is authoritative.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
