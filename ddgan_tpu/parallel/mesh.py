"""Mesh construction and sharding helpers.

Replaces the reference's process-spawn + DDP runtime (ddgan.py:589-644):
on TPU, processes are given by the runtime; we just lay devices out on a
1-D 'data' mesh (extensible to more axes later) and let XLA ride ICI for
the gradient all-reduce.
"""

from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"


def make_mesh(
    devices: Sequence[jax.Device] | None = None, axis_name: str = DATA_AXIS
) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, batch, axis_name: str = DATA_AXIS):
    """Place host data onto the mesh, sharded along the batch axis.

    Replaces DistributedSampler + per-rank loaders (ddgan.py:245-254).
    Single-process: the array IS the global batch, device_put splits it
    over local devices. Multi-host: each process passes its HOST-LOCAL
    shard (from the host-sharded DataLoader) and the global batch of
    shape (local_batch * process_count, ...) is assembled from the
    per-process pieces without any cross-host data movement.
    """
    def _put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(_put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh (parameters, coefficients)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
