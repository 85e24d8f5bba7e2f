"""Device-mesh parallelism utilities.

The reference's single parallelism strategy is single-node multi-process
data parallelism over NCCL/Gloo (SURVEY.md §2.4; ddgan.py:589-644). The
TPU-native equivalent is SPMD over a `jax.sharding.Mesh` with a 'data'
axis: the train step runs under `shard_map`, gradients are `pmean`ed over
ICI, parameters stay replicated. Multi-host rendezvous (the reference's
MASTER_ADDR/PORT env://) is `jax.distributed.initialize`.
"""

from .mesh import make_mesh, shard_batch, replicate  # noqa: F401
from .distributed import initialize, init_processes  # noqa: F401
