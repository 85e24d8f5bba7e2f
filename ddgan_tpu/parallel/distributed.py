"""Multi-host runtime initialization.

The reference's L5 layer (ddgan.py:589-644) spawns a process per GPU and
rendezvous via torch.distributed env:// (MASTER_ADDR + hardcoded
MASTER_PORT='6020', NCCL or Gloo). On TPU pods the runtime gives one
process per host; the only required call is `jax.distributed.initialize`,
after which every jit over a Mesh uses ICI/DCN collectives automatically.

`init_processes` mirrors the reference surface (ddgan.py:589-608): it
resolves the coordinator from args (master_address / num_proc_node /
node_rank), initializes the distributed runtime when more than one process
participates, runs `fn(rank, gpu, args)`, and tears down.
"""

from __future__ import annotations

import jax

DEFAULT_PORT = 6020  # the reference's hardcoded MASTER_PORT (ddgan.py:592)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed.initialize with the reference's env:// defaults."""
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def init_processes(rank: int, size: int, fn, args):
    """Reference-shaped wrapper (ddgan.py:589-608): init → fn → teardown.

    `what_backend` ('nccl'/'gloo') has no analog — the interconnect is
    ICI/DCN chosen by the runtime; the flag is accepted and ignored.
    """
    if size > 1:
        coordinator = f"{getattr(args, 'master_address', '127.0.0.1')}:{DEFAULT_PORT}"
        initialize(coordinator, num_processes=size, process_id=rank)
    try:
        return fn(rank, rank, args)
    finally:
        if size > 1:
            # dist.barrier() analog: all hosts sync before teardown
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("ddgan_tpu_teardown")
            jax.distributed.shutdown()
