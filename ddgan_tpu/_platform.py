"""Backend selection hook for subprocess-driven runs.

The deployment image force-registers the remote TPU backend via a
sitecustomize that also overrides JAX_PLATFORMS, so a subprocess cannot
opt out through the standard env var. Tools that must drive the REAL
CLIs on the CPU backend (e.g. quality sweeps while the TPU tunnel is
down, or CPU-only CI) set DDGAN_TPU_FORCE_PLATFORM=cpu — every CLI
entry point calls apply_force_platform() before anything imports a
device-touching module. Optional DDGAN_TPU_FORCE_NUM_CPU_DEVICES sets
the virtual CPU device count (multi-device CPU meshes).

No reference analog (torch picks the backend per-tensor); this is part
of the TPU-native runtime surface.
"""

from __future__ import annotations

import os


def apply_force_platform() -> None:
    """Honor DDGAN_TPU_FORCE_PLATFORM before the first device query.

    Must run before any jax.devices()/backend initialization; safe to
    call multiple times (jax.config.update is idempotent pre-init and
    raises only if the backend is already initialized to something
    else, which we surface loudly rather than swallow).
    """
    plat = os.environ.get("DDGAN_TPU_FORCE_PLATFORM")
    if not plat:
        return
    import jax

    jax.config.update("jax_platforms", plat)
    n = os.environ.get("DDGAN_TPU_FORCE_NUM_CPU_DEVICES")
    if n:
        jax.config.update("jax_num_cpu_devices", int(n))
