"""PSO hyperparameter search (outer HPO loop).

Reference: pso.py (combined loss+FID scoring), pso-optim.py (GAN
loss-stability scoring), pso_run.py. The swarm logic is identical; the
evaluation backend is pluggable: in-process (one JAX runtime, no
subprocess — the TPU-friendly default) or subprocess CLI (reference
parity, pso.py:386-402)."""

from .search import Particle, PSO  # noqa: F401
from .scoring import (  # noqa: F401
    normalize_score,
    compute_loss,
    loss_stability_score,
)
from .evaluate import make_evaluator  # noqa: F401
