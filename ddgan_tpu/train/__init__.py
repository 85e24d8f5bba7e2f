"""Training subsystem: functional EMA, optax optimizers, the fused
jitted+shard_mapped GAN train step, and the host-side training loop."""

from .ema import ema_init, ema_update  # noqa: F401
from .optim import make_optimizer, cosine_lr  # noqa: F401
from .zero1 import (  # noqa: F401
    Zero1Optimizer,
    Zero1OptState,
    make_zero1_optimizer,
    place_zero1_state,
)
from .state import TrainState, create_train_state  # noqa: F401
from .step import make_train_step  # noqa: F401
from .loop import train  # noqa: F401
