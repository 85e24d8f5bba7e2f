"""Model zoo: NCSN++ generator, time-conditional discriminators, registry."""

from .registry import register_model, get_model  # noqa: F401
from .ncsnpp import NCSNpp  # noqa: F401
from .discriminator import (  # noqa: F401
    TimestepEmbedding,
    DownConvBlock,
    DiscriminatorSmall,
    DiscriminatorLarge,
)
