"""Flax layer library for the TPU-native DDGAN framework.

NHWC layout throughout (TPU-native). Reference semantics from
score_sde/models/{layers,layerspp,dense_layer,up_or_down_sampling}.py,
re-designed as idiomatic Flax modules.
"""

from .layers import (  # noqa: F401
    default_init,
    dense_init,
    get_timestep_embedding,
    Dense,
    Conv1x1,
    Conv3x3,
    ConvLayer,
    NIN,
    PixelNorm,
)
from . import legacy  # noqa: F401
from .blocks import (  # noqa: F401
    AdaptiveGroupNorm,
    HeadGroupNorm,
    GaussianFourierProjection,
    Combine,
    AttnBlockpp,
    Upsample,
    Downsample,
    FirConv2d,
    ResnetBlockDDPMppAdagn,
    ResnetBlockBigGANppAdagn,
    ResnetBlockBigGANppAdagnOne,
)
