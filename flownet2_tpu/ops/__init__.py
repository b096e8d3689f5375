"""Custom compute ops (TPU-native replacements for the reference's CUDA ops)."""

from .channelnorm import ChannelNorm, channel_norm, channel_norm_multi  # noqa: F401
from .correlation import Correlation, correlation, set_default_impl  # noqa: F401
from .resample2d import Resample2d, resample2d  # noqa: F401
from .stage_glue import fusion_glue, stage_glue  # noqa: F401
from .upsample import (  # noqa: F401
    avg_pool,
    upsample,
    upsample_bilinear,
    upsample_nearest,
)
