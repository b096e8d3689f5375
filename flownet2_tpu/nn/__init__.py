"""NHWC conv/deconv building blocks."""

from .layers import (  # noqa: F401
    ConvBlock,
    Deconv,
    IConv,
    PredictFlow,
    UpsampleFlow,
    cat,
    leaky_relu,
)
