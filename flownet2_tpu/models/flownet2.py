"""FlowNet2 cascades and inference wrappers.

TPU-native re-design of /root/reference/models.py.  All models take the
frame pair as (B, 2, H, W, 3) NHWC (the reference's (B, 3, 2, H, W),
models.py:124-126, transposed to TPU layout) and perform the reference's
in-model normalisation: subtract the per-pair/per-channel mean and divide
by ``rgb_max`` (models.py:121-123).

Cascade wiring follows models.py:120-185 exactly, including its
asymmetries:
- C/S stages upsample flow2 bilinearly; SD and final S2 use nearest
  (models.py:43,55 vs 70-71).
- SD branch *divides* flow2 by div_flow where others multiply
  (models.py:167 vs 130,142,154).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from flax import linen as nn

from ..nn.layers import cat
from ..ops import (fusion_glue, stage_glue, upsample_bilinear,
                   upsample_nearest)
from .flownet_c import FlowNetC
from .flownet_s import FlowNetS
from .flownet_sd import FlowNetFusion, FlowNetSD


def normalize_pair(inputs: jax.Array, rgb_max: float, dtype=None):
    """Reference input normalisation (models.py:121-126).

    inputs: (B, 2, H, W, 3) uint/float RGB.
    Returns (x1, x2): two (B, H, W, 3) normalised frames, cast to ``dtype``
    when given (the bf16 model casts ONCE here, so downstream glue — warps
    included — runs in the reduced precision end-to-end; the bf16 warp
    kernels then use single-gather packed (L, R) pairs).
    """
    if inputs.ndim != 5 or inputs.shape[1] != 2 or inputs.shape[-1] != 3:
        raise ValueError(
            f"expected frame pairs shaped (B, 2, H, W, 3), got {inputs.shape}")
    h, w = inputs.shape[2], inputs.shape[3]
    if h % 64 or w % 64:
        # The reference enforces this at the dataset layer
        # (/root/reference/datasets.py:68-72); without it the encoder/decoder
        # skip connections misalign.
        raise ValueError(
            f"input H, W must be multiples of 64 (got {h}x{w}); crop or "
            "resize the frames (see data.datasets render_size handling)")
    # staged reduce (spatial dims first, then the frame axis) — exact for
    # the equal-sized groups; slightly kinder to XLA's reduce layout than
    # the single (1, 2, 3) reduce (~0.3-0.5 ms/b8 at 384x512, near noise)
    rgb_mean = inputs.mean(axis=(2, 3), keepdims=True).mean(
        axis=1, keepdims=True)
    x = (inputs - rgb_mean) / rgb_max
    if dtype is not None:
        x = x.astype(dtype)
    return x[:, 0], x[:, 1]


def _packed_glue_io(x: jax.Array, batch_norm: bool) -> bool:
    """Use the packed stage-glue <-> FlowNetS entry interface when the
    spatial dims split 2x2 and no BatchNorm is configured (packed reps
    would give per-phase BN statistics)."""
    return (not batch_norm and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)


class FlowNet2(nn.Module):
    """Full C -> S1 -> S2 (+ SD) -> Fusion cascade (models.py:30-185).

    162,518,834 params (models.py:28).
    """
    batch_norm: bool = False
    div_flow: float = 20.0
    rgb_max: float = 255.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, inputs: jax.Array, training: bool = False,
                 train_bn: bool = False):
        x1, x2 = normalize_pair(inputs, self.rgb_max, self.dtype)
        x = cat([x1, x2])

        # flownetc
        flownetc_flow2 = FlowNetC(self.batch_norm, self.dtype,
                                  name="flownetc")(x1, x2, training, train_bn)[0]
        flownetc_flow = upsample_bilinear(flownetc_flow2 * self.div_flow, 4)

        # warp img1 toward img0; diff magnitude (models.py:133-138) — the
        # fused stage glue computes the whole block with a channel-major
        # hand-written VJP (ops/stage_glue.py); where possible it emits the
        # concat in the 2x2 packed rep feeding FlowNetS's packed entry conv
        # (the s2d/d2s relayouts live inside the glue VJP)
        packed_io = _packed_glue_io(x, self.batch_norm)
        concat1 = stage_glue(x, x2, flownetc_flow, self.div_flow,
                             packed=packed_io)

        # flownets1
        flownets1_flow2 = FlowNetS(12, self.batch_norm, self.dtype,
                                   packed_input=packed_io,
                                   name="flownets_1")(concat1, training, train_bn)[0]
        flownets1_flow = upsample_bilinear(flownets1_flow2 * self.div_flow, 4)

        concat2 = stage_glue(x, x2, flownets1_flow, self.div_flow,
                             packed=packed_io)

        # flownets2 (nearest upsample — models.py:71,154)
        flownets2_flow2 = FlowNetS(12, self.batch_norm, self.dtype,
                                   packed_input=packed_io,
                                   name="flownets_2")(concat2, training, train_bn)[0]
        flownets2_flow = upsample_nearest(flownets2_flow2 * self.div_flow, 4)

        # flownetsd (nearest upsample + divide — models.py:70,167)
        flownetsd_flow2 = FlowNetSD(self.batch_norm, self.dtype,
                                    name="flownets_d")(x, training, train_bn)[0]
        flownetsd_flow = upsample_nearest(flownetsd_flow2 / self.div_flow, 4)

        # fusion input (warps + packed channel norms + concat,
        # models.py:155-179) — fused block with a channel-major VJP
        # (ops/stage_glue.py:fusion_glue), emitted in the 2x2 packed rep
        # feeding FlowNetFusion's packed L0 directly where possible
        concat3 = fusion_glue(x1, x2, flownetsd_flow, flownets2_flow,
                              packed=packed_io)
        flownetfusion_flow = FlowNetFusion(self.batch_norm, self.dtype,
                                           packed_input=packed_io,
                                           name="flownetfusion")(concat3, train_bn)
        return flownetfusion_flow


class FlowNet2C(nn.Module):
    """FlowNetC inference wrapper (models.py:187-253)."""
    batch_norm: bool = False
    div_flow: float = 20.0
    rgb_max: float = 255.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, inputs: jax.Array, training: bool = False,
                 train_bn: bool = False):
        x1, x2 = normalize_pair(inputs, self.rgb_max, self.dtype)
        flows = FlowNetC(self.batch_norm, self.dtype,
                         name="flownetc")(x1, x2, training, train_bn)
        if training:
            return flows
        return upsample_bilinear(flows[0] * self.div_flow, 4)


class FlowNet2S(nn.Module):
    """FlowNetS inference wrapper, 6-channel input (models.py:255-299)."""
    batch_norm: bool = False
    div_flow: float = 20.0
    rgb_max: float = 255.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, inputs: jax.Array, training: bool = False,
                 train_bn: bool = False):
        x1, x2 = normalize_pair(inputs, self.rgb_max, self.dtype)
        x = cat([x1, x2])
        flows = FlowNetS(6, self.batch_norm, self.dtype,
                         name="flownets")(x, training, train_bn)
        if training:
            return flows
        return upsample_bilinear(flows[0] * self.div_flow, 4)


class FlowNet2SD(nn.Module):
    """FlowNetSD inference wrapper (models.py:301-351)."""
    batch_norm: bool = False
    div_flow: float = 20.0
    rgb_max: float = 255.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, inputs: jax.Array, training: bool = False,
                 train_bn: bool = False):
        x1, x2 = normalize_pair(inputs, self.rgb_max, self.dtype)
        x = cat([x1, x2])
        flows = FlowNetSD(self.batch_norm, self.dtype,
                          name="flownetsd")(x, training, train_bn)
        if training:
            return flows
        # NOTE: wrapper multiplies (models.py:351) — unlike the SD branch
        # inside FlowNet2 which divides (models.py:167).
        return upsample_bilinear(flows[0] * self.div_flow, 4)


class FlowNet2CS(nn.Module):
    """C -> S1 cascade (models.py:353-416)."""
    batch_norm: bool = False
    div_flow: float = 20.0
    rgb_max: float = 255.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, inputs: jax.Array, training: bool = False,
                 train_bn: bool = False):
        x1, x2 = normalize_pair(inputs, self.rgb_max, self.dtype)
        x = cat([x1, x2])

        flownetc_flow2 = FlowNetC(self.batch_norm, self.dtype,
                                  name="flownetc")(x1, x2, training, train_bn)[0]
        flownetc_flow = upsample_bilinear(flownetc_flow2 * self.div_flow, 4)

        packed_io = _packed_glue_io(x, self.batch_norm)
        concat1 = stage_glue(x, x2, flownetc_flow, self.div_flow,
                             packed=packed_io)

        flows = FlowNetS(12, self.batch_norm, self.dtype,
                         packed_input=packed_io,
                         name="flownets_1")(concat1, training, train_bn)
        if training:
            return flows
        return upsample_bilinear(flows[0] * self.div_flow, 4)


class FlowNet2CSS(nn.Module):
    """C -> S1 -> S2 cascade (models.py:418-505)."""
    batch_norm: bool = False
    div_flow: float = 20.0
    rgb_max: float = 255.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, inputs: jax.Array, training: bool = False,
                 train_bn: bool = False):
        x1, x2 = normalize_pair(inputs, self.rgb_max, self.dtype)
        x = cat([x1, x2])

        flownetc_flow2 = FlowNetC(self.batch_norm, self.dtype,
                                  name="flownetc")(x1, x2, training, train_bn)[0]
        flownetc_flow = upsample_bilinear(flownetc_flow2 * self.div_flow, 4)

        packed_io = _packed_glue_io(x, self.batch_norm)
        concat1 = stage_glue(x, x2, flownetc_flow, self.div_flow,
                             packed=packed_io)

        flownets1_flow2 = FlowNetS(12, self.batch_norm, self.dtype,
                                   packed_input=packed_io,
                                   name="flownets_1")(concat1, training, train_bn)[0]
        flownets1_flow = upsample_bilinear(flownets1_flow2 * self.div_flow, 4)

        concat2 = stage_glue(x, x2, flownets1_flow, self.div_flow,
                             packed=packed_io)

        flows = FlowNetS(12, self.batch_norm, self.dtype,
                         packed_input=packed_io,
                         name="flownets_2")(concat2, training, train_bn)
        if training:
            return flows
        # final S2 upsample is nearest (models.py:455,503)
        return upsample_nearest(flows[0] * self.div_flow, 4)
