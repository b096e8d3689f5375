"""FlowNetS: plain encoder-decoder flow network.

TPU-native re-design of /root/reference/networks/FlowNetS.py (38,676,504
params at input_channels=12).  NHWC activations; returns the 5 flow scales
(flow2..flow6) when ``training`` else flow2 only, matching
FlowNetS.py:91-94.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from flax import linen as nn

from ..nn import packed as P
from ..nn.layers import ConvBlock, Deconv, PredictFlow, UpsampleFlow, cat


class FlowNetS(nn.Module):
    input_channels: int = 12
    batch_norm: bool = False
    dtype: Optional[Any] = None
    # Input arrives ALREADY in the 2x2 space-to-depth rep (B, H/2, W/2,
    # 4*input_channels) — the packed stage-glue interface
    # (ops/stage_glue.py stage_glue(packed=True)): the glue's custom VJP
    # owns the s2d/d2s relayouts, so the packed entry conv is profitable in
    # training too (the round-4 +8 ms/step s2d-backward penalty was the
    # autodiff relayout this interface eliminates).
    packed_input: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False,
                 train_bn: bool = False):
        bn, dt = self.batch_norm, self.dtype
        conv = lambda f, k=3, s=1, name=None: ConvBlock(
            f, k, s, batch_norm=bn, dtype=dt, name=name)

        if self.packed_input:
            if bn:
                raise ValueError("packed_input does not support BatchNorm")
            packed_entry = True
            a_in = x
        else:
            # Standalone use (e.g. FlowNet2S): full-res 7x7/s2 entry conv
            # in the packed rep at INFERENCE only — without the packed glue
            # interface the s2d backward relayouts the live concat
            # cotangent (+8 ms/step measured), so the training forward
            # keeps the direct conv.  Parameters identical either way.
            packed_entry = (not bn and not training
                            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)
            a_in = P.space_to_depth(x) if packed_entry else x
        conv1 = ConvBlock(64, 7, 2, batch_norm=bn, dtype=dt,
                          packed_mode="s2_aligned" if packed_entry else None,
                          name="conv1")
        out_conv1 = conv1(a_in, train_bn)
        out_conv2 = conv(128, 5, 2, "conv2")(out_conv1, train_bn)
        out_conv3 = conv(256, 5, 2, "conv3")(out_conv2, train_bn)
        out_conv3 = conv(256, 3, 1, "conv3_1")(out_conv3, train_bn)
        out_conv4 = conv(512, 3, 2, "conv4")(out_conv3, train_bn)
        out_conv4 = conv(512, 3, 1, "conv4_1")(out_conv4, train_bn)
        out_conv5 = conv(512, 3, 2, "conv5")(out_conv4, train_bn)
        out_conv5 = conv(512, 3, 1, "conv5_1")(out_conv5, train_bn)
        out_conv6 = conv(1024, 3, 2, "conv6")(out_conv5, train_bn)
        out_conv6 = conv(1024, 3, 1, "conv6_1")(out_conv6, train_bn)

        flow6 = PredictFlow(dtype=dt, name="predict_flow6")(out_conv6)
        flow6_up = UpsampleFlow(use_bias=False, dtype=dt,
                                name="upsampled_flow6_to_5")(flow6)
        out_deconv5 = Deconv(512, dtype=dt, name="deconv5")(out_conv6)

        concat5 = cat([out_conv5, out_deconv5, flow6_up])
        flow5 = PredictFlow(dtype=dt, name="predict_flow5")(concat5)
        flow5_up = UpsampleFlow(use_bias=False, dtype=dt,
                                name="upsampled_flow5_to_4")(flow5)
        out_deconv4 = Deconv(256, dtype=dt, name="deconv4")(concat5)

        concat4 = cat([out_conv4, out_deconv4, flow5_up])
        flow4 = PredictFlow(dtype=dt, name="predict_flow4")(concat4)
        flow4_up = UpsampleFlow(use_bias=False, dtype=dt,
                                name="upsampled_flow4_to_3")(flow4)
        out_deconv3 = Deconv(128, dtype=dt, name="deconv3")(concat4)

        concat3 = cat([out_conv3, out_deconv3, flow4_up])
        flow3 = PredictFlow(dtype=dt, name="predict_flow3")(concat3)
        flow3_up = UpsampleFlow(use_bias=False, dtype=dt,
                                name="upsampled_flow3_to_2")(flow3)
        out_deconv2 = Deconv(64, dtype=dt, name="deconv2")(concat3)

        concat2 = cat([out_conv2, out_deconv2, flow3_up])
        flow2 = PredictFlow(dtype=dt, name="predict_flow2")(concat2)

        if training:
            return flow2, flow3, flow4, flow5, flow6
        return (flow2,)
