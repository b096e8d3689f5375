"""FlowNetSD: small-displacement variant.

TPU-native re-design of /root/reference/networks/FlowNetSD.py (45,371,666
params): all-3x3 encoder with conv0/conv1_1/conv2_1 extras, and i_conv
inter-convs before each flow prediction.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from flax import linen as nn

from ..nn import packed as P
from ..nn.layers import ConvBlock, Deconv, IConv, PredictFlow, UpsampleFlow, cat


def _use_packed(x: jax.Array, batch_norm: bool) -> bool:
    """The full-resolution levels run in the exact 2x2 space-to-depth rep
    (nn/packed.py) when possible: full-res 3x3 convs with <=64 output
    channels starve the MXU lane dim (0.3-15 TF/s measured on v5e) and the
    packed rewrite runs them at full lane width with one relayout per
    subnet.  BatchNorm needs per-original-channel statistics, so BN
    configurations use the direct convs."""
    return (not batch_norm and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0)


class FlowNetSD(nn.Module):
    batch_norm: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jax.Array, training: bool = False,
                 train_bn: bool = False):
        bn, dt = self.batch_norm, self.dtype
        conv = lambda f, k=3, s=1, name=None: ConvBlock(
            f, k, s, batch_norm=bn, dtype=dt, name=name)
        iconv = lambda f, name: IConv(f, 3, 1, batch_norm=bn, dtype=dt, name=name)

        if _use_packed(x, bn):
            # conv0 (full-res 3x3/s1) + conv1 (3x3/s2) in the packed rep:
            # one space_to_depth in, conv1 emits the unpacked half-res
            # tensor directly.
            a_in = P.space_to_depth(x)
            s_conv0 = P.staggered_mask(
                ConvBlock(64, 3, 1, batch_norm=bn, dtype=dt,
                          packed_mode="a2s", name="conv0")(a_in, train_bn),
                64)
            out_conv1 = ConvBlock(64, 3, 2, batch_norm=bn, dtype=dt,
                                  packed_mode="s2_stag",
                                  name="conv1")(s_conv0, train_bn)
        else:
            out_conv0 = conv(64, 3, 1, "conv0")(x, train_bn)
            out_conv1 = conv(64, 3, 2, "conv1")(out_conv0, train_bn)
        out_conv1 = conv(128, 3, 1, "conv1_1")(out_conv1, train_bn)
        out_conv2 = conv(128, 3, 2, "conv2")(out_conv1, train_bn)
        out_conv2 = conv(128, 3, 1, "conv2_1")(out_conv2, train_bn)
        out_conv3 = conv(256, 3, 2, "conv3")(out_conv2, train_bn)
        out_conv3 = conv(256, 3, 1, "conv3_1")(out_conv3, train_bn)
        out_conv4 = conv(512, 3, 2, "conv4")(out_conv3, train_bn)
        out_conv4 = conv(512, 3, 1, "conv4_1")(out_conv4, train_bn)
        out_conv5 = conv(512, 3, 2, "conv5")(out_conv4, train_bn)
        out_conv5 = conv(512, 3, 1, "conv5_1")(out_conv5, train_bn)
        out_conv6 = conv(1024, 3, 2, "conv6")(out_conv5, train_bn)
        out_conv6 = conv(1024, 3, 1, "conv6_1")(out_conv6, train_bn)

        flow6 = PredictFlow(dtype=dt, name="predict_flow6")(out_conv6)
        flow6_up = UpsampleFlow(dtype=dt, name="upsampled_flow6_to_5")(flow6)
        out_deconv5 = Deconv(512, dtype=dt, name="deconv5")(out_conv6)

        concat5 = cat([out_conv5, out_deconv5, flow6_up])
        out_interconv5 = iconv(512, "inter_conv5")(concat5, train_bn)
        flow5 = PredictFlow(dtype=dt, name="predict_flow5")(out_interconv5)
        flow5_up = UpsampleFlow(dtype=dt, name="upsampled_flow5_to_4")(flow5)
        out_deconv4 = Deconv(256, dtype=dt, name="deconv4")(concat5)

        concat4 = cat([out_conv4, out_deconv4, flow5_up])
        out_interconv4 = iconv(256, "inter_conv4")(concat4, train_bn)
        flow4 = PredictFlow(dtype=dt, name="predict_flow4")(out_interconv4)
        flow4_up = UpsampleFlow(dtype=dt, name="upsampled_flow4_to_3")(flow4)
        out_deconv3 = Deconv(128, dtype=dt, name="deconv3")(concat4)

        concat3 = cat([out_conv3, out_deconv3, flow4_up])
        out_interconv3 = iconv(128, "inter_conv3")(concat3, train_bn)
        flow3 = PredictFlow(dtype=dt, name="predict_flow3")(out_interconv3)
        flow3_up = UpsampleFlow(dtype=dt, name="upsampled_flow3_to_2")(flow3)
        out_deconv2 = Deconv(64, dtype=dt, name="deconv2")(concat3)

        concat2 = cat([out_conv2, out_deconv2, flow3_up])
        out_interconv2 = iconv(64, "inter_conv2")(concat2, train_bn)
        flow2 = PredictFlow(dtype=dt, name="predict_flow2")(out_interconv2)

        if training:
            return flow2, flow3, flow4, flow5, flow6
        return (flow2,)


class FlowNetFusion(nn.Module):
    """Shallow fusion net (/root/reference/networks/FlowNetFusion.py,
    581,226 params, 11-channel input)."""
    batch_norm: bool = False
    dtype: Optional[Any] = None
    # Input arrives ALREADY in the 2x2 space-to-depth rep (B, H/2, W/2,
    # 44) — the packed fusion-glue interface (ops/stage_glue.py
    # fusion_glue(packed=True)); the glue's custom VJP owns the d2s
    # cotangent relayout that autodiff would otherwise pay here.
    packed_input: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train_bn: bool = False):
        bn, dt = self.batch_norm, self.dtype
        conv = lambda f, k=3, s=1, name=None: ConvBlock(
            f, k, s, batch_norm=bn, dtype=dt, name=name)
        iconv = lambda f, name: IConv(f, 3, 1, batch_norm=bn, dtype=dt, name=name)

        if self.packed_input and bn:
            raise ValueError("packed_input does not support BatchNorm")
        use_packed = self.packed_input or _use_packed(x, bn)
        if use_packed:
            # The whole full-res level lives in the packed rep: aligned and
            # staggered tensors alternate through conv0 -> (deconv0,
            # upsampled_flow1, skip) -> inter_conv0 -> predict_flow0, so the
            # only relayouts are one space_to_depth at entry and the cheap
            # 2-channel staggered unpack at exit.
            a_in = x if self.packed_input else P.space_to_depth(x)
            s_conv0 = P.staggered_mask(
                ConvBlock(64, 3, 1, batch_norm=bn, dtype=dt,
                          packed_mode="a2s", name="conv0")(a_in, train_bn),
                64)
            out_conv1 = ConvBlock(64, 3, 2, batch_norm=bn, dtype=dt,
                                  packed_mode="s2_stag",
                                  name="conv1")(s_conv0, train_bn)
        else:
            out_conv0 = conv(64, 3, 1, "conv0")(x, train_bn)
            out_conv1 = conv(64, 3, 2, "conv1")(out_conv0, train_bn)
        out_conv1 = conv(128, 3, 1, "conv1_1")(out_conv1, train_bn)
        out_conv2 = conv(128, 3, 2, "conv2")(out_conv1, train_bn)
        out_conv2 = conv(128, 3, 1, "conv2_1")(out_conv2, train_bn)

        flow2 = PredictFlow(dtype=dt, name="predict_flow2")(out_conv2)
        flow2_up = UpsampleFlow(dtype=dt, name="upsampled_flow2_to_1")(flow2)
        out_deconv1 = Deconv(32, dtype=dt, name="deconv1")(out_conv2)

        concat1 = cat([out_conv1, out_deconv1, flow2_up])
        out_interconv1 = iconv(32, "inter_conv1")(concat1, train_bn)
        flow1 = PredictFlow(dtype=dt, name="predict_flow1")(out_interconv1)

        if use_packed:
            flow1_up_s = P.staggered_mask(
                UpsampleFlow(dtype=dt, staggered_out=True,
                             name="upsampled_flow1_to_0")(flow1), 2)
            out_deconv0_s = P.staggered_mask(
                Deconv(16, dtype=dt, staggered_out=True,
                       name="deconv0")(concat1), 16)
            concat0_s = cat([s_conv0, out_deconv0_s, flow1_up_s])
            out_interconv0 = IConv(16, 3, 1, batch_norm=bn, dtype=dt,
                                   packed_mode="s2a", in_splits=(64, 16, 2),
                                   name="inter_conv0")(concat0_s, train_bn)
            # a2f fuses the conv with the depth-to-space unpack: the
            # standalone 2-channel staggered unpack measured 1.7 ms/b8 in
            # pathological (2,128)-tiled layouts
            return PredictFlow(dtype=dt, packed_mode="a2f",
                               name="predict_flow0")(out_interconv0)

        flow1_up = UpsampleFlow(dtype=dt, name="upsampled_flow1_to_0")(flow1)
        out_deconv0 = Deconv(16, dtype=dt, name="deconv0")(concat1)

        concat0 = cat([out_conv0, out_deconv0, flow1_up])
        out_interconv0 = iconv(16, "inter_conv0")(concat0, train_bn)
        flow0 = PredictFlow(dtype=dt, name="predict_flow0")(out_interconv0)

        return flow0
