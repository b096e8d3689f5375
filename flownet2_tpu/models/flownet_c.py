"""FlowNetC: siamese towers + correlation cost volume + encoder-decoder.

TPU-native re-design of /root/reference/networks/FlowNetC.py (39,175,298
params).  The two input streams share conv1-3 weights (FlowNetC.py:75-85);
the 441-channel cost volume comes from the correlation op
(pad=20, K=1, maxd=20, s1=1, s2=2 — FlowNetC.py:31).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.layers import ConvBlock, Deconv, PredictFlow, UpsampleFlow, cat, leaky_relu
from ..ops import correlation


class FlowNetC(nn.Module):
    batch_norm: bool = False
    dtype: Optional[Any] = None
    corr_impl: Optional[str] = None  # None -> ops.correlation default

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array, training: bool = False,
                 train_bn: bool = False):
        """x1, x2: the two NHWC frames (already normalised), 3 channels each."""
        bn, dt = self.batch_norm, self.dtype
        conv = lambda f, k=3, s=1, name=None: ConvBlock(
            f, k, s, batch_norm=bn, dtype=dt, name=name)

        # Entry conv runs in the 2x2 packed rep at inference only.  Even
        # though x1/x2 are leaves here (the s2d *backward* is DCE'd, unlike
        # FlowNetS's), packing the training forward was measured in round 5
        # and LOSES ~2 ms/step: the conv1 kgrad then needs the s2d'd input
        # as a residual — an extra materialized full-res relayout — and the
        # 3->12 lane win doesn't cover it.  Parameter tree identical.
        packed_entry = (not self.batch_norm and not training
                        and x1.shape[1] % 2 == 0 and x1.shape[2] % 2 == 0)
        conv1 = ConvBlock(64, 7, 2, batch_norm=bn, dtype=dt,
                          packed_mode="s2_aligned" if packed_entry else None,
                          name="conv1")
        conv2 = conv(128, 5, 2, "conv2")
        conv3 = conv(256, 5, 2, "conv3")

        # Siamese towers, shared weights (FlowNetC.py:75-85).  The two
        # streams are batch-stacked into single conv calls — identical math
        # (convs are per-sample), half the kernel launches and double the
        # batch per MXU pass.  Exception: train-mode BatchNorm, where the
        # reference's sequential calls normalise each stream with its own
        # batch statistics — stacking would mix them.
        batch = x1.shape[0]
        if self.batch_norm and train_bn:
            out_conv1a = conv1(x1, train_bn)
            out_conv2a = conv2(out_conv1a, train_bn)
            out_conv3a = conv3(out_conv2a, train_bn)
            out_conv1b = conv1(x2, train_bn)
            out_conv2b = conv2(out_conv1b, train_bn)
            out_conv3b = conv3(out_conv2b, train_bn)
        else:
            from ..nn import packed as P
            x12 = jnp.concatenate([x1, x2], axis=0)  # (2B, H, W, 3)
            out_conv1 = conv1(P.space_to_depth(x12) if packed_entry else x12,
                              train_bn)
            out_conv2 = conv2(out_conv1, train_bn)
            out_conv3 = conv3(out_conv2, train_bn)
            out_conv2a = out_conv2[:batch]
            out_conv3a = out_conv3[:batch]
            out_conv3b = out_conv3[batch:]

        out_corr = correlation(
            out_conv3a, out_conv3b, pad_size=20, kernel_size=1,
            max_displacement=20, stride1=1, stride2=2, corr_multiply=1,
            impl=self.corr_impl)
        out_corr = leaky_relu(out_corr)

        out_conv_redir = conv(32, 1, 1, "conv_redir")(out_conv3a, train_bn)
        in_conv3_1 = cat([out_conv_redir, out_corr])  # 32 + 441 = 473 ch

        out_conv3_1 = conv(256, 3, 1, "conv3_1")(in_conv3_1, train_bn)
        out_conv4 = conv(512, 3, 2, "conv4")(out_conv3_1, train_bn)
        out_conv4 = conv(512, 3, 1, "conv4_1")(out_conv4, train_bn)
        out_conv5 = conv(512, 3, 2, "conv5")(out_conv4, train_bn)
        out_conv5 = conv(512, 3, 1, "conv5_1")(out_conv5, train_bn)
        out_conv6 = conv(1024, 3, 2, "conv6")(out_conv5, train_bn)
        out_conv6 = conv(1024, 3, 1, "conv6_1")(out_conv6, train_bn)

        flow6 = PredictFlow(dtype=dt, name="predict_flow6")(out_conv6)
        flow6_up = UpsampleFlow(use_bias=True, dtype=dt,
                                name="upsampled_flow6_to_5")(flow6)
        out_deconv5 = Deconv(512, dtype=dt, name="deconv5")(out_conv6)

        concat5 = cat([out_conv5, out_deconv5, flow6_up])
        flow5 = PredictFlow(dtype=dt, name="predict_flow5")(concat5)
        flow5_up = UpsampleFlow(use_bias=True, dtype=dt,
                                name="upsampled_flow5_to_4")(flow5)
        out_deconv4 = Deconv(256, dtype=dt, name="deconv4")(concat5)

        concat4 = cat([out_conv4, out_deconv4, flow5_up])
        flow4 = PredictFlow(dtype=dt, name="predict_flow4")(concat4)
        flow4_up = UpsampleFlow(use_bias=True, dtype=dt,
                                name="upsampled_flow4_to_3")(flow4)
        out_deconv3 = Deconv(128, dtype=dt, name="deconv3")(concat4)

        concat3 = cat([out_conv3_1, out_deconv3, flow4_up])
        flow3 = PredictFlow(dtype=dt, name="predict_flow3")(concat3)
        flow3_up = UpsampleFlow(use_bias=True, dtype=dt,
                                name="upsampled_flow3_to_2")(flow3)
        out_deconv2 = Deconv(64, dtype=dt, name="deconv2")(concat3)

        # Note: skip is out_conv2a (the *first* stream), FlowNetC.py:121
        concat2 = cat([out_conv2a, out_deconv2, flow3_up])
        flow2 = PredictFlow(dtype=dt, name="predict_flow2")(concat2)

        if training:
            return flow2, flow3, flow4, flow5, flow6
        return (flow2,)
