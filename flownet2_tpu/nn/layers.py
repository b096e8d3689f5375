"""NHWC conv/deconv building blocks (Flax linen).

TPU-native equivalents of the reference's submodule builders
(/root/reference/networks/submodules.py:7-38):

- ``ConvBlock``    = conv():  Conv2d(+BatchNorm) + LeakyReLU(0.1)
- ``IConv``        = i_conv(): Conv2d(+BatchNorm), no activation
- ``PredictFlow``  = predict_flow(): 3x3 conv -> 2 channels
- ``Deconv``       = deconv(): ConvTranspose2d(4, stride 2, pad 1) + LeakyReLU(0.1)
- ``UpsampleFlow`` = the bare ConvTranspose2d(2, 2, 4, 2, 1) flow upsamplers

Weight layout is HWIO and activations NHWC.  ``Deconv``/``UpsampleFlow``
store the *flipped* kernel so the transposed convolution lowers to a single
``conv_general_dilated`` with input dilation — the exact XLA-native form —
and the checkpoint importer flips torch kernels on the way in
(checkpoints/torch_import.py).

Init matches the reference exactly (models.py:92-101): xavier-uniform
weights, U[0, 1) biases (yes, uniform on [0,1) — that is what
``torch.nn.init.uniform_`` does with default args).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

xavier_uniform = nn.initializers.xavier_uniform()
bias_uniform = nn.initializers.uniform(scale=1.0)


def leaky_relu(x: jax.Array) -> jax.Array:
    """LeakyReLU(0.1), the activation used throughout the reference."""
    return jax.nn.leaky_relu(x, negative_slope=0.1)


def conv3x3_s1_tap(x: jax.Array, kernel: jax.Array, dtype: Dtype) -> jax.Array:
    """Exact 'SAME' 3x3/s1 conv as ONE matmul with the 9 taps packed into
    the output lanes, + 9 statically-shifted adds.

    XLA's direct conv at Cout=2 (predict_flow at full resolution) runs at
    ~0.3 TF/s on v5e — the 128-lane MXU output is 98% idle.  Packing taps
    gives N = 9*Cout lanes and a dense (BHW, Cin) @ (Cin, 9*Cout) dot;
    measured 3.2 -> 1.7 ms for 16->2 @ b8 384x512.  Only profitable when
    the U = (B, H, W, 9*Cout) intermediate is small, i.e. tiny Cout —
    at Cout=64 the same rewrite measured 10x WORSE (U is 9x the output).
    """
    batch, height, width, cin = x.shape
    cout = kernel.shape[3]
    km = kernel.transpose(2, 0, 1, 3).reshape(cin, 9 * cout).astype(dtype)
    u = x.astype(dtype).reshape(batch * height * width, cin) @ km
    # Accumulate the 9 tap partial sums in f32: with dtype=bfloat16 the
    # sequential adds would otherwise round 9 times where the direct conv
    # rounds once (ADVICE r3); Cout<=4 makes the f32 buffer negligible.
    u = u.reshape(batch, height, width, 9, cout).astype(jnp.float32)
    out = jnp.zeros((batch, height, width, cout), jnp.float32)
    t = 0
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            # u[b, y, x, t] is input pixel (y, x)'s contribution through
            # tap (dy, dx) to output (y - dy, x - dx)
            ys, ye = max(dy, 0), height + min(dy, 0)
            xs, xe = max(dx, 0), width + min(dx, 0)
            pad = ((0, 0), (max(-dy, 0), max(dy, 0)),
                   (max(-dx, 0), max(dx, 0)), (0, 0))
            out = out + jnp.pad(u[:, ys:ye, xs:xe, t], pad)
            t += 1
    return out.astype(dtype)


def _conv3x3_direct(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def _tapconv(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Tap-packed forward, direct-conv gradients (same linear map — XLA's
    conv grads beat autodiff through the tap form's pad/slice chain on the
    training path, measured +2.5 ms/step the other way)."""
    return conv3x3_s1_tap(x, kernel, x.dtype)


def _tapconv_fwd(x, kernel):
    return _tapconv(x, kernel), (x, kernel)


def _tapconv_bwd(res, g):
    x, kernel = res
    d_x, = jax.linear_transpose(lambda xx: _conv3x3_direct(xx, kernel), x)(g)
    d_k, = jax.linear_transpose(lambda kk: _conv3x3_direct(x, kk), kernel)(g)
    return d_x, d_k


_tapconv.defvjp(_tapconv_fwd, _tapconv_bwd)


class _TapConv3x3(nn.Module):
    """Drop-in for nn.Conv(3x3, s1, SAME) computing via conv3x3_s1_tap.
    Identical parameter tree (kernel HWIO + bias)."""
    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cin = x.shape[-1]
        kernel = self.param("kernel", xavier_uniform,
                            (3, 3, cin, self.features), jnp.float32)
        dtype = self.dtype or x.dtype
        y = _tapconv(x.astype(dtype), kernel.astype(dtype))
        if self.use_bias:
            bias = self.param("bias", bias_uniform, (self.features,),
                              jnp.float32)
            y = y + bias.astype(dtype)
        return y


class _PackedConv(nn.Module):
    """Conv computed in a 2x2 space-to-depth rep (see nn/packed.py).

    Parameter tree is identical to nn.Conv (canonical HWIO ``kernel`` +
    ``bias``); the packed kernel is derived at trace time.  ``mode``:

      'a2s'        3x3/s1, aligned in -> staggered out (UNMASKED — the
                   caller masks after bias/activation via staggered_mask)
      's2a'        3x3/s1, staggered in -> aligned out
      's2_stag'    3x3/s2, staggered in -> unpacked half-res out
      's2_aligned' odd-K/s2, aligned in -> unpacked half-res out

    ``in_splits``: full-res channel sizes of the concat parts making up
    the packed input (a packed concat interleaves per-tensor phase groups,
    so the kernel's input rows are permuted to match — free at trace
    time).  None = single tensor.
    """
    features: int
    mode: str
    kernel_size: int = 3
    use_bias: bool = True
    in_splits: Optional[tuple] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from . import packed as P

        cin = x.shape[-1] // 4
        k = self.kernel_size
        kernel = self.param("kernel", xavier_uniform,
                            (k, k, cin, self.features), jnp.float32)
        dtype = self.dtype or x.dtype
        xd = x.astype(dtype)
        kd = kernel.astype(dtype)
        fn = {"a2s": P.conv_a2s, "s2a": P.conv_s2a, "a2f": P.conv_a2f,
              "s2_stag": P.conv_s2_from_stag,
              "s2_aligned": P.conv_s2_from_aligned}[self.mode]
        if self.in_splits is not None:
            fn = functools.partial(fn, in_splits=tuple(self.in_splits))
        y = fn(xd, kd)
        if self.use_bias:
            bias = self.param("bias", bias_uniform, (self.features,),
                              jnp.float32).astype(dtype)
            if self.mode in ("a2s", "s2a"):  # packed output: phase-tiled
                bias = P.bias_phase(bias)
            y = y + bias
        return y


_TAP_MAX_COUT = 4
_TAP_MIN_PIXELS = 192 * 256


def _conv2d(x, features, kernel_size, stride, use_bias, dtype, name,
            packed_mode=None, in_splits=None):
    """nn.Conv with the reference's padding/init; tiny-Cout high-resolution
    3x3 convs (the full-res predict_flow heads) route through the
    tap-packed matmul form (see conv3x3_s1_tap); ``packed_mode`` routes
    through the space-to-depth rewrites (_PackedConv / nn.packed) used by
    the full-res levels of FlowNetFusion / FlowNetSD.

    A standalone per-layer phase-packed routing (space-to-depth in, conv,
    depth-to-space out for ONE layer) was measured on v5e in round 3 and
    LOST at the model level (63 -> 88 ms FlowNet2 fwd: the per-layer HBM
    transposes cost more than the MXU lane win); the subnet-level packed
    reps in nn/packed.py supersede it (one relayout per LEVEL, not per
    layer) and the per-layer helper has been removed.
    """
    if packed_mode is not None:
        return _PackedConv(features, packed_mode, kernel_size,
                           use_bias=use_bias, in_splits=in_splits,
                           dtype=dtype, name=name)(x)
    if (kernel_size == 3 and stride == 1 and features <= _TAP_MAX_COUT
            and x.shape[1] * x.shape[2] >= _TAP_MIN_PIXELS):
        return _TapConv3x3(features, use_bias=use_bias, dtype=dtype,
                           name=name)(x)
    pad = (kernel_size - 1) // 2
    return nn.Conv(
        features,
        (kernel_size, kernel_size),
        strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        use_bias=use_bias,
        dtype=dtype,
        kernel_init=xavier_uniform,
        bias_init=bias_uniform,
        name=name,
    )(x)


class ConvBlock(nn.Module):
    """conv() builder: Conv2d + optional BatchNorm + LeakyReLU(0.1).

    Mirrors /root/reference/networks/submodules.py:7-18: with batch_norm the
    conv drops its bias; padding is (k-1)//2.
    """
    features: int
    kernel_size: int = 3
    stride: int = 1
    batch_norm: bool = False
    dtype: Optional[Dtype] = None
    packed_mode: Optional[str] = None
    in_splits: Optional[tuple] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.packed_mode is not None and self.batch_norm:
            # ValueError, not assert: user-reachable configuration error
            # that must survive python -O (round-4 advisor finding) —
            # packed reps would give per-packed-phase (wrong) BN statistics
            raise ValueError("packed conv paths do not support BatchNorm")
        x = _conv2d(x, self.features, self.kernel_size, self.stride,
                    not self.batch_norm, self.dtype, "conv",
                    self.packed_mode, self.in_splits)
        if self.batch_norm:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,  # torch BatchNorm2d momentum=0.1
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn",
            )(x)
        return leaky_relu(x)


class IConv(nn.Module):
    """i_conv() builder: Conv2d + optional BatchNorm, no activation
    (/root/reference/networks/submodules.py:20-29)."""
    features: int
    kernel_size: int = 3
    stride: int = 1
    batch_norm: bool = False
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    packed_mode: Optional[str] = None
    in_splits: Optional[tuple] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.packed_mode is not None and self.batch_norm:
            raise ValueError("packed conv paths do not support BatchNorm")
        x = _conv2d(x, self.features, self.kernel_size, self.stride,
                    self.use_bias, self.dtype, "conv",
                    self.packed_mode, self.in_splits)
        if self.batch_norm:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn",
            )(x)
        return x


class PredictFlow(nn.Module):
    """predict_flow() builder: 3x3 conv to 2 flow channels
    (/root/reference/networks/submodules.py:31-32)."""
    dtype: Optional[Dtype] = None
    packed_mode: Optional[str] = None
    in_splits: Optional[tuple] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return _conv2d(x, 2, 3, 1, True, self.dtype, "conv",
                       self.packed_mode, self.in_splits)


def _tconv_dilated(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """ConvTranspose2d(4, 2, 1) as the direct input-dilated conv.

    ``kernel`` is the flipped torch kernel Wf (our storage convention), so
    the op is exactly conv(dilate2(x), Wf, pad=2).  Used only to DERIVE the
    backward (see _tconv421): XLA's gradient convs for this canonical form
    measured 2-4x faster than the phase form's on v5e (e.g. Fusion deconv0
    fwd+bwd 6.45 -> 4.29 ms, upsampled_flow 2.90 -> 1.42 ms b8)."""
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _tconv_phase(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """ConvTranspose2d(4, 2, 1) forward via phase decomposition.

    Split by output parity: out[2u+py, 2v+px] only reads taps
    Wf[2a+py, 2b+px], a 2x2 subkernel per phase.  One stride-1 VALID conv
    over the (1,1)-padded input with the (2, 2, Cin, 4*Cout) phase-stacked
    kernel computes exactly the useful FLOPs at 4x the lane width of the
    dilated form (whose input is 3/4 zeros), and the phases interleave back
    with a reshape:

        y = conv(pad(x, 1), k2)                  # (B, H+1, W+1, 4*Cout)
        out[2u+py, 2v+px, c] = y[u+py, v+px, (2*py+px)*Cout + c]
    """
    batch, height, width, cin = x.shape
    cout = kernel.shape[3]
    # Wf[2a+py, 2b+px, ci, co] -> k2[a, b, ci, (2*py+px)*Cout + co]
    k2 = kernel.reshape(2, 2, 2, 2, cin, cout)
    k2 = k2.transpose(0, 2, 4, 1, 3, 5).reshape(2, 2, cin, 4 * cout)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp, k2,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H+1, W+1, 4*Cout)

    phases = [
        y[:, py:py + height, px:px + width,
          (2 * py + px) * cout:(2 * py + px + 1) * cout]
        for py in (0, 1) for px in (0, 1)
    ]
    # (B, H, py, W, px, C) -> (B, 2H, 2W, C)
    out = jnp.stack(
        [jnp.stack(phases[0:2], axis=3), jnp.stack(phases[2:4], axis=3)],
        axis=2)
    return out.reshape(batch, 2 * height, 2 * width, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _tconv421(x: jax.Array, kernel: jax.Array,
              phase_fwd: bool = True) -> jax.Array:
    """Best-of-both ConvTranspose2d(4, 2, 1): forward via either the
    phase decomposition (full MXU lane width — wins at low resolution /
    wide channels) or the canonical dilated conv (no phase-interleave
    copies — wins at high resolution / narrow channels, where the
    interleave's strided relayout costs more than the conv, measured);
    gradients always from the transpose of the dilated formulation (XLA's
    canonical conv-transpose grads, 2-4x faster than the phase form's).
    All formulations are the same linear map, so mixing them is exact.
    """
    return _tconv_phase(x, kernel) if phase_fwd else _tconv_dilated(x, kernel)


def _tconv421_fwd(x, kernel, phase_fwd):
    return _tconv421(x, kernel, phase_fwd), (x, kernel)


def _tconv421_bwd(phase_fwd, res, g):
    x, kernel = res
    # linear_transpose builds ONLY the transposed computation (no forward
    # recompute) of the dilated formulation.
    d_x, = jax.linear_transpose(lambda xx: _tconv_dilated(xx, kernel), x)(g)
    d_k, = jax.linear_transpose(lambda kk: _tconv_dilated(x, kk), kernel)(g)
    return d_x, d_k


_tconv421.defvjp(_tconv421_fwd, _tconv421_bwd)

# Output-pixel threshold up to which the phase forward is used.  In-graph
# on v5e the dilated forward won at EVERY FlowNet2 layer (the phase form's
# interleave — 4-way slice + stack + reshape — is a strided relayout that
# XLA can't fuse, and it blocks fusing the following LeakyReLU into the
# conv): FlowNet2 inference 56.7 -> 46.3 ms/b8 going all-dilated, with the
# largest step at the full-res Fusion deconvs (threshold sweep in
# scripts/tconv_experiment.py; standalone microbenches said the opposite
# and were misleading).  0 = always dilated; kept overridable for
# experiments via set_tconv_phase_max_pixels.
_TCONV_PHASE_MAX_OUT_PIXELS = 0


def set_tconv_phase_max_pixels(n: int) -> None:
    global _TCONV_PHASE_MAX_OUT_PIXELS
    _TCONV_PHASE_MAX_OUT_PIXELS = n


class _TransposedConv(nn.Module):
    """ConvTranspose2d(k=4, s=2, p=1); see _tconv421 for the formulation."""
    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    staggered_out: bool = False

    kernel_size: int = 4
    stride: int = 2
    padding: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from . import packed as P

        in_features = x.shape[-1]
        k = self.kernel_size
        kernel = self.param(
            "kernel", xavier_uniform, (k, k, in_features, self.features),
            jnp.float32)
        dtype = self.dtype or x.dtype
        assert (k, self.stride, self.padding) == (4, 2, 1), \
            "phase decomposition is specialised to the reference's (4, 2, 1)"
        if self.staggered_out:
            out = P.tconv_to_staggered(x.astype(dtype), kernel.astype(dtype))
            if self.use_bias:
                bias = self.param("bias", bias_uniform, (self.features,),
                                  jnp.float32)
                out = out + P.bias_phase(bias.astype(dtype))
            return out
        out_pixels = 4 * x.shape[1] * x.shape[2]
        phase_fwd = out_pixels <= _TCONV_PHASE_MAX_OUT_PIXELS
        out = _tconv421(x.astype(dtype), kernel.astype(dtype), phase_fwd)
        if self.use_bias:
            bias = self.param("bias", bias_uniform, (self.features,),
                              jnp.float32)
            out = out + bias.astype(dtype)
        return out


class Deconv(nn.Module):
    """deconv() builder: ConvTranspose2d(4, 2, 1) + LeakyReLU(0.1)
    (/root/reference/networks/submodules.py:34-38)."""
    features: int
    dtype: Optional[Dtype] = None
    staggered_out: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = _TransposedConv(self.features, use_bias=True, dtype=self.dtype,
                            staggered_out=self.staggered_out,
                            name="tconv")(x)
        return leaky_relu(x)


class UpsampleFlow(nn.Module):
    """Learned 2x flow upsampler: bare ConvTranspose2d(2, 2, 4, 2, 1).

    bias=True in FlowNetC (/root/reference/networks/FlowNetC.py:55-58),
    bias=False in FlowNetS (/root/reference/networks/FlowNetS.py:48-51),
    default (True) in SD/Fusion.
    """
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    staggered_out: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return _TransposedConv(2, use_bias=self.use_bias, dtype=self.dtype,
                               staggered_out=self.staggered_out,
                               name="tconv")(x)


def cat(xs: Sequence[jax.Array]) -> jax.Array:
    """Channel concat (NHWC) — the reference's torch.cat(dim=1)."""
    return jnp.concatenate(xs, axis=-1)
