"""Channel-wise L2 norm.

TPU-native equivalent of the reference's ChannelNorm CUDA op
(/root/reference/networks/channelnorm_package/channelnorm_kernel.cu:51-59
forward, :92-94 backward).  Reference semantics:

    out[b, 1, y, x] = sqrt(sum_c x[b, c, y, x]^2)
    grad_in = grad_out * x / (out + 1e-9)

Here activations are NHWC, so the norm is over the trailing axis and the
output keeps a singleton channel.  The op is elementwise + a lane reduction:
XLA fuses it into neighbouring ops, so no Pallas kernel is needed; we only
pin the backward with a ``custom_vjp`` to reproduce the reference's 1e-9
denominator guard (plain autodiff of sqrt would produce NaN at exact zeros).

``norm_deg`` is accepted for API parity; like the reference kernel (which
hard-codes L2 regardless of the plumbed ``norm_deg``,
channelnorm_kernel.cu:51-59) only the L2 path is implemented.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-9


@jax.custom_vjp
def channel_norm(x: jax.Array) -> jax.Array:
    """L2 norm over the trailing (channel) axis, keepdims.

    Args:
      x: (..., C) array.
    Returns:
      (..., 1) array of per-position channel norms.
    """
    return jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))


def _fwd(x):
    out = channel_norm(x)
    return out, (x, out)


def _bwd(res, g):
    x, out = res
    return (g * x / (out + _EPS),)


channel_norm.defvjp(_fwd, _bwd)


@jax.custom_vjp
def channel_norm_multi(*xs: jax.Array) -> jax.Array:
    """Per-input L2 channel norms packed into one (..., N) tensor.

    Equivalent to ``cat([channel_norm(x) for x in xs])`` — same values, same
    1e-9-guarded backward — but materialised as a single N-channel tensor.
    Why: FlowNet2's fusion-input concat carries four 1-channel norm maps
    (models.py:179); (B, H, W, 1) f32 cotangents get 128-lane-padded
    layouts on TPU, and the concat's backward split into 1-channel pieces
    alone cost ~8 ms/step at b8 384x448 (profiled).  Packing the norms
    turns those four splits into one 4-channel slice (~2x cheaper glue
    backward, measured)."""
    return jnp.concatenate(
        [jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True)) for x in xs],
        axis=-1)


def _multi_fwd(*xs):
    out = channel_norm_multi(*xs)
    return out, (xs, out)


def _multi_bwd(res, g):
    xs, out = res
    return tuple(
        g[..., i:i + 1] * x / (out[..., i:i + 1] + _EPS)
        for i, x in enumerate(xs))


channel_norm_multi.defvjp(_multi_fwd, _multi_bwd)


class ChannelNorm:
    """Callable wrapper mirroring the reference module's constructor surface
    (/root/reference/networks/channelnorm_package/channelnorm.py:31-38)."""

    def __init__(self, norm_deg: int = 2):
        if norm_deg != 2:
            raise NotImplementedError(
                "Only L2 channel norm is supported (the reference kernel "
                "hard-codes L2 as well)."
            )
        self.norm_deg = norm_deg

    def __call__(self, x: jax.Array) -> jax.Array:
        return channel_norm(x)
