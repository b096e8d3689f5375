"""Upsampling ops matching the reference's torch semantics.

The reference uses ``nn.Upsample(scale_factor=4, mode='bilinear')`` (default
align_corners=False) for the C/S stages (/root/reference/models.py:43,55)
and ``mode='nearest'`` for the SD branch and final S2
(/root/reference/models.py:70-71, models.py:455).

- nearest, integer scale: torch maps output pixel i -> floor(i/scale), which
  is exactly ``jnp.repeat``.
- bilinear, align_corners=False: output pixel i samples input coordinate
  (i + 0.5)/scale - 0.5 with edge clamping.  Implemented explicitly as two
  1-D lerps with static weights (for integer scales the weight pattern has
  period ``scale``), which XLA turns into cheap static gathers + FMAs and
  matches torch bit-for-bit in fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def upsample_nearest(x: jax.Array, scale: int = 4) -> jax.Array:
    """NHWC nearest upsample, torch `mode='nearest'` semantics."""
    x = jnp.repeat(x, scale, axis=1)
    x = jnp.repeat(x, scale, axis=2)
    return x


def _linear_indices_weights(out_size: int, scale: int):
    """Half-pixel (align_corners=False) source indices/weights for 1 axis."""
    in_size = out_size // scale
    coords = (np.arange(out_size) + 0.5) / scale - 0.5
    lo = np.floor(coords).astype(np.int64)
    w_hi = (coords - lo).astype(np.float32)
    lo_cl = np.clip(lo, 0, in_size - 1)
    hi_cl = np.clip(lo + 1, 0, in_size - 1)
    return lo_cl, hi_cl, w_hi


def upsample_bilinear(x: jax.Array, scale: int = 4) -> jax.Array:
    """NHWC bilinear upsample, torch align_corners=False semantics."""
    _, height, width, _ = x.shape
    ylo, yhi, wy = _linear_indices_weights(height * scale, scale)
    xlo, xhi, wx = _linear_indices_weights(width * scale, scale)
    wy = jnp.asarray(wy, x.dtype)[None, :, None, None]
    wx = jnp.asarray(wx, x.dtype)[None, None, :, None]

    top = jnp.take(x, jnp.asarray(ylo), axis=1)
    bot = jnp.take(x, jnp.asarray(yhi), axis=1)
    xv = top * (1 - wy) + bot * wy
    left = jnp.take(xv, jnp.asarray(xlo), axis=2)
    right = jnp.take(xv, jnp.asarray(xhi), axis=2)
    return left * (1 - wx) + right * wx


def upsample(x: jax.Array, scale: int = 4, mode: str = "bilinear") -> jax.Array:
    if mode == "bilinear":
        return upsample_bilinear(x, scale)
    if mode == "nearest":
        return upsample_nearest(x, scale)
    raise ValueError(f"unknown upsample mode {mode!r}")


def avg_pool(x: jax.Array, window: int) -> jax.Array:
    """NHWC average pool with stride == window (torch AvgPool2d(k, k)),
    as used by the MultiScale loss (/root/reference/losses.py:69)."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, window, window, 1), (1, window, window, 1), "VALID")
    return summed / (window * window)
