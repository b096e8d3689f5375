"""Upsampling ops matching the reference's torch semantics.

The reference uses ``nn.Upsample(scale_factor=4, mode='bilinear')`` (default
align_corners=False) for the C/S stages (/root/reference/models.py:43,55)
and ``mode='nearest'`` for the SD branch and final S2
(/root/reference/models.py:70-71, models.py:455).

- nearest, integer scale: torch maps output pixel i -> floor(i/scale), which
  is exactly ``jnp.repeat``.
- bilinear, align_corners=False: output pixel i samples input coordinate
  (i + 0.5)/scale - 0.5 with edge clamping.  For integer scales the weight
  pattern has period ``scale``, so the op decomposes into ``scale`` phases
  per axis, each a static lerp between the input and an edge-clamped
  neighbour shift — pure elementwise ops + reshapes, no gathers (XLA's
  TPU gather lowering made the jnp.take formulation ~20x slower).  Matches
  torch bit-for-bit in fp32.
"""

from __future__ import annotations


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


def _upsample_linear_axis(x: jax.Array, scale: int, axis: int) -> jax.Array:
    """1-D linear upsample along ``axis`` via phase decomposition.

    Output index i = scale*k + p samples input coordinate k + f_p with
    f_p = (p + 0.5)/scale - 0.5 in (-0.5, 0.5): phase p is a static-weight
    lerp between x and its edge-clamped shift (down-shift for f_p < 0,
    up-shift otherwise) — edge clamping falls out of the edge padding.
    """
    n = x.shape[axis]

    def sl(lo, hi):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(lo, hi)
        return x[tuple(idx)]

    x_m1 = jnp.concatenate([sl(0, 1), sl(0, n - 1)], axis=axis)   # x[k-1]
    x_p1 = jnp.concatenate([sl(1, n), sl(n - 1, n)], axis=axis)   # x[k+1]

    phases = []
    for p in range(scale):
        f = (p + 0.5) / scale - 0.5
        if f < 0:
            a, b, w = x_m1, x, float(f + 1.0)
        else:
            a, b, w = x, x_p1, float(f)
        if w == 0.0:
            phases.append(a)
        else:
            w = jnp.asarray(np.float32(w), x.dtype)
            phases.append(a * (1 - w) + b * w)
    stacked = jnp.stack(phases, axis=axis + 1)  # (..., n, scale, ...)
    return stacked.reshape(
        x.shape[:axis] + (n * scale,) + x.shape[axis + 1:])


def upsample_bilinear(x: jax.Array, scale: int = 4) -> jax.Array:
    """NHWC bilinear upsample, torch align_corners=False semantics."""
    x = _upsample_linear_axis(x, scale, 1)
    return _upsample_linear_axis(x, scale, 2)


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
