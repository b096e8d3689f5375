"""Correlation (cost-volume) op.

TPU-native equivalent of the reference's Correlation CUDA op
(/root/reference/networks/correlation_package/correlation_cuda_kernel.cu).
Semantics (correlation_cuda.cc:25-42, correlation_cuda_kernel.cu:73-147):

    d_rad   = max_displacement // stride2
    D       = 2*d_rad + 1                       (displacements per axis)
    k_rad   = (kernel_size - 1) // 2
    b_rad   = k_rad + max_displacement          (border radius)
    out_h   = ceil((H + 2*pad - 2*b_rad) / stride1)
    out_w   = ceil((W + 2*pad - 2*b_rad) / stride1)
    nelems  = kernel_size^2 * C

    out[b, y, x, (tj+d_rad)*D + (ti+d_rad)]
      = 1/nelems * sum_{j,i in kxk patch} sum_c
          f1p[b, y*s1 + maxd + j,         x*s1 + maxd + i,         c]
        * f2p[b, y*s1 + maxd + tj*s2 + j, x*s1 + maxd + ti*s2 + i, c]

where f1p/f2p are zero-padded by ``pad_size`` (correlation_cuda.cc:36-42).
FlowNetC uses pad=20, K=1, maxd=20, s1=1, s2=2 => 441 output channels, same
spatial size as the input (/root/reference/networks/FlowNetC.py:31).

Two implementations, selected by ``impl``:

- ``"shifts"``: 441 statically-unrolled shifted multiply-reduce ops (VPU).
  Simple, fully general, autodiff-transposable; used as the golden reference.
- ``"mxu"``: banded-matmul formulation.  For each row-shift tj, correlating
  row y of f1 against row y+tj*s2 of f2 over all column shifts ti is a band
  of the (W, Wp) matrix  f1[y] @ f2p[y+tj*s2].T — one big MXU contraction
  batched over (B, H, D) with the band gathered afterwards.  This trades
  ~(Wp/D)x redundant FLOPs for running on the systolic array instead of the
  vector unit, a large net win at FlowNet sizes.

Both are wrapped in a shared ``custom_vjp`` (the backward mirrors
correlation_cuda_kernel.cu:150-334: the gradient w.r.t. each input is the
same shift-gather structure with the roles of the displacement reversed).

Layout: NHWC; output channel index is row-major in (tj, ti), matching the
reference's ``tc = (tj+d_rad)*D + (ti+d_rad)`` (correlation_cuda_kernel.cu:138).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

Array = jax.Array

# Set to "mxu" / "shifts" / "pallas" to pick the forward implementation.
# "pallas" falls back to "mxu" off-TPU or for unsupported configurations.
_DEFAULT_IMPL = "pallas"


def set_default_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    assert impl in ("shifts", "mxu", "pallas")
    _DEFAULT_IMPL = impl


def _out_dims(height, width, pad_size, kernel_size, max_displacement, stride1):
    k_rad = (kernel_size - 1) // 2
    b_rad = k_rad + max_displacement
    out_h = int(math.ceil((height + 2 * pad_size - 2 * b_rad) / stride1))
    out_w = int(math.ceil((width + 2 * pad_size - 2 * b_rad) / stride1))
    return out_h, out_w


def _correlation_shifts(f1, f2, pad_size, kernel_size, max_displacement,
                        stride1, stride2):
    """Statically-unrolled shift formulation (general case).

    Output pixel (y, x) is centred at padded coordinate
    y*s1 + border_radius (border_radius = k_rad + maxd).  NOTE: the reference
    CUDA kernel centres at y*s1 + maxd (correlation_cuda_kernel.cu:91-92),
    which for kernel_size > 1 reads out of bounds at the borders (a latent
    reference bug — every model uses K=1 where the two definitions agree).
    We implement the in-bounds, centred definition.
    """
    _, height, width, channels = f1.shape
    d_rad = max_displacement // stride2
    k_rad = (kernel_size - 1) // 2
    b_rad = k_rad + max_displacement
    out_h, out_w = _out_dims(height, width, pad_size, kernel_size,
                             max_displacement, stride1)
    nelems = kernel_size * kernel_size * channels

    # Extra stride1 of padding guards the ceil() overhang of the out grid.
    pp = pad_size + stride1
    pad = ((0, 0), (pp, pp), (pp, pp), (0, 0))
    f1p = jnp.pad(f1, pad)
    f2p = jnp.pad(f2, pad)

    def window(xp, dy, dx):
        """Strided window of size (out_h, out_w) starting at padded (dy,dx)."""
        return jax.lax.slice(
            xp, (0, dy, dx, 0),
            (xp.shape[0], dy + (out_h - 1) * stride1 + 1,
             dx + (out_w - 1) * stride1 + 1, channels),
            (1, stride1, stride1, 1))

    outs = []
    for tj in range(-d_rad, d_rad + 1):
        for ti in range(-d_rad, d_rad + 1):
            acc = 0.0
            for j in range(-k_rad, k_rad + 1):
                for i in range(-k_rad, k_rad + 1):
                    # padded origin shift: pad grew by stride1 vs pad_size
                    oy = stride1 + b_rad + j
                    ox = stride1 + b_rad + i
                    w1 = window(f1p, oy, ox)
                    w2 = window(f2p, oy + tj * stride2, ox + ti * stride2)
                    acc = acc + jnp.sum(w1 * w2, axis=-1)
            outs.append(acc / nelems)
    return jnp.stack(outs, axis=-1)


def _correlation_mxu(f1, f2, pad_size, kernel_size, max_displacement,
                     stride1, stride2):
    """Banded-matmul formulation (K=1, s1=1 fast path -> MXU)."""
    assert kernel_size == 1 and stride1 == 1, "mxu path needs K=1, s1=1"
    assert pad_size == max_displacement, "mxu path needs pad == max_disp"
    pad = ((0, 0), (pad_size, pad_size), (pad_size, pad_size), (0, 0))
    return _mxu_padded(f1, jnp.pad(f2, pad), max_displacement, stride2)


def _mxu_padded(f1, f2p, max_displacement, stride2):
    """Banded-matmul core on a pre-padded f2.

    ``f2p`` is f1's correlation target zero-padded by maxd on BOTH spatial
    dims — either pad(f2) (single-extent path) or the W-padded halo slab of
    the spatially-sharded composition (ops/correlation_spatial.py), whose
    rows [0, Hloc + 2*maxd) are global rows [off - maxd, off + Hloc + maxd).
    Shared so the two paths are arithmetic-identical per output element
    (same dynamic-slice content, same einsum contraction)."""
    batch, height, width, channels = f1.shape
    d_rad = max_displacement // stride2
    disp = 2 * d_rad + 1

    # Output pixel (y, x) in f1 coords; in padded f2 coords the matching
    # centre is (y + maxd, x + maxd).  Row shift tj*s2 selects padded row
    # y + maxd + tj*s2; columns x + maxd + ti*s2 for ti in [-d_rad, d_rad]
    # form a band of width 2*maxd + 1 around x + maxd.
    wp = width + 2 * max_displacement
    # g2[b, tj, y, :, c] = f2p row (y + maxd + tj*s2), cols centred for x-band
    rows = []
    for tj in range(-d_rad, d_rad + 1):
        r0 = max_displacement + tj * stride2
        rows.append(jax.lax.dynamic_slice(
            f2p, (0, r0, 0, 0), (batch, height, wp, channels)))
    g2 = jnp.stack(rows, axis=1)  # (B, D, H, Wp, C)

    # Batched matmul on MXU: (B, D, H, W, C) x (B, D, H, Wp, C) -> band
    f1b = jnp.broadcast_to(f1[:, None], (batch, disp, height, width, channels))
    corr_full = jnp.einsum(
        "bdhwc,bdhvc->bdhwv", f1b, g2,
        preferred_element_type=jnp.float32)  # (B, D, H, W, Wp)

    # Gather the band: out[..., x, ti] = corr_full[..., x, x + ti*s2 + ... ]
    # column v = x + (ti * s2 + maxd)  for ti in [-d_rad, d_rad]
    xs = jnp.arange(width)[:, None]
    tis = jnp.arange(disp)[None, :] * stride2
    idx = xs + tis  # (W, D), values in [0, Wp)
    band = jnp.take_along_axis(
        corr_full, idx[None, None, None], axis=-1)  # (B, D, H, W, D)
    out = jnp.transpose(band, (0, 2, 3, 1, 4))  # (B, H, W, Dj, Di)
    out = out.reshape(batch, height, width, disp * disp)
    return (out / channels).astype(f1.dtype)


def _dispatch(f1, f2, pad_size, kernel_size, max_displacement, stride1,
              stride2, impl):
    if impl == "mxu" and kernel_size == 1 and stride1 == 1 \
            and pad_size == max_displacement:
        return _correlation_mxu(f1, f2, pad_size, kernel_size,
                                max_displacement, stride1, stride2)
    if impl == "pallas":
        from . import correlation_pallas
        from .sharding_hints import kernel_wrapper_desc, record_dispatch
        if jax.default_backend() == "tpu" and correlation_pallas.supported(
                f1, pad_size, kernel_size, max_displacement, stride1, stride2):
            wrap, desc = kernel_wrapper_desc(f1.shape[0])
        elif correlation_pallas.supported(f1, pad_size, kernel_size,
                                          max_displacement, stride1, stride2):
            _, tdesc = kernel_wrapper_desc(f1.shape[0])
            wrap, desc = None, (
                f"xla-fallback (backend={jax.default_backend()}; "
                f"on TPU: {tdesc})")
        else:
            wrap, desc = None, "xla-fallback (unsupported shape)"
        record_dispatch("correlation", desc)
        if wrap is not None:
            return wrap(functools.partial(
                correlation_pallas.correlation_pallas,
                pad_size=pad_size, max_displacement=max_displacement,
                stride2=stride2))(f1, f2)
        if kernel_size == 1 and stride1 == 1 and pad_size == max_displacement:
            return _correlation_mxu(f1, f2, pad_size, kernel_size,
                                    max_displacement, stride1, stride2)
        return _correlation_shifts(f1, f2, pad_size, kernel_size,
                                   max_displacement, stride1, stride2)
    return _correlation_shifts(f1, f2, pad_size, kernel_size,
                               max_displacement, stride1, stride2)


def correlation(f1: Array, f2: Array, pad_size: int = 20,
                kernel_size: int = 1, max_displacement: int = 20,
                stride1: int = 1, stride2: int = 2, corr_multiply: int = 1,
                impl: str | None = None) -> Array:
    """Cost volume between two NHWC feature maps.

    Args mirror the reference op's constructor
    (/root/reference/networks/correlation_package/correlation.py:46-60).
    ``corr_multiply`` is accepted for parity; like the reference kernel it
    has no effect.  Returns (B, out_h, out_w, D*D).
    """
    if kernel_size == 1 and stride1 == 1 and pad_size == max_displacement:
        # Under a spatially-sharded mesh the op composes as a (data,
        # spatial) shard_map with a +-maxd halo slab of f2 — the CP-analog
        # path (ops/correlation_spatial.py); the correlation window is
        # statically bounded (unlike the warp's data-dependent flow), so
        # the composition is exact at any shard height.
        from .correlation_spatial import spatial_wrapper

        sw = spatial_wrapper(f1, f2, max_displacement, stride2,
                             impl or _DEFAULT_IMPL)
        if sw is not None:
            return sw(f1, f2)
    return _correlation_core(f1, f2, pad_size, kernel_size, max_displacement,
                             stride1, stride2, corr_multiply, impl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def _correlation_core(f1: Array, f2: Array, pad_size: int = 20,
                      kernel_size: int = 1, max_displacement: int = 20,
                      stride1: int = 1, stride2: int = 2,
                      corr_multiply: int = 1,
                      impl: str | None = None) -> Array:
    """Single-extent correlation (no spatial-mesh composition): Pallas
    kernels / MXU / shifts per ``impl``; custom VJP below."""
    del corr_multiply
    return _dispatch(f1, f2, pad_size, kernel_size, max_displacement,
                     stride1, stride2, impl or _DEFAULT_IMPL)


def _corr_fwd(f1, f2, pad_size, kernel_size, max_displacement, stride1,
              stride2, corr_multiply, impl):
    out = _correlation_core(f1, f2, pad_size, kernel_size, max_displacement,
                            stride1, stride2, corr_multiply, impl)
    return out, (f1, f2)


def _corr_bwd(pad_size, kernel_size, max_displacement, stride1, stride2,
              corr_multiply, impl, res, g):
    """Gradients via shift-gathers (mirrors correlation_cuda_kernel.cu:150-334).

    d f1[p] = 1/nelems * sum_d g[p - patch offsets...] * f2 shifted by d
    d f2[p] = 1/nelems * sum_d g shifted by -d * f1 shifted by -d

    For the FlowNet case (K=1, s1=1, pad=maxd) this reduces to, per
    displacement (tj, ti):
      d_f1 += shift(g[..., d] (broadcast over C) * shift(f2, +d)) / C
      d_f2[y2, x2] += g[y2 - dy, x2 - dx, d] * f1[y2 - dy, x2 - dx] / C
    implemented with pads + slices so XLA fuses the whole bundle.
    """
    del corr_multiply
    f1, f2 = res
    batch, height, width, channels = f1.shape
    d_rad = max_displacement // stride2
    disp = 2 * d_rad + 1
    if kernel_size != 1 or stride1 != 1 or pad_size != max_displacement:
        # General case: fall back to autodiff of the shifts formulation.
        def fwd(a, b):
            return _correlation_shifts(a, b, pad_size, kernel_size,
                                       max_displacement, stride1, stride2)
        _, vjp = jax.vjp(fwd, f1, f2)
        return vjp(g)

    # TPU fast path: banded-matmul Pallas backward kernels (the equivalents
    # of correlation_cuda_kernel.cu:150-334's dedicated backward kernels).
    from . import correlation_pallas
    from .sharding_hints import kernel_wrapper
    if (impl or _DEFAULT_IMPL) == "pallas" \
            and jax.default_backend() == "tpu" \
            and correlation_pallas.supported_bwd(
                f1, pad_size, kernel_size, max_displacement, stride1, stride2):
        wrap = kernel_wrapper(f1.shape[0])
        if wrap is not None:
            d_f1, d_f2 = wrap(functools.partial(
                correlation_pallas.correlation_pallas_bwd,
                pad_size=pad_size, max_displacement=max_displacement,
                stride2=stride2))(g, f1, f2)
            return d_f1.astype(f1.dtype), d_f2.astype(f2.dtype)

    nelems = float(channels)
    maxd = max_displacement
    pad = ((0, 0), (pad_size, pad_size), (pad_size, pad_size), (0, 0))
    f2p = jnp.pad(f2, pad)
    # Pad g and f1 ONCE by maxd so every reverse shift (-tj, -ti) is a plain
    # slice of the padded arrays (no scatters, and — critically — no pad
    # inside the 441-way loop: a per-iteration pad-of-product followed by a
    # shifted slice sent XLA's algebraic simplifier into its 50-run
    # pad/slice-commuting cycle under spatial sharding, the
    # MULTICHIP_r01.json warning; hoisting the pads mirrors the d_f1
    # structure, which always compiled clean).
    gpad = ((0, 0), (maxd, maxd), (maxd, maxd), (0, 0))
    gp = jnp.pad(g.astype(jnp.float32), gpad)              # (B, H+2m, W+2m, D*D)
    f1pp = jnp.pad(f1.astype(jnp.float32), gpad)           # (B, H+2m, W+2m, C)

    d_f1 = jnp.zeros_like(f1, dtype=jnp.float32)
    d_f2 = jnp.zeros_like(f2, dtype=jnp.float32)
    for tj in range(-d_rad, d_rad + 1):
        for ti in range(-d_rad, d_rad + 1):
            d = (tj + d_rad) * disp + (ti + d_rad)
            gd = g[..., d:d + 1].astype(jnp.float32)  # (B, H, W, 1)
            f2s = jax.lax.dynamic_slice(
                f2p, (0, pad_size + tj * stride2, pad_size + ti * stride2, 0),
                (batch, height, width, channels)).astype(jnp.float32)
            d_f1 = d_f1 + gd * f2s
            # d_f2[y + tj*s2, x + ti*s2] += g[y, x, d] * f1[y, x]: slice the
            # padded g-channel and padded f1 at the same reverse offset —
            # wherever the source is out of range both slices read zeros.
            oy = maxd - tj * stride2
            ox = maxd - ti * stride2
            gs = jax.lax.dynamic_slice(
                gp, (0, oy, ox, d), (batch, height, width, 1))
            f1s = jax.lax.dynamic_slice(
                f1pp, (0, oy, ox, 0), (batch, height, width, channels))
            d_f2 = d_f2 + gs * f1s
    return (d_f1 / nelems).astype(f1.dtype), (d_f2 / nelems).astype(f2.dtype)


_correlation_core.defvjp(_corr_fwd, _corr_bwd)


class Correlation:
    """Callable wrapper mirroring the reference module's constructor surface
    (/root/reference/networks/correlation_package/correlation.py:46-60)."""

    def __init__(self, pad_size: int = 0, kernel_size: int = 0,
                 max_displacement: int = 0, stride1: int = 1,
                 stride2: int = 2, corr_multiply: int = 1,
                 impl: str | None = None):
        self.pad_size = pad_size
        self.kernel_size = kernel_size
        self.max_displacement = max_displacement
        self.stride1 = stride1
        self.stride2 = stride2
        self.corr_multiply = corr_multiply
        self.impl = impl

    def __call__(self, f1: Array, f2: Array) -> Array:
        return correlation(f1, f2, self.pad_size, self.kernel_size,
                           self.max_displacement, self.stride1, self.stride2,
                           self.corr_multiply, self.impl)
