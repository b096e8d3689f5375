"""Flow warping (backward resampling).

TPU-native equivalent of the reference's Resample2d CUDA op
(/root/reference/networks/resample2d_package/resample2d_kernel.cu).
Semantics (resample2d_kernel.cu:43-71):

    xf = x + flow_x ;  yf = y + flow_y
    alpha = xf - floor(xf) ; beta = yf - floor(yf)
    bilinear: corner indices floor/floor+1 are *clamped* to the image, the
      interpolation weights are NOT re-normalised at borders, and with
      kernel_size K the four corner reads are each summed over a KxK window
      of taps (no extra weighting).
    nearest:  index floor(xf + 0.5), clamped.

The reference kernel is fp32-only (dispatch hard-coded,
resample2d_kernel.cu:218-236) which forced tofp32/tofp16 bracketing in the
torch models; here the op is dtype-polymorphic so no casts are needed.

Implementation: pure-XLA gathers (4 row-contiguous gathers + lerp).  The
VJP is custom (resample2d_kernel.cu:75-198 equivalents): the image gradient
is the transpose scatter-add, expressed with ``.at[].add`` so XLA lowers it
to its native scatter (no atomics on TPU), and the flow gradient is the
analytic bilinear derivative.

Layout: image NHWC, flow NHW2 with channel 0 = dx (x/width displacement),
channel 1 = dy — matching the reference's flow channel order
(resample2d_kernel.cu:40-41: dx from channel 0, dy from channel 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _corner_gather(img, yi, xi):
    """Gather img[b, yi[b,h,w], xi[b,h,w], :] -> (B, H, W, C)."""
    return jax.vmap(lambda im, y, x: im[y, x])(img, yi, xi)


def _bilinear_parts(flow, height, width, row_offset=0.0):
    """Shared coordinate math for forward and backward.

    ``row_offset`` (an exact-integer-valued f32) shifts the output rows'
    coordinates: the spatially-sharded composition evaluates rows
    [off, off + local_h) of the global image.  Adding it to the
    integer-valued iota (exact in f32) BEFORE the flow keeps the result
    bit-identical to the unsharded op's ``ys_global + dy``."""
    dx = flow[..., 0]
    dy = flow[..., 1]
    xs = jax.lax.broadcasted_iota(jnp.float32, dx.shape, 2)
    ys = jax.lax.broadcasted_iota(jnp.float32, dy.shape, 1) + row_offset
    xf = xs + dx.astype(jnp.float32)
    yf = ys + dy.astype(jnp.float32)
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    alpha = xf - x0
    beta = yf - y0
    xL = jnp.clip(x0.astype(jnp.int32), 0, width - 1)
    xR = jnp.clip(x0.astype(jnp.int32) + 1, 0, width - 1)
    yT = jnp.clip(y0.astype(jnp.int32), 0, height - 1)
    yB = jnp.clip(y0.astype(jnp.int32) + 1, 0, height - 1)
    return alpha, beta, xL, xR, yT, yB


# Pallas forward kernel: None = auto (TPU only), True/False = force.
_USE_PALLAS = None


def set_use_pallas(flag) -> None:
    global _USE_PALLAS
    _USE_PALLAS = flag


def _pallas_wrapper(img, kernel_size, bilinear):
    """The composition to call a Pallas kernel with under the current
    backend/mesh (identity or a data-axis shard_map), or None to use the
    XLA fallback (ops/sharding_hints.py)."""
    from . import resample2d_pallas
    from .sharding_hints import kernel_wrapper_desc, record_dispatch

    if not resample2d_pallas.supported(img, kernel_size, bilinear):
        record_dispatch("resample2d", "xla-fallback (shape/dtype unsupported)")
        return None
    if _USE_PALLAS is False:
        record_dispatch("resample2d", "xla-fallback (kernels force-disabled)")
        return None
    if _USE_PALLAS is None and jax.default_backend() != "tpu":
        _, desc = kernel_wrapper_desc(img.shape[0])
        record_dispatch(
            "resample2d", f"xla-fallback (backend={jax.default_backend()}; "
            f"on TPU: {desc})")
        return None
    wrap, desc = kernel_wrapper_desc(img.shape[0])
    record_dispatch("resample2d", desc)
    return wrap


def _resample2d_bilinear_impl(img, flow, kernel_size, row_offset=0.0):
    _, height, width, _ = img.shape
    alpha, beta, xL, xR, yT, yB = _bilinear_parts(flow, height, width,
                                                  row_offset)
    a = alpha[..., None].astype(img.dtype)
    b = beta[..., None].astype(img.dtype)

    out = jnp.zeros(flow.shape[:3] + (img.shape[-1],), img.dtype)
    # Reference sums the 4 corner contributions over a KxK tap window with
    # *unshifted* weights (resample2d_kernel.cu:55-63); K is 1 in every model.
    for fy in range(kernel_size):
        for fx in range(kernel_size):
            yTs = jnp.minimum(yT + fy, height - 1) if fy else yT
            yBs = jnp.minimum(yB + fy, height - 1) if fy else yB
            xLs = jnp.minimum(xL + fx, width - 1) if fx else xL
            xRs = jnp.minimum(xR + fx, width - 1) if fx else xR
            out = out + (1 - a) * (1 - b) * _corner_gather(img, yTs, xLs)
            out = out + a * (1 - b) * _corner_gather(img, yTs, xRs)
            out = out + (1 - a) * b * _corner_gather(img, yBs, xLs)
            out = out + a * b * _corner_gather(img, yBs, xRs)
    return out


def _resample2d_nearest_impl(img, flow, kernel_size):
    del kernel_size  # reference nearest path ignores it (resample2d_kernel.cu:65-70)
    _, height, width, _ = img.shape
    dx = flow[..., 0]
    dy = flow[..., 1]
    xs = jax.lax.broadcasted_iota(jnp.float32, dx.shape, 2)
    ys = jax.lax.broadcasted_iota(jnp.float32, dy.shape, 1)
    xN = jnp.clip(jnp.floor(xs + dx.astype(jnp.float32) + 0.5).astype(jnp.int32), 0, width - 1)
    yN = jnp.clip(jnp.floor(ys + dy.astype(jnp.float32) + 0.5).astype(jnp.int32), 0, height - 1)
    return _corner_gather(img, yN, xN)


def resample2d(img: jax.Array, flow: jax.Array, kernel_size: int = 1,
               bilinear: bool = True) -> jax.Array:
    """Backward-warp ``img`` by ``flow``.

    out[b, y, x, c] = sample(img[b], y + flow[b,y,x,1], x + flow[b,y,x,0], c)

    Args:
      img:  (B, H, W, C) source image (img1; warped toward img0's frame).
      flow: (B, H, W, 2) displacement field, [..., 0]=dx, [..., 1]=dy.
      kernel_size: tap window per corner (reference default 1).
      bilinear: bilinear vs nearest sampling.
    """
    if bilinear and kernel_size == 1:
        # under a spatially-sharded mesh the op composes as a (data,
        # spatial) shard_map with a halo-gather of the source image —
        # the CP-analog path (ops/resample2d_spatial.py)
        from .resample2d_spatial import spatial_wrapper

        sw = spatial_wrapper(img, flow, kernel_size, bilinear)
        if sw is not None:
            return sw(img, flow)
    return _resample2d_core(img, flow, kernel_size, bilinear)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _resample2d_core(img: jax.Array, flow: jax.Array, kernel_size: int = 1,
                     bilinear: bool = True) -> jax.Array:
    """Single-extent warp (no spatial-mesh composition): Pallas kernel when
    available, XLA gather math otherwise; custom VJP below."""
    if bilinear:
        wrap = _pallas_wrapper(img, kernel_size, bilinear)
        if wrap is not None:
            # The kernel handles bf16 planes natively (coordinates stay f32).
            from .resample2d_pallas import resample2d_bilinear_pallas

            return wrap(resample2d_bilinear_pallas)(img, flow)
        if img.dtype == jnp.bfloat16:
            # XLA fallback: warp in f32 (cheap: 3-channel images), return
            # bf16 — avoids bf16 coordinate precision loss
            return _resample2d_bilinear_impl(
                img.astype(jnp.float32), flow.astype(jnp.float32),
                kernel_size).astype(jnp.bfloat16)
        return _resample2d_bilinear_impl(img, flow, kernel_size)
    return _resample2d_nearest_impl(img, flow, kernel_size)


def _resample2d_fwd(img, flow, kernel_size, bilinear):
    # Training-path forward: the Pallas kernel can emit the analytic flow
    # tangents (d out/d dx, d out/d dy) in the same gather sweep, making
    # the backward a pure elementwise contraction instead of a second
    # full sweep (which cost as much as the forward, 4-9 ms per warp b8).
    if bilinear:
        wrap = _pallas_wrapper(img, kernel_size, bilinear)
        if wrap is not None:
            from .resample2d_pallas import resample2d_bilinear_tangents_pallas

            out, d1, d2 = wrap(resample2d_bilinear_tangents_pallas)(img, flow)
            return out, (img, flow, (d1, d2))
    out = _resample2d_core(img, flow, kernel_size, bilinear)
    return out, (img, flow, None)


def _scatter_d_img(img, flow, g, kernel_size, height, width,
                   row_offset=0.0):
    """Image gradient: transpose scatter-add of the bilinear taps.  Dead
    code in every model graph (warp inputs are leaves; XLA DCEs it) —
    implemented for completeness vs resample2d_kernel.cu:75-125 and
    regression-pinned by tests/test_ops_resample2d.py (the live path for
    any future graph that differentiates through the warped image)."""
    alpha, beta, xL, xR, yT, yB = _bilinear_parts(flow, height, width,
                                                  row_offset)
    a = alpha[..., None].astype(img.dtype)
    b = beta[..., None].astype(img.dtype)
    d_img = jnp.zeros_like(img)

    def scatter(acc, yi, xi, w):
        return jax.vmap(lambda zi, y, x, gg: zi.at[y, x].add(gg))(
            acc, yi, xi, w * g)

    for fy in range(kernel_size):
        for fx in range(kernel_size):
            yTs = jnp.minimum(yT + fy, height - 1) if fy else yT
            yBs = jnp.minimum(yB + fy, height - 1) if fy else yB
            xLs = jnp.minimum(xL + fx, width - 1) if fx else xL
            xRs = jnp.minimum(xR + fx, width - 1) if fx else xR
            d_img = scatter(d_img, yTs, xLs, (1 - a) * (1 - b))
            d_img = scatter(d_img, yTs, xRs, a * (1 - b))
            d_img = scatter(d_img, yBs, xLs, (1 - a) * b)
            d_img = scatter(d_img, yBs, xRs, a * b)
    return d_img


def _resample2d_bwd(kernel_size, bilinear, res, g):
    img, flow, tangents = res
    _, height, width, channels = img.shape

    if tangents is not None:
        # saved-tangent fast path: d_flow = (sum_c g*d1, sum_c g*d2); the
        # image gradient stays the XLA scatter below (dead code in every
        # model graph — warp inputs are leaves — and DCE'd by XLA)
        d1, d2 = tangents
        gf = g.astype(jnp.float32)
        d_flow = jnp.stack([jnp.sum(gf * d1, axis=-1),
                            jnp.sum(gf * d2, axis=-1)],
                           axis=-1).astype(flow.dtype)
        d_img = _scatter_d_img(img, flow, g, kernel_size, height, width)
        return d_img, d_flow

    if not bilinear:
        # Nearest: image grad is a pure scatter, flow grad is zero
        # (floor is piecewise constant) — mirrors the reference which only
        # implements the bilinear analytic flow gradient.
        dx = flow[..., 0]
        dy = flow[..., 1]
        xs = jax.lax.broadcasted_iota(jnp.float32, dx.shape, 2)
        ys = jax.lax.broadcasted_iota(jnp.float32, dy.shape, 1)
        xN = jnp.clip(jnp.floor(xs + dx + 0.5).astype(jnp.int32), 0, width - 1)
        yN = jnp.clip(jnp.floor(ys + dy + 0.5).astype(jnp.int32), 0, height - 1)
        d_img = jax.vmap(lambda zi, y, x, gg: zi.at[y, x].add(gg))(
            jnp.zeros_like(img), yN, xN, g)
        return d_img, jnp.zeros_like(flow)

    alpha, beta, xL, xR, yT, yB = _bilinear_parts(flow, height, width)
    a = alpha[..., None].astype(img.dtype)
    b = beta[..., None].astype(img.dtype)

    d_img = jnp.zeros_like(img)
    # d out / d flow: analytic bilinear derivative
    # (resample2d_kernel.cu:127-198).  Accumulated over the KxK taps.
    d_dx = jnp.zeros(flow.shape[:3], img.dtype)
    d_dy = jnp.zeros(flow.shape[:3], img.dtype)

    def scatter(acc, yi, xi, w):
        return jax.vmap(lambda zi, y, x, gg: zi.at[y, x].add(gg))(acc, yi, xi, w * g)

    # TPU fast path for the flow gradient — the hot cotangent in the FlowNet2
    # cascade (the image operand of every warp is a network *input*, so its
    # scatter-add gradient below is dead code XLA removes; the flow gradient
    # feeds the upstream nets and must be fast).
    wrap = _pallas_wrapper(img, kernel_size, bilinear)
    use_pallas_dflow = wrap is not None
    if use_pallas_dflow:
        from .resample2d_pallas import resample2d_grad_flow_pallas

        d_flow_pallas = wrap(resample2d_grad_flow_pallas)(g, img, flow)

    for fy in range(kernel_size):
        for fx in range(kernel_size):
            yTs = jnp.minimum(yT + fy, height - 1) if fy else yT
            yBs = jnp.minimum(yB + fy, height - 1) if fy else yB
            xLs = jnp.minimum(xL + fx, width - 1) if fx else xL
            xRs = jnp.minimum(xR + fx, width - 1) if fx else xR

            d_img = scatter(d_img, yTs, xLs, (1 - a) * (1 - b))
            d_img = scatter(d_img, yTs, xRs, a * (1 - b))
            d_img = scatter(d_img, yBs, xLs, (1 - a) * b)
            d_img = scatter(d_img, yBs, xRs, a * b)

            if use_pallas_dflow:
                continue

            iTL = _corner_gather(img, yTs, xLs)
            iTR = _corner_gather(img, yTs, xRs)
            iBL = _corner_gather(img, yBs, xLs)
            iBR = _corner_gather(img, yBs, xRs)

            gd = g
            d_dx = d_dx + jnp.sum(
                gd * ((1 - b) * (iTR - iTL) + b * (iBR - iBL)), axis=-1)
            d_dy = d_dy + jnp.sum(
                gd * ((1 - a) * (iBL - iTL) + a * (iBR - iTR)), axis=-1)

    if use_pallas_dflow:
        d_flow = d_flow_pallas.astype(flow.dtype)
    else:
        d_flow = jnp.stack([d_dx, d_dy], axis=-1).astype(flow.dtype)
    return d_img, d_flow


_resample2d_core.defvjp(_resample2d_fwd, _resample2d_bwd)


class Resample2d:
    """Callable wrapper mirroring the reference module's constructor surface
    (/root/reference/networks/resample2d_package/resample2d.py:40-49)."""

    def __init__(self, kernel_size: int = 1, bilinear: bool = True):
        self.kernel_size = kernel_size
        self.bilinear = bilinear

    def __call__(self, img: jax.Array, flow: jax.Array) -> jax.Array:
        return resample2d(img, flow, self.kernel_size, self.bilinear)
