"""Fused cascade-stage glue: cat([x, warp(x2, flow), flow/div, ||x1-warp||]).

The FlowNet2 cascade computes, between stages (models.py:133-151):

    resampled = resample2d(x2, flow)
    diff      = x1 - resampled                  (x1 = x[..., :3])
    norm      = channel_norm(diff)
    concat    = cat([x, resampled, flow/div_flow, norm])

Left to autodiff, the backward of this block dominates the glue cost of
the train step: the concat VJP slices the 12-channel cotangent into 3-, 2-
and 1-channel pieces — each slice reads a lane-minor (B, H, W, smallC)
tensor whose (8, 128) tiles are ~90% padding (measured 2.1 ms PER SLICE at
b8 384x448, 6 slices/step across the two stages) — and the warp kernel's
saved tangents get transposed to NHWC only to be contracted back.

This op fuses the block with a hand-written VJP that works in
CHANNEL-MAJOR form end-to-end: ONE (B, 12, H, W) transpose of the
cotangent (slices along the leading channel dim are then free), diff/norm
recomputed from the warp kernel's native (B, C, Hp, Wp) plane outputs, and
the flow gradient contracted directly against the kernel's channel-major
tangents (resample2d_pallas.resample2d_bilinear_tangents_cm).  The input
cotangents d_x / d_x2 are still produced honestly (for completeness), but
in every FlowNet model x and x2 are leaves, so XLA dead-code-eliminates
them along with their expensive slices/scatters.

Falls back to the plain composition (autodiff) whenever the Pallas warp
path is unavailable (CPU tests, unsupported shapes, spatial sharding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .channelnorm import channel_norm
from .resample2d import _pallas_wrapper, _scatter_d_img, resample2d

_EPS = 1e-9


def _plain_glue(x, x2, flow, div_flow):
    resampled = resample2d(x2, flow)
    diff = x[..., :3] - resampled
    norm = channel_norm(diff)
    return jnp.concatenate(
        [x, resampled, (flow / div_flow).astype(x.dtype), norm], axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_glue(x, x2, flow, div_flow):
    return _plain_glue(x, x2, flow, div_flow)


def _fused_fwd(x, x2, flow, div_flow):
    from .resample2d_pallas import resample2d_bilinear_tangents_cm

    wrap = _pallas_wrapper(x2, 1, True)
    fn = wrap(resample2d_bilinear_tangents_cm)
    resampled, out_cm, d1_cm, d2_cm = fn(x2, flow)
    x1 = x[..., :3]
    diff = x1 - resampled
    norm = channel_norm(diff)
    concat = jnp.concatenate(
        [x, resampled, (flow / div_flow).astype(x.dtype), norm], axis=-1)
    return concat, (x1, x2, flow, out_cm, d1_cm, d2_cm)


def _fused_bwd(div_flow, res, g):
    # ONE channel-major relayout of the LIVE cotangent channels (6..12 —
    # the warp/flow/norm pieces; channels 0..6 only feed the dead d_x);
    # slices along the leading channel dim below are free.  Everything
    # slices the SAME padded array (wrapped in an optimization_barrier —
    # without it XLA materialised the transpose in three layouts, one per
    # consumer cluster; the barrier measured -1.7 ms/step at b8 384x448).
    x1 = res[0]
    hp, wp = res[3].shape[2], res[3].shape[3]
    height, width = x1.shape[1:3]
    g_cm_p = jax.lax.optimization_barrier(jnp.pad(
        jnp.transpose(g[..., 6:].astype(jnp.float32), (0, 3, 1, 2)),
        ((0, 0), (0, 0), (0, hp - height), (0, wp - width))))
    return _glue_bwd_core(div_flow, res, g_cm_p, g[..., :6])


def _glue_bwd_core(div_flow, res, g_cm_p, g_x_nhwc):
    """Shared backward body: ``g_cm_p`` is the concat cotangent's LIVE
    channels 6..12 in padded channel-major form (B, 6, Hp, Wp) f32;
    ``g_x_nhwc`` its first six channels in NHWC (only used for the
    dead-in-practice d_x)."""
    x1, x2, flow, out_cm, d1_cm, d2_cm = res
    batch, height, width, _ = x1.shape
    hp, wp = out_cm.shape[2], out_cm.shape[3]

    g_r = g_cm_p[:, 0:3]
    g_f = g_cm_p[:, 3:5, :height, :width]
    g_n = g_cm_p[:, 5:6]

    # diff / norm recomputed in cm form from the kernel's native planes
    x1_cm = jnp.pad(jnp.transpose(x1.astype(jnp.float32), (0, 3, 1, 2)),
                    ((0, 0), (0, 0), (0, hp - height), (0, wp - width)))
    diff_cm = x1_cm - out_cm.astype(jnp.float32)
    norm_cm = jnp.sqrt(jnp.sum(diff_cm * diff_cm, axis=1, keepdims=True))
    d_diff = g_n * diff_cm / (norm_cm + _EPS)   # channel_norm VJP
    gw = g_r - d_diff                           # warp-output cotangent (cm)

    # flow gradient: contraction against the kernel's cm tangents + the
    # concat's flow/div piece — assembled per component, no transposes
    dfx = jnp.sum(gw * d1_cm, axis=1)[:, :height, :width]
    dfy = jnp.sum(gw * d2_cm, axis=1)[:, :height, :width]
    d_flow = jnp.stack([dfx + g_f[:, 0] / div_flow,
                        dfy + g_f[:, 1] / div_flow],
                       axis=-1).astype(flow.dtype)

    # Honest input cotangents — dead (and DCE'd) in every FlowNet model,
    # where x/x2 are leaves.
    d_diff_nhwc = jnp.transpose(
        d_diff[:, :, :height, :width], (0, 2, 3, 1))
    d_x = g_x_nhwc.astype(jnp.float32) + jnp.pad(
        d_diff_nhwc, ((0, 0), (0, 0), (0, 0), (0, 3)))
    gw_nhwc = jnp.transpose(gw[:, :, :height, :width], (0, 2, 3, 1))
    d_x2 = _scatter_d_img(x2.astype(jnp.float32), flow, gw_nhwc, 1,
                          height, width)
    return d_x.astype(x1.dtype), d_x2.astype(x2.dtype), d_flow


_fused_glue.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# Packed-output variant: the glue emits the concat already in the 2x2
# space-to-depth rep (B, H/2, W/2, 48) feeding FlowNetS's packed entry conv
# (models/flownet_s.py packed_input).  This moves the s2d across the
# glue<->conv1 seam INTO the glue's custom VJP: the backward receives the
# 48-lane packed cotangent (whose producing dgrad conv writes full-lane
# tiles instead of 12-lane-minor ones) and relayouts it to channel-major
# form in ONE transpose — the depth-to-space and the NHWC->cm transpose
# composed.  Round 4 measured the naive alternative (packed entry conv with
# the s2d backward left to autodiff) at +8 ms/step; this form keeps the
# entry conv packed in TRAINING at a profit (docs/PERF_r05.md).
# ---------------------------------------------------------------------------

def _s2d(x):
    from ..nn.packed import space_to_depth
    return space_to_depth(x)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_glue_packed(x, x2, flow, div_flow):
    return _s2d(_plain_glue(x, x2, flow, div_flow))


def _fused_packed_fwd(x, x2, flow, div_flow):
    concat, res = _fused_fwd(x, x2, flow, div_flow)
    return _s2d(concat), res


def _interleave(x0, x1, axis):
    """Interleave two equal arrays along ``axis`` (x0 at even positions)."""
    stacked = jnp.stack([x0, x1], axis=axis + 1)
    shape = x0.shape[:axis] + (2 * x0.shape[axis],) + x0.shape[axis + 1:]
    return stacked.reshape(shape)


def packed_to_cm(g_p, channels, c0, c1, hp, wp):
    """Packed (B, h, w, 4*channels) with phase groups (a, b, c) ->
    channel-major full-res (B, c1-c0, Hp, Wp) f32 of channels [c0, c1),
    zero-padded to (hp, wp) — the depth-to-space and the NHWC->cm
    transpose composed into one 6D transpose.

    A phase-sliced formulation (4 quarter-res cm transposes + stack
    interleaves) measured 3x FASTER standalone but 6 ms/step SLOWER
    in-graph — XLA turned the interleaves into channel-minor 5D loop
    fusions regardless of barrier placement; in-graph fusion context
    decides (round-4 design rule), so the 6D transpose stays."""
    batch, h2, w2, _ = g_p.shape
    g6 = g_p.reshape(batch, h2, w2, 2, 2, channels)[..., c0:c1]
    full = jnp.transpose(g6.astype(jnp.float32), (0, 5, 1, 3, 2, 4)) \
        .reshape(batch, c1 - c0, 2 * h2, 2 * w2)
    return jnp.pad(full, ((0, 0), (0, 0), (0, hp - 2 * h2),
                          (0, wp - 2 * w2)))


def _fused_packed_bwd(div_flow, res, g_p):
    # g_p (B, h, w, 48), phase groups (a, b, c12).  Only channels 6..12 of
    # each group are live (0..6 feed the dead d_x); relayout exactly those
    # to padded cm form via the phase-slice interleave.  Barriers on BOTH
    # sides: without them XLA fuses the interleave stacks into its
    # neighbours as 5D loop fusions with (8,128)-hostile layouts (measured
    # +6 ms/step — the standalone relayout is 3x faster than what the
    # fused form produced).
    hp, wp = res[3].shape[2], res[3].shape[3]
    g_cm_p = jax.lax.optimization_barrier(
        packed_to_cm(g_p, 12, 6, 12, hp, wp))
    # d_x path (dead in every model graph, DCE'd): cheap NHWC rebuild
    height, width = res[0].shape[1], res[0].shape[2]
    g_x_nhwc = jnp.transpose(
        packed_to_cm(g_p, 12, 0, 6, height, width), (0, 2, 3, 1))
    return _glue_bwd_core(div_flow, res, g_cm_p, g_x_nhwc)


_fused_glue_packed.defvjp(_fused_packed_fwd, _fused_packed_bwd)


def stage_glue(x: jax.Array, x2: jax.Array, flow: jax.Array,
               div_flow: float, packed: bool = False) -> jax.Array:
    """cat([x, resample2d(x2, flow), flow/div_flow, ||x[..,:3]-warp||]).

    x: (B, H, W, 6) the stacked frame pair; x2: (B, H, W, 3); flow
    (B, H, W, 2).  Returns the stage's 12-channel concat
    (/root/reference/models.py:133-138 and the S1/S2 repeats) — or, with
    ``packed``, its exact 2x2 space-to-depth rep (B, H/2, W/2, 48) for a
    packed FlowNetS entry (requires even H, W).
    """
    has_kernel = _pallas_wrapper(x2, 1, True) is not None
    if packed:
        if x.shape[1] % 2 or x.shape[2] % 2:
            raise ValueError(f"packed stage_glue needs even H, W; got "
                             f"{x.shape}")
        if has_kernel:
            return _fused_glue_packed(x, x2, flow, div_flow)
        return _s2d(_plain_glue(x, x2, flow, div_flow))
    if has_kernel:
        return _fused_glue(x, x2, flow, div_flow)
    return _plain_glue(x, x2, flow, div_flow)


# ---------------------------------------------------------------------------
# Fusion-input glue: cat([x1, sd_flow, s2_flow, 4 channel norms])
# ---------------------------------------------------------------------------

def _plain_fusion_glue(x1, x2, sd_flow, s2_flow):
    from .channelnorm import channel_norm_multi

    warp_sd = resample2d(x2, sd_flow)
    warp_s2 = resample2d(x2, s2_flow)
    norms = channel_norm_multi(sd_flow, s2_flow, x1 - warp_sd, x1 - warp_s2)
    return jnp.concatenate([x1, sd_flow, s2_flow, norms], axis=-1)


@jax.custom_vjp
def _fused_fusion_glue(x1, x2, sd_flow, s2_flow):
    # Inference forward: ONE two-flow kernel call — the resident x2 planes
    # are DMA'd/layout-converted once for both warps (they were the
    # largest inference trace item; VERDICT r4 next #6).
    from .resample2d_pallas import resample2d_bilinear_pallas_multi

    wrap = _pallas_wrapper(x2, 1, True)
    if wrap is None:
        return _plain_fusion_glue(x1, x2, sd_flow, s2_flow)
    from .channelnorm import channel_norm_multi

    flows = jnp.stack([sd_flow, s2_flow], axis=1)
    warps = wrap(resample2d_bilinear_pallas_multi)(x2, flows)
    warp_sd, warp_s2 = warps[:, 0], warps[:, 1]
    norms = channel_norm_multi(sd_flow, s2_flow, x1 - warp_sd, x1 - warp_s2)
    return jnp.concatenate([x1, sd_flow, s2_flow, norms], axis=-1)


def _fusion_fwd(x1, x2, sd_flow, s2_flow):
    # Training forward: TWO single-flow tangent-saving calls.  The two-flow
    # folded-grid kernel (resample2d_bilinear_tangents_cm_multi) was
    # measured and LOSES here: 132.6 vs 108.4 ms/step (b8 @ 384x448 f32,
    # v5e) — the promised once-per-batch-item plane residency does not
    # show up as a win even at inference (multi 38.54 vs single 38.44
    # ms/b8), and with the three tangent outputs interleaved across the
    # (B*F) grid the train step regresses ~24 ms (docs/PERF_r05.md).  The
    # inference primal keeps the multi kernel (neutral, fewer launches).
    from .resample2d_pallas import resample2d_bilinear_tangents_cm

    wrap = _pallas_wrapper(x2, 1, True)
    fn = wrap(resample2d_bilinear_tangents_cm)
    warp_sd, sd_cm, d1sd, d2sd = fn(x2, sd_flow)
    warp_s2, s2_cm, d1s2, d2s2 = fn(x2, s2_flow)
    err_sd = x1 - warp_sd
    err_s2 = x1 - warp_s2
    norms = jnp.concatenate(
        [jnp.sqrt(jnp.sum(t * t, axis=-1, keepdims=True))
         for t in (sd_flow, s2_flow, err_sd, err_s2)], axis=-1)
    concat = jnp.concatenate([x1, sd_flow, s2_flow, norms], axis=-1)
    res = (x1, x2, sd_flow, s2_flow, sd_cm, s2_cm, d1sd, d2sd, d1s2, d2s2)
    return concat, res


def _fusion_bwd(res, g):
    # Live cotangent channels are 3..11 (0..3 only feed the dead d_x1);
    # ONE cm relayout of exactly those (see _fused_bwd).
    x1 = res[0]
    hp, wp = res[4].shape[2], res[4].shape[3]
    height, width = x1.shape[1:3]
    g_cm_p = jax.lax.optimization_barrier(jnp.pad(
        jnp.transpose(g[..., 3:].astype(jnp.float32), (0, 3, 1, 2)),
        ((0, 0), (0, 0), (0, hp - height), (0, wp - width))))
    return _fusion_bwd_core(res, g_cm_p, g[..., :3])


def _fusion_bwd_core(res, g_cm_p, g_x1_nhwc):
    """Shared backward body: ``g_cm_p`` holds the concat3 cotangent's LIVE
    channels 3..11 in padded cm form (B, 8, Hp, Wp) f32; ``g_x1_nhwc`` the
    first three channels in NHWC (only for the dead-in-practice d_x1)."""
    x1, x2, sd_flow, s2_flow, sd_cm, s2_cm, d1sd, d2sd, d1s2, d2s2 = res
    batch, height, width, _ = x1.shape
    hp, wp = sd_cm.shape[2], sd_cm.shape[3]

    g_sdf = g_cm_p[:, 0:2, :height, :width]
    g_s2f = g_cm_p[:, 2:4, :height, :width]
    g_nsd_flow = g_cm_p[:, 4:5, :height, :width]   # d ||sd_flow||
    g_ns2_flow = g_cm_p[:, 5:6, :height, :width]   # d ||s2_flow||
    g_nerr_sd = g_cm_p[:, 6:7]    # d ||x1 - warp_sd||
    g_nerr_s2 = g_cm_p[:, 7:8]    # d ||x1 - warp_s2||

    x1_cm = jnp.pad(jnp.transpose(x1.astype(jnp.float32), (0, 3, 1, 2)),
                    ((0, 0), (0, 0), (0, hp - height), (0, wp - width)))

    def flow_grad(g_flow_direct, g_norm_flow, g_nerr, flow, warp_cm, d1, d2):
        # norm-of-flow VJP in cm form
        f_cm = jnp.transpose(flow.astype(jnp.float32), (0, 3, 1, 2))
        nf = jnp.sqrt(jnp.sum(f_cm * f_cm, axis=1, keepdims=True))
        d_f = g_norm_flow * f_cm / (nf + _EPS)
        # norm-of-error VJP -> warp cotangent -> tangent contraction
        err_cm = x1_cm - warp_cm.astype(jnp.float32)
        ne = jnp.sqrt(jnp.sum(err_cm * err_cm, axis=1, keepdims=True))
        d_err = g_nerr * err_cm / (ne + _EPS)
        gw = -d_err                                   # (B, 3, Hp, Wp)
        dfx = jnp.sum(gw * d1, axis=1)[:, :height, :width]
        dfy = jnp.sum(gw * d2, axis=1)[:, :height, :width]
        d_flow = jnp.stack(
            [dfx + g_flow_direct[:, 0] + d_f[:, 0],
             dfy + g_flow_direct[:, 1] + d_f[:, 1]],
            axis=-1).astype(flow.dtype)
        return d_flow, d_err

    d_sd_flow, d_err_sd = flow_grad(g_sdf, g_nsd_flow, g_nerr_sd,
                                    sd_flow, sd_cm, d1sd, d2sd)
    d_s2_flow, d_err_s2 = flow_grad(g_s2f, g_ns2_flow, g_nerr_s2,
                                    s2_flow, s2_cm, d1s2, d2s2)

    # Honest input cotangents — dead (DCE'd) in the models.
    d_x1 = (g_x1_nhwc.astype(jnp.float32)
            + jnp.transpose((d_err_sd + d_err_s2)[:, :, :height, :width],
                            (0, 2, 3, 1)))
    x2f = x2.astype(jnp.float32)
    d_x2 = sum(
        _scatter_d_img(
            x2f, flow,
            jnp.transpose(-d_err[:, :, :height, :width], (0, 2, 3, 1)),
            1, height, width)
        for flow, d_err in ((sd_flow, d_err_sd), (s2_flow, d_err_s2)))
    return (d_x1.astype(x1.dtype), d_x2.astype(x2.dtype),
            d_sd_flow, d_s2_flow)


_fused_fusion_glue.defvjp(_fusion_fwd, _fusion_bwd)


@jax.custom_vjp
def _fused_fusion_glue_packed(x1, x2, sd_flow, s2_flow):
    return _s2d(_fused_fusion_glue(x1, x2, sd_flow, s2_flow))


def _fusion_packed_fwd(x1, x2, sd_flow, s2_flow):
    concat, res = _fusion_fwd(x1, x2, sd_flow, s2_flow)
    return _s2d(concat), res


def _fusion_packed_bwd(res, g_p):
    # g_p (B, h, w, 44), phase groups (a, b, c11); live channels 3..11.
    hp, wp = res[4].shape[2], res[4].shape[3]
    g_cm_p = jax.lax.optimization_barrier(
        packed_to_cm(g_p, 11, 3, 11, hp, wp))
    height, width = res[0].shape[1], res[0].shape[2]
    g_x1_nhwc = jnp.transpose(
        packed_to_cm(g_p, 11, 0, 3, height, width), (0, 2, 3, 1))
    return _fusion_bwd_core(res, g_cm_p, g_x1_nhwc)


_fused_fusion_glue_packed.defvjp(_fusion_packed_fwd, _fusion_packed_bwd)


def fusion_glue(x1: jax.Array, x2: jax.Array, sd_flow: jax.Array,
                s2_flow: jax.Array, packed: bool = False) -> jax.Array:
    """The FlowNetFusion input block (models.py:155-179):

        cat([x1, sd_flow, s2_flow,
             ||sd_flow||, ||s2_flow||,
             ||x1 - warp(x2, sd_flow)||, ||x1 - warp(x2, s2_flow)||])

    returning the 11-channel concat3.  Fused for the same reason as
    stage_glue: left to autodiff, channel_norm_multi's backward slices the
    cotangent into 1-channel lane-minor pieces (the single most expensive
    op in the round-4 train trace, 8.4 ms/step) and the two warps pay NHWC
    transposes around their tangent contractions.
    """
    has_kernel = _pallas_wrapper(x2, 1, True) is not None
    if packed:
        if x1.shape[1] % 2 or x1.shape[2] % 2:
            raise ValueError(f"packed fusion_glue needs even H, W; got "
                             f"{x1.shape}")
        if has_kernel:
            return _fused_fusion_glue_packed(x1, x2, sd_flow, s2_flow)
        return _s2d(_plain_fusion_glue(x1, x2, sd_flow, s2_flow))
    if has_kernel:
        return _fused_fusion_glue(x1, x2, sd_flow, s2_flow)
    return _plain_fusion_glue(x1, x2, sd_flow, s2_flow)
