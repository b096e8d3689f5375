"""Pallas TPU kernels for bilinear flow warping (resample2d fwd + flow-grad).

Why: XLA lowers the per-pixel 2D gather to a scalar loop on TPU (~46 ms for
(8, 384, 512, 3) — measured), which made the 4 warps dominate FlowNet2
inference, and the backward's corner gathers dominate FlowNet2 training.
Mosaic's hardware dynamic-gather works within a single (8, 128) VMEM tile
(sublane- or lane-wise), so these kernels compose the full gather out of
tile-local gathers:

  for each (8, 128) tile of output pixels:
    compute source coords (xf, yf), corner indices and lerp weights ONCE
    (shared across channels — image channels are resident per batch item);
    reduce min/max of the corner indices -> the set of (8-row x 128-col)
    source blocks actually touched (data-dependent, usually 1-4 blocks
    because flow fields are smooth);
    loop (dynamic trip count) over just those blocks:
      slice the block from the VMEM-resident image planes (dynamic offsets,
      static size);
      for each of its 8 source rows (static unroll): broadcast the row,
      lane-gather at the xL/xR indices per channel, and select-accumulate
      where (row, column-block) match the corner index.

Forward accumulates  w_corner * img[corner];  the flow-gradient kernel
accumulates the analytic bilinear derivative instead (the TPU equivalent of
resample2d_kernel.cu:127-198, kernel_resample2d_backward_input2):

  d/d_dx = sum_c g_c * ((1-b)(iTR - iTL) + b(iBR - iBL))
  d/d_dy = sum_c g_c * ((1-a)(iBL - iTL) + a(iBR - iTR))

expressed per corner as coefficient pairs so both accumulate in the same
hit-select pass as the forward.

Worst-case (adversarial flow spanning the whole image) degrades to a full
block sweep but stays exact; typical flows touch 1-2 row blocks and 1-2
column blocks.  Semantics identical to ops.resample2d bilinear K=1
(reference resample2d_kernel.cu:43-63): clamped corner indices, weights not
renormalised at borders.

Layout: the NHWC image/cotangent are transposed to (B, C, H, W) planes so
the kernels work on native (8, 128) tiles with the channel loop inside
(index math shared); requires H % 8 == 0 and W % 128 == 0 (the /64 input
rule gives H; callers fall back to the XLA path otherwise).  Coordinates
are always f32; image planes may be f32 or bf16 (gathered values are
upcast after the gather, so bf16 warps need no XLA-level upcast).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH, _TW = 8, 128
# Per-batch-item VMEM residency cap for the (paired) image planes.  The
# resident operand's block is constant across the (row, col) grid dims and
# Mosaic does NOT double-buffer it (verified on v5e: the paired 9.4 MB
# 384x1024x3 f32 planes compile and run at full speed), so the cap can sit
# near the 16 MB VMEM size minus the small per-tile blocks.  12 MB keeps
# Sintel-native (9.4 MB) and KITTI-class (11.8 MB) f32 warps on-kernel.
_VMEM_RESIDENT_BUDGET = 12 * 1024 * 1024
# The resident planes can push the kernels' scoped-vmem stack past the
# 16 MB compiler default in large graphs (extra operand copies / buffering
# around the custom call); raise the per-kernel cap — Mosaic accepts it
# and the standalone wide-shape kernel measures full speed.  The raised
# limit is gated on the actual resident-plane size (round-4 advisor
# finding: it was only validated on v5e, and applying it to every call —
# including small shapes that fit the 16 MB default — risks compile
# failures on generations with less VMEM headroom).
_VMEM_GATE_BYTES = 6 * 1024 * 1024


def _vmem_params(resident_bytes: int) -> pltpu.CompilerParams:
    if resident_bytes > _VMEM_GATE_BYTES:
        return pltpu.CompilerParams(vmem_limit_bytes=28 * 1024 * 1024)
    return pltpu.CompilerParams()


def _resident_bytes(planes: jax.Array) -> int:
    """Per-batch-item bytes of the grid-constant resident plane operand."""
    return int(np.prod(planes.shape[1:])) * planes.dtype.itemsize


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def supported(img: jax.Array, kernel_size: int, bilinear: bool) -> bool:
    _, h, w, c = img.shape
    hp, wp = _round_up(h, _TH), _round_up(w, _TW)
    resident = hp * wp * 2 * c * img.dtype.itemsize  # planes + x-shifted copy
    return (bilinear and kernel_size == 1
            and img.dtype in (jnp.float32, jnp.bfloat16)
            and resident <= _VMEM_RESIDENT_BUDGET)


def _pad_edge(img: jax.Array, flow: jax.Array, g: jax.Array | None = None):
    """Pad H to a multiple of 8 and W to a multiple of 128.

    The *image* is edge-replicated: the kernels clamp corner indices to the
    padded extent, and for clamped bilinear sampling reading a replicated
    edge column/row is bit-identical to clamping at the true edge (both
    corners collapse to the same edge texel; the lerp of equal values is
    that value).  The flow / cotangent pads are zeros — those positions are
    sliced off (forward) or contribute zero (backward).  This keeps the
    benchmark-critical non-x128 widths (e.g. the 448-wide training crop,
    whose fallback XLA gather dominated the train step) on the kernel path.

    The flow may cover FEWER rows than the image (the spatially-sharded
    composition in ops/resample2d_spatial.py: each shard's local output
    rows against full-height resident planes); each is padded to its own
    8-row multiple.
    """
    _, h, w, _ = img.shape
    fh = flow.shape[1]
    ph, pw = _round_up(h, _TH) - h, _round_up(w, _TW) - w
    pf = _round_up(fh, _TH) - fh
    if ph or pw:
        img = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    if pf or pw:
        flow = jnp.pad(flow, ((0, 0), (0, pf), (0, pw), (0, 0)))
        if g is not None:
            g = jnp.pad(g, ((0, 0), (0, pf), (0, pw), (0, 0)))
    return img, flow, g


def _coords(dx, dy, r, c, height, width):
    """Shared coordinate math for one output tile.

    Only the LEFT corner column index is returned: the R-corner value is
    gathered from the x-shifted image plane at the same lane index (see
    _planes), so xR never drives the sweep.  ``lcl`` flags left-edge
    clamping (x0 < 0, where both corners collapse to column 0 and the
    shifted plane would read column 1): callers fold their R coefficients
    into L there via _fold_lr, which reproduces the clamped semantics
    exactly.  Right-edge clamping is already exact because the shifted
    plane is edge-clamped.
    """
    xs = (jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 1)
          + c * _TW).astype(jnp.float32)
    ys = (jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 0)
          + r * _TH).astype(jnp.float32)
    xf = xs + dx
    yf = ys + dy
    x0 = jnp.floor(xf)
    y0 = jnp.floor(yf)
    a = xf - x0
    b = yf - y0
    xL = jnp.clip(x0.astype(jnp.int32), 0, width - 1)
    yT = jnp.clip(y0.astype(jnp.int32), 0, height - 1)
    yB = jnp.clip(y0.astype(jnp.int32) + 1, 0, height - 1)
    lcl = (x0 < 0.0).astype(jnp.float32)
    return a, b, xL, yT, yB, lcl


def _fold_lr(wl, wr, lcl):
    """Fold an (L, R) coefficient pair for left-clamped pixels (both corners
    read column 0; the R gather would read column 1)."""
    return wl + lcl * wr, (1.0 - lcl) * wr


def _block_sweep(img_ref, channels, xL, yT, yB, coeff_fn, accum_fn, init,
                 packed_lr=False):
    """Loop over the source blocks any LEFT corner touches; ``init`` is a
    pytree of (TH, TW) f32 loop-carried accumulators.

    The image ref holds 2*channels planes: [0, C) the image, [C, 2C) its
    x-shifted (edge-clamped) copy, so both horizontal corners are gathered
    at the SAME lane index from one column block — the column sweep covers
    only the blocks containing xL (for smooth flows: half the blocks and
    half the masks of the xL/xR formulation; measured 3.2 -> ~1.9 ms per
    warp at +-8 px random flow, b8 384x512).

    Per (row-block, column-block) the local gather index / validity mask is
    computed once; per source row ``coeff_fn`` builds *channel-shared* L/R
    coefficient planes from the two corner-row hit masks, and ``accum_fn``
    does the per-channel work: two lane gathers + two multiply-adds.

    No data-dependent row/block skipping beyond the corner bounding box:
    measured on v5e, per-row scalar guards (pl.when) and per-block lax.cond
    both LOSE — branch overhead exceeds the skipped gathers even at small
    flow magnitudes (3.3 -> 10 ms at +-8 px random flow for the pl.when
    variant; the r3 perf log has the lax.cond numbers).
    """
    rb_lo = jnp.min(yT) // _TH
    rb_hi = jnp.max(yB) // _TH
    cb_lo = jnp.min(xL) // _TW
    cb_hi = jnp.max(xL) // _TW

    def rb_body(rb, acc):
        def cb_body(cb, acc):
            xLl = jnp.clip(xL - cb * _TW, 0, _TW - 1)
            okL = (xL >= cb * _TW) & (xL < (cb + 1) * _TW)
            if packed_lr:
                # one f32 plane per channel, lanes = packed (L, R) bf16 pair
                tiles = [img_ref[0, ch, pl.ds(rb * _TH, _TH),
                                 pl.ds(cb * _TW, _TW)]
                         for ch in range(channels)]
            else:
                tiles = [(img_ref[0, ch, pl.ds(rb * _TH, _TH),
                                  pl.ds(cb * _TW, _TW)],
                          img_ref[0, channels + ch, pl.ds(rb * _TH, _TH),
                                  pl.ds(cb * _TW, _TW)])
                         for ch in range(channels)]
            for s in range(_TH):  # static unroll
                srow = rb * _TH + s
                fT = ((yT == srow) & okL).astype(jnp.float32)
                fB = ((yB == srow) & okL).astype(jnp.float32)
                coeffs = coeff_fn(fT, fB)
                for ch in range(channels):  # static unroll
                    if packed_lr:
                        row = jnp.broadcast_to(tiles[ch][s:s + 1],
                                               (_TH, _TW))
                        g2 = pltpu.bitcast(
                            jnp.take_along_axis(row, xLl, axis=1),
                            jnp.uint32)
                        gL = pltpu.bitcast(g2 & jnp.uint32(0xFFFF0000),
                                           jnp.float32)
                        gR = pltpu.bitcast(g2 << 16, jnp.float32)
                    else:
                        tl, tr = tiles[ch]
                        rowL = jnp.broadcast_to(
                            tl[s:s + 1], (_TH, _TW)).astype(jnp.float32)
                        rowR = jnp.broadcast_to(
                            tr[s:s + 1], (_TH, _TW)).astype(jnp.float32)
                        gL = jnp.take_along_axis(rowL, xLl, axis=1)
                        gR = jnp.take_along_axis(rowR, xLl, axis=1)
                    acc = accum_fn(acc, ch, gL, gR, coeffs)
            return acc

        return jax.lax.fori_loop(cb_lo, cb_hi + 1, cb_body, acc)

    return jax.lax.fori_loop(rb_lo, rb_hi + 1, rb_body, init)


def _fwd_kernel(dx_ref, dy_ref, img_ref, out_ref, *, height, width,
                channels, packed_lr=False):
    r = pl.program_id(1)
    c = pl.program_id(2)
    a, b, xL, yT, yB, lcl = _coords(dx_ref[0], dy_ref[0], r, c, height, width)
    wTL, wTR = _fold_lr((1 - a) * (1 - b), a * (1 - b), lcl)
    wBL, wBR = _fold_lr((1 - a) * b, a * b, lcl)

    def coeffs(fT, fB):
        # channel-shared L/R gather coefficients for this source row
        return wTL * fT + wBL * fB, wTR * fT + wBR * fB

    def accum(acc, ch, gL, gR, c2):
        aL, aR = c2
        return acc[:ch] + [acc[ch] + (gL * aL + gR * aR)] + acc[ch + 1:]

    init = [jnp.zeros((_TH, _TW), jnp.float32) for _ in range(channels)]
    acc = _block_sweep(img_ref, channels, xL, yT, yB, coeffs, accum, init,
                       packed_lr=packed_lr)
    for ch in range(channels):
        out_ref[0, ch] = acc[ch].astype(out_ref.dtype)


def _fwd_tangents_kernel(dx_ref, dy_ref, img_ref, out_ref, d1_ref, d2_ref,
                         *, height, width, channels, packed_lr=False):
    """Forward warp + the analytic flow tangents, one sweep.

    d1[c] = dout_c/d(dx) = (1-b)(iTR-iTL) + b(iBR-iBL)
    d2[c] = dout_c/d(dy) = (1-a)(iBL-iTL) + a(iBR-iTR)

    Saving (d1, d2) as VJP residuals makes the training backward a pure
    elementwise contraction  d_flow = (sum_c g_c*d1_c, sum_c g_c*d2_c) —
    no second gather sweep.  The sweep costs ~6 extra multiply-adds per
    (source-row, channel) over the plain forward; the dedicated backward
    kernel it replaces re-ran the whole sweep (~equal to a full forward,
    4-9 ms per warp at b8 with real flows)."""
    r = pl.program_id(1)
    c = pl.program_id(2)
    a, b, xL, yT, yB, lcl = _coords(dx_ref[0], dy_ref[0], r, c, height, width)
    wTL, wTR = _fold_lr((1 - a) * (1 - b), a * (1 - b), lcl)
    wBL, wBR = _fold_lr((1 - a) * b, a * b, lcl)
    cxTL, cxTR = _fold_lr(-(1 - b), (1 - b), lcl)
    cxBL, cxBR = _fold_lr(-b, b, lcl)
    cyTL, cyTR = _fold_lr(-(1 - a), -a, lcl)
    cyBL, cyBR = _fold_lr(1 - a, a, lcl)

    def coeffs(fT, fB):
        return (wTL * fT + wBL * fB, wTR * fT + wBR * fB,
                cxTL * fT + cxBL * fB, cxTR * fT + cxBR * fB,
                cyTL * fT + cyBL * fB, cyTR * fT + cyBR * fB)

    def accum(acc, ch, gL, gR, c6):
        aL, aR, c1L, c1R, c2L, c2R = c6
        out_a, d1_a, d2_a = acc
        return (out_a[:ch] + [out_a[ch] + (gL * aL + gR * aR)]
                + out_a[ch + 1:],
                d1_a[:ch] + [d1_a[ch] + (gL * c1L + gR * c1R)]
                + d1_a[ch + 1:],
                d2_a[:ch] + [d2_a[ch] + (gL * c2L + gR * c2R)]
                + d2_a[ch + 1:])

    zeros = lambda: [jnp.zeros((_TH, _TW), jnp.float32)
                     for _ in range(channels)]
    init = (zeros(), zeros(), zeros())
    out_a, d1_a, d2_a = _block_sweep(img_ref, channels, xL, yT, yB,
                                     coeffs, accum, init,
                                     packed_lr=packed_lr)
    for ch in range(channels):
        out_ref[0, ch] = out_a[ch].astype(out_ref.dtype)
        d1_ref[0, ch] = d1_a[ch]
        d2_ref[0, ch] = d2_a[ch]


def _grad_flow_kernel(dx_ref, dy_ref, img_ref, g_ref, ddx_ref, ddy_ref,
                      *, height, width, channels, packed_lr=False):
    r = pl.program_id(1)
    c = pl.program_id(2)
    a, b, xL, yT, yB, lcl = _coords(dx_ref[0], dy_ref[0], r, c, height, width)
    # Per-corner (d/d_dx, d/d_dy) coefficients of the bilinear weight
    # (resample2d_kernel.cu:127-198 analytic derivative).
    cxTL, cxTR = _fold_lr(-(1 - b), (1 - b), lcl)
    cxBL, cxBR = _fold_lr(-b, b, lcl)
    cyTL, cyTR = _fold_lr(-(1 - a), -a, lcl)
    cyBL, cyBR = _fold_lr(1 - a, a, lcl)

    gch = [g_ref[0, ch].astype(jnp.float32) for ch in range(channels)]

    def coeffs(fT, fB):
        return (cxTL * fT + cxBL * fB, cxTR * fT + cxBR * fB,
                cyTL * fT + cyBL * fB, cyTR * fT + cyBR * fB)

    def accum(acc, ch, gL, gR, c4):
        c1L, c1R, c2L, c2R = c4
        acc_dx, acc_dy = acc
        return (acc_dx + gch[ch] * (gL * c1L + gR * c1R),
                acc_dy + gch[ch] * (gL * c2L + gR * c2R))

    init = (jnp.zeros((_TH, _TW), jnp.float32),
            jnp.zeros((_TH, _TW), jnp.float32))
    acc_dx, acc_dy = _block_sweep(img_ref, channels, xL, yT, yB, coeffs,
                                  accum, init, packed_lr=packed_lr)
    ddx_ref[0] = acc_dx
    ddy_ref[0] = acc_dy


def _planes(x):
    """(B, H, W, C) -> (B, C, H, W)."""
    return jnp.transpose(x, (0, 3, 1, 2))


def _planes_pair(x):
    """(B, H, W, C) -> (B, 2C, H, W): channel planes followed by their
    x-shifted (edge-clamped) copies, so the kernels gather both horizontal
    corners at the same lane index (R-corner value = shifted plane at xL).
    One fused XLA pass; shared by all warps of the same image under jit."""
    p = jnp.transpose(x, (0, 3, 1, 2))
    shifted = jnp.concatenate([p[..., 1:], p[..., -1:]], axis=-1)
    return jnp.concatenate([p, shifted], axis=1)


def _planes_pair_packed_bf16(x):
    """bf16 (B, H, W, C) -> f32-typed (B, C, H, W) planes whose lanes pack
    the (L, R) corner pair as two bf16s: bits = (bf16(x[.., j]) << 16) |
    bf16(x[.., j+1 clamped]).  ONE lane gather then recovers both corners
    with a mask and a shift (a bf16's f32 image is its bits << 16), halving
    the kernels' gather count — exactly the values the unpacked bf16 path
    gathers, so bf16-mode numerics are unchanged."""
    p = jnp.transpose(x, (0, 3, 1, 2))
    shifted = jnp.concatenate([p[..., 1:], p[..., -1:]], axis=-1)
    hi = jax.lax.bitcast_convert_type(p, jnp.uint16).astype(jnp.uint32) << 16
    lo = jax.lax.bitcast_convert_type(shifted, jnp.uint16).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(hi | lo, jnp.float32)


@jax.jit
def resample2d_bilinear_pallas(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Forward bilinear warp; img (B, H, W, C) f32/bf16, flow (B, Ho, W, 2).

    Ho (the output row count) may be smaller than H: the flow's dy is then
    interpreted against source rows [0, H) while output rows index [0, Ho)
    — the spatially-sharded composition's local view
    (ops/resample2d_spatial.py).  Ho == H is the plain full-image warp."""
    true_h, true_w = flow.shape[1], img.shape[2]
    img, flow, _ = _pad_edge(img, flow)
    batch, height, width, channels = img.shape
    out_h = flow.shape[1]
    packed_lr = img.dtype == jnp.bfloat16
    planes = (_planes_pair_packed_bf16(img) if packed_lr
              else _planes_pair(img))
    nplanes = channels if packed_lr else 2 * channels
    dx = flow[..., 0].astype(jnp.float32)
    dy = flow[..., 1].astype(jnp.float32)

    grid = (batch, out_h // _TH, width // _TW)
    kernel = functools.partial(_fwd_kernel, height=height, width=width,
                               channels=channels, packed_lr=packed_lr)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TH, _TW), lambda b, r, c: (b, r, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TH, _TW), lambda b, r, c: (b, r, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nplanes, height, width),
                         lambda b, r, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, channels, _TH, _TW),
                               lambda b, r, c: (b, 0, r, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, channels, out_h, width),
                                       img.dtype),
        compiler_params=_vmem_params(_resident_bytes(planes)),
    )(dx, dy, planes)
    return jnp.transpose(out, (0, 2, 3, 1))[:, :true_h, :true_w]


@jax.jit
def resample2d_bilinear_tangents_pallas(img: jax.Array, flow: jax.Array):
    """Forward warp + analytic flow tangents (training-path forward).

    Returns (out (B,H,W,C) in img dtype, d1, d2 both (B,H,W,C) f32) with
    d1/d2 = d out/d dx|dy — see _fwd_tangents_kernel.

    As in resample2d_bilinear_pallas, the flow may cover fewer rows than
    the image (spatially-sharded local view).
    """
    true_h, true_w = flow.shape[1], img.shape[2]
    img, flow, _ = _pad_edge(img, flow)
    batch, height, width, channels = img.shape
    out_h = flow.shape[1]
    packed_lr = img.dtype == jnp.bfloat16
    planes = (_planes_pair_packed_bf16(img) if packed_lr
              else _planes_pair(img))
    nplanes = channels if packed_lr else 2 * channels
    dx = flow[..., 0].astype(jnp.float32)
    dy = flow[..., 1].astype(jnp.float32)

    grid = (batch, out_h // _TH, width // _TW)
    kernel = functools.partial(_fwd_tangents_kernel, height=height,
                               width=width, channels=channels,
                               packed_lr=packed_lr)
    pspec = lambda: pl.BlockSpec((1, channels, _TH, _TW),
                                 lambda b, r, c: (b, 0, r, c),
                                 memory_space=pltpu.VMEM)
    out, d1, d2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TH, _TW), lambda b, r, c: (b, r, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TH, _TW), lambda b, r, c: (b, r, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nplanes, height, width),
                         lambda b, r, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pspec(), pspec(), pspec()),
        out_shape=(
            jax.ShapeDtypeStruct((batch, channels, out_h, width), img.dtype),
            jax.ShapeDtypeStruct((batch, channels, out_h, width),
                                 jnp.float32),
            jax.ShapeDtypeStruct((batch, channels, out_h, width),
                                 jnp.float32),
        ),
        compiler_params=_vmem_params(_resident_bytes(planes)),
    )(dx, dy, planes)
    unp = lambda x: jnp.transpose(x, (0, 2, 3, 1))[:, :true_h, :true_w]
    return unp(out), unp(d1), unp(d2)


@jax.jit
def resample2d_bilinear_tangents_cm(img: jax.Array, flow: jax.Array):
    """Channel-major variant of the tangent-saving forward for the fused
    stage glue (ops/stage_glue.py): returns

      (out (B, H, W, C) in img dtype,
       out_cm, d1_cm, d2_cm: (B, C, Hp, Wp) — the kernel's NATIVE plane
       outputs, f32 tangents, H/W padded to tile multiples)

    so the glue's backward can contract cotangents against the tangents in
    channel-major form without any of the NHWC unpack transposes the plain
    wrapper pays (out_cm doubles as the warp result for recomputing diff
    in cm form)."""
    true_h, true_w = img.shape[1:3]
    imgp, flowp, _ = _pad_edge(img, flow)
    batch, height, width, channels = imgp.shape
    packed_lr = imgp.dtype == jnp.bfloat16
    planes = (_planes_pair_packed_bf16(imgp) if packed_lr
              else _planes_pair(imgp))
    nplanes = channels if packed_lr else 2 * channels
    dx = flowp[..., 0].astype(jnp.float32)
    dy = flowp[..., 1].astype(jnp.float32)

    grid = (batch, height // _TH, width // _TW)
    kernel = functools.partial(_fwd_tangents_kernel, height=height,
                               width=width, channels=channels,
                               packed_lr=packed_lr)
    pspec = lambda: pl.BlockSpec((1, channels, _TH, _TW),
                                 lambda b, r, c: (b, 0, r, c),
                                 memory_space=pltpu.VMEM)
    out, d1, d2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TH, _TW), lambda b, r, c: (b, r, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TH, _TW), lambda b, r, c: (b, r, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nplanes, height, width),
                         lambda b, r, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pspec(), pspec(), pspec()),
        out_shape=(
            jax.ShapeDtypeStruct((batch, channels, height, width),
                                 imgp.dtype),
            jax.ShapeDtypeStruct((batch, channels, height, width),
                                 jnp.float32),
            jax.ShapeDtypeStruct((batch, channels, height, width),
                                 jnp.float32),
        ),
        compiler_params=_vmem_params(_resident_bytes(planes)),
    )(dx, dy, planes)
    out_nhwc = jnp.transpose(out, (0, 2, 3, 1))[:, :true_h, :true_w]
    return out_nhwc, out, d1, d2


@jax.jit
def resample2d_grad_flow_pallas(g: jax.Array, img: jax.Array,
                                flow: jax.Array) -> jax.Array:
    """Flow gradient of the bilinear warp.

    g: (B, Ho, W, C) cotangent of the warp output; img, flow as forward
    (the flow/cotangent may cover fewer rows than the image — the
    spatially-sharded local view).  Returns (B, Ho, W, 2) f32.
    """
    true_h, true_w = flow.shape[1], img.shape[2]
    img, flow, g = _pad_edge(img, flow, g)
    batch, height, width, channels = img.shape
    out_h = flow.shape[1]
    packed_lr = img.dtype == jnp.bfloat16
    planes = (_planes_pair_packed_bf16(img) if packed_lr
              else _planes_pair(img))
    nplanes = channels if packed_lr else 2 * channels
    gplanes = _planes(g)
    dx = flow[..., 0].astype(jnp.float32)
    dy = flow[..., 1].astype(jnp.float32)

    grid = (batch, out_h // _TH, width // _TW)
    kernel = functools.partial(_grad_flow_kernel, height=height, width=width,
                               channels=channels, packed_lr=packed_lr)
    ddx, ddy = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TH, _TW), lambda b, r, c: (b, r, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TH, _TW), lambda b, r, c: (b, r, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nplanes, height, width),
                         lambda b, r, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, channels, _TH, _TW),
                         lambda b, r, c: (b, 0, r, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, _TH, _TW), lambda b, r, c: (b, r, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TH, _TW), lambda b, r, c: (b, r, c),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, out_h, width), jnp.float32),
            jax.ShapeDtypeStruct((batch, out_h, width), jnp.float32),
        ),
        compiler_params=_vmem_params(_resident_bytes(planes)),
    )(dx, dy, planes, gplanes)
    return jnp.stack([ddx, ddy], axis=-1)[:, :true_h, :true_w]


# ---------------------------------------------------------------------------
# Multi-flow variants: F flows warp the SAME image (the FlowNetFusion input
# block warps x2 by sd_flow AND s2_flow, models.py:155-179).  The flow pair
# is folded into the grid's leading dim as (B*F, rows, cols) with the
# resident plane operand indexed i // F: Mosaic re-fetches a block only
# when its index-map result changes, so the (large) planes are DMA'd and
# laid out ONCE per batch item instead of once per warp — halving the
# dominant DMA/layout traffic of the fusion glue (VERDICT r4 next #6).
# ---------------------------------------------------------------------------

def _multi_prep(img, flows):
    """Shared padding/layout for the multi-flow wrappers.

    img (B, H, W, C); flows (B, F, H, W, 2).  Returns
    (planes, dx, dy, dims) with dx/dy folded to (B*F, Hp, Wp).
    """
    batch, nflows = flows.shape[0], flows.shape[1]
    true_h, true_w = flows.shape[2], img.shape[2]
    flows_f = flows.reshape((batch * nflows,) + flows.shape[2:])
    imgp, flowsp, _ = _pad_edge(img, flows_f)
    height, width, channels = imgp.shape[1:4]
    out_h = flowsp.shape[1]
    packed_lr = imgp.dtype == jnp.bfloat16
    planes = (_planes_pair_packed_bf16(imgp) if packed_lr
              else _planes_pair(imgp))
    nplanes = channels if packed_lr else 2 * channels
    dx = flowsp[..., 0].astype(jnp.float32)
    dy = flowsp[..., 1].astype(jnp.float32)
    dims = dict(batch=batch, nflows=nflows, height=height, width=width,
                channels=channels, out_h=out_h, nplanes=nplanes,
                packed_lr=packed_lr, true_h=true_h, true_w=true_w)
    return planes, dx, dy, dims


def _multi_specs(d):
    """(grid, flow_spec, planes_spec, out_spec) for the folded grid."""
    nf = d["nflows"]
    grid = (d["batch"] * nf, d["out_h"] // _TH, d["width"] // _TW)
    flow_spec = pl.BlockSpec((1, _TH, _TW), lambda i, r, c: (i, r, c),
                             memory_space=pltpu.VMEM)
    planes_spec = pl.BlockSpec(
        (1, d["nplanes"], d["height"], d["width"]),
        lambda i, r, c: (i // nf, 0, 0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, d["channels"], _TH, _TW),
                            lambda i, r, c: (i, 0, r, c),
                            memory_space=pltpu.VMEM)
    return grid, flow_spec, planes_spec, out_spec


@jax.jit
def resample2d_bilinear_pallas_multi(img: jax.Array,
                                     flows: jax.Array) -> jax.Array:
    """F forward warps of one image: img (B, H, W, C), flows (B, F, H, W, 2)
    -> (B, F, H, W, C).  Planes resident once per batch item."""
    planes, dx, dy, d = _multi_prep(img, flows)
    grid, fspec, pspec, ospec = _multi_specs(d)
    kernel = functools.partial(_fwd_kernel, height=d["height"],
                               width=d["width"], channels=d["channels"],
                               packed_lr=d["packed_lr"])
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[fspec, fspec, pspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct(
            (d["batch"] * d["nflows"], d["channels"], d["out_h"],
             d["width"]), img.dtype),
        compiler_params=_vmem_params(_resident_bytes(planes)),
    )(dx, dy, planes)
    out = jnp.transpose(out, (0, 2, 3, 1))[:, :d["true_h"], :d["true_w"]]
    return out.reshape((d["batch"], d["nflows"]) + out.shape[1:])


@jax.jit
def resample2d_bilinear_tangents_cm_multi(img: jax.Array, flows: jax.Array):
    """F tangent-saving warps of one image, channel-major outputs for the
    fused fusion glue (ops/stage_glue.py):

      img (B, H, W, C), flows (B, F, H, W, 2) ->
      (out_nhwc (B, F, H, W, C),
       out_cm (B, F, C, Hp, Wp) in img dtype,
       d1_cm, d2_cm (B, F, C, Hp, Wp) f32)
    """
    planes, dx, dy, d = _multi_prep(img, flows)
    grid, fspec, pspec, ospec = _multi_specs(d)
    kernel = functools.partial(_fwd_tangents_kernel, height=d["height"],
                               width=d["width"], channels=d["channels"],
                               packed_lr=d["packed_lr"])
    bf = d["batch"] * d["nflows"]
    shape = (bf, d["channels"], d["out_h"], d["width"])
    out, d1, d2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[fspec, fspec, pspec],
        out_specs=(ospec, ospec, ospec),
        out_shape=(
            jax.ShapeDtypeStruct(shape, img.dtype),
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct(shape, jnp.float32),
        ),
        compiler_params=_vmem_params(_resident_bytes(planes)),
    )(dx, dy, planes)
    unfold = lambda x: x.reshape((d["batch"], d["nflows"]) + x.shape[1:])
    out_nhwc = jnp.transpose(out, (0, 2, 3, 1))[:, :d["true_h"], :d["true_w"]]
    out_nhwc = out_nhwc.reshape(
        (d["batch"], d["nflows"]) + out_nhwc.shape[1:])
    return out_nhwc, unfold(out), unfold(d1), unfold(d2)
