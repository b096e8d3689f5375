"""Exact 2x2 space-to-depth rewrites of the full-resolution conv layers.

Why: FlowNet2's finest decode levels (FlowNetFusion's L0, FlowNetSD's
conv0/conv1) run 3x3 convs with 2..64 output channels at full resolution —
the 128-lane MXU output dimension is mostly idle and these layers measured
0.3-15 TF/s on v5e (the slowest ops in the inference graph after the
warps).  Packing 2x2 pixels into channels makes every such conv a 2-tap
conv over 4x the channels — full lane width — at 16/9 the FLOPs, a large
net win.

Round 3 tried per-layer packing and LOST: each layer paid a pack and an
unpack HBM transpose.  The fix here is packing the whole resolution level
once, which requires keeping intermediate results packed.  Two packed
representations of a full-res tensor F (B, H, W, C), with h = H/2,
w = W/2 and phase channels ordered (ph, pw, c):

  aligned    A (B, h,   w,   4C):  A[i, j, (a, b, c)] = F[2i+a, 2j+b, c]
  staggered  S (B, h+1, w+1, 4C):  S[i, j, (p, q, c)] = F[2i-p, 2j-q, c]

``aligned`` is what a plain space-to-depth produces; ``staggered`` is what
a phase-decomposed 4x4/s2 deconv produces natively (phase (p, q) of output
pixel (2u+p, 2v+q) lands at conv-grid position (u+p, v+q)).  Entries of S
that fall outside F (row 0 of the p=1 groups, row h of the p=0 groups, and
likewise for columns) are masked to zero so consumers read exactly the
zero padding a SAME conv would.

The key identity: a 3x3/s1 SAME conv maps aligned -> staggered and
staggered -> aligned with a 2x2 conv window (each full-res tap (dy, dx)
lands on exactly one (phase, window-offset) slot by parity), and a
stride-2 conv maps staggered -> unpacked with a 2x2 window; a 7x7/s2 conv
maps aligned -> unpacked with a 4x4 window.  Alternating the two packed
reps through a subnet therefore needs NO intermediate relayouts at all:
one space_to_depth at the subnet entry, one (cheap, 2-channel) staggered
unpack at the exit.  All rewrites are exact up to float reassociation.

Used by models/flownet_sd.py (FlowNetFusion, FlowNetSD); see
/root/reference/networks/FlowNetFusion.py and FlowNetSD.py for the layer
stacks being rewritten.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> aligned (B, H/2, W/2, 4C), phases (a, b, c)."""
    batch, height, width, c = x.shape
    h, w = height // 2, width // 2
    return x.reshape(batch, h, 2, w, 2, c).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(batch, h, w, 4 * c)


def staggered_to_full(s: jax.Array, channels: int) -> jax.Array:
    """staggered (B, h+1, w+1, 4C) -> (B, 2h, 2w, C).

    F[2i-p, 2j-q] = S[i, j, (p, q)]: even output rows come from the p=0
    groups at rows [0, h), odd rows 2i-1 from p=1 at rows [1, h]; same for
    columns.
    """
    batch, hp1, wp1, _ = s.shape
    h, w = hp1 - 1, wp1 - 1
    c = channels
    g = [[s[..., (2 * p + q) * c:(2 * p + q + 1) * c] for q in (0, 1)]
         for p in (0, 1)]
    rows = [[g[0][q][:, 0:h], g[1][q][:, 1:h + 1]] for q in (0, 1)]
    # interleave rows: (B, h, 2, w+1, C) -> (B, 2h, w+1, C)
    cols = [jnp.stack(rows[q], axis=2).reshape(batch, 2 * h, wp1, c)
            for q in (0, 1)]
    evens = cols[0][:, :, 0:w]
    odds = cols[1][:, :, 1:w + 1]
    return jnp.stack([evens, odds], axis=3).reshape(batch, 2 * h, 2 * w, c)


def staggered_mask(s: jax.Array, channels: int) -> jax.Array:
    """Zero the out-of-image entries of a staggered tensor (row 0 of p=1
    groups, row h of p=0 groups; columns likewise) so consumers read the
    zeros a SAME conv's padding provides."""
    batch, hp1, wp1, _ = s.shape
    del batch
    c = channels
    rows = jnp.arange(hp1)[:, None, None]
    cols = jnp.arange(wp1)[None, :, None]
    ph = (jnp.arange(4 * c)[None, None, :] // (2 * c)) % 2  # p per channel
    pw = (jnp.arange(4 * c)[None, None, :] // c) % 2        # q per channel
    ok_r = jnp.where(ph == 1, rows > 0, rows < hp1 - 1)
    ok_c = jnp.where(pw == 1, cols > 0, cols < wp1 - 1)
    return s * (ok_r & ok_c).astype(s.dtype)


def _phase_entries_s1():
    """(phase, dy) -> (window offset w, input phase a) maps for the two
    3x3/s1 packed directions; see module docstring for the derivations."""
    a2s = {}  # aligned -> staggered: key (p, dy) -> (w, a)
    for p in (0, 1):
        for dy in (-1, 0, 1):
            a = (dy - p) % 2
            delta = (dy - p - a) // 2  # in {-1, 0}
            a2s[(p, dy)] = (delta + 1, a)
    s2a = {}  # staggered -> aligned: key (a, dy) -> (w, p)
    for a in (0, 1):
        for dy in (-1, 0, 1):
            p = (a + dy) % 2
            delta = (a + dy + p) // 2  # in {0, 1}
            s2a[(a, dy)] = (delta, p)
    return a2s, s2a


_A2S, _S2A = _phase_entries_s1()


def _pack_kernel_a2s(kernel: jax.Array) -> jax.Array:
    """(3, 3, Ci, Co) -> (2, 2, 4Ci, 4Co) for aligned -> staggered s1."""
    ci, co = kernel.shape[2], kernel.shape[3]
    k2 = jnp.zeros((2, 2, 2, 2, ci, 2, 2, co), kernel.dtype)  # wy a wx b ci p q co
    for p in (0, 1):
        for dy in (-1, 0, 1):
            wy, a = _A2S[(p, dy)]
            for q in (0, 1):
                for dx in (-1, 0, 1):
                    wx, b = _A2S[(q, dx)]
                    k2 = k2.at[wy, a, wx, b, :, p, q, :].set(
                        kernel[1 + dy, 1 + dx])
    return k2.transpose(0, 2, 1, 3, 4, 5, 6, 7).reshape(2, 2, 4 * ci, 4 * co)


def _pack_kernel_s2a(kernel: jax.Array) -> jax.Array:
    """(3, 3, Ci, Co) -> (2, 2, 4Ci, 4Co) for staggered -> aligned s1."""
    ci, co = kernel.shape[2], kernel.shape[3]
    k2 = jnp.zeros((2, 2, 2, 2, ci, 2, 2, co), kernel.dtype)  # wy p wx q ci a b co
    for a in (0, 1):
        for dy in (-1, 0, 1):
            wy, p = _S2A[(a, dy)]
            for b in (0, 1):
                for dx in (-1, 0, 1):
                    wx, q = _S2A[(b, dx)]
                    k2 = k2.at[wy, p, wx, q, :, a, b, :].set(
                        kernel[1 + dy, 1 + dx])
    return k2.transpose(0, 2, 1, 3, 4, 5, 6, 7).reshape(2, 2, 4 * ci, 4 * co)


def _pack_kernel_s2_from_stag(kernel: jax.Array) -> jax.Array:
    """(3, 3, Ci, Co) -> (2, 2, 4Ci, Co): 3x3/s2 conv reading a staggered
    input, producing the unpacked half-res output."""
    ci, co = kernel.shape[2], kernel.shape[3]
    k2 = jnp.zeros((2, 2, 2, 2, ci, co), kernel.dtype)  # wy p wx q ci co
    for dy in (-1, 0, 1):
        p = dy % 2
        wy = (dy + p) // 2  # in {0, 1}
        for dx in (-1, 0, 1):
            q = dx % 2
            wx = (dx + q) // 2
            k2 = k2.at[wy, p, wx, q].set(kernel[1 + dy, 1 + dx])
    return k2.transpose(0, 2, 1, 3, 4, 5).reshape(2, 2, 4 * ci, co)


def _pack_kernel_s2_from_aligned(kernel: jax.Array) -> jax.Array:
    """(K, K, Ci, Co) odd-K stride-2 SAME conv reading an aligned input ->
    ((K+1)/2 + 1 window, 4Ci, Co).  For K=7: window 4, pad (2, 1)."""
    k = kernel.shape[0]
    ci, co = kernel.shape[2], kernel.shape[3]
    r = (k - 1) // 2
    # delta = (dy - a) / 2 for dy in [-r, r]; window offsets cover
    # [-(r+1)//2 - ...]: compute the exact range
    deltas = sorted({(dy - ((dy % 2))) // 2 for dy in range(-r, r + 1)})
    lo, hi = deltas[0], deltas[-1]
    win = hi - lo + 1
    k2 = jnp.zeros((win, 2, win, 2, ci, co), kernel.dtype)  # wy a wx b ci co
    for dy in range(-r, r + 1):
        a = dy % 2
        wy = (dy - a) // 2 - lo
        for dx in range(-r, r + 1):
            b = dx % 2
            wx = (dx - b) // 2 - lo
            k2 = k2.at[wy, a, wx, b].set(kernel[r + dy, r + dx])
    return k2.reshape(win, 2, win, 2, ci, co) \
        .transpose(0, 2, 1, 3, 4, 5).reshape(win, win, 4 * ci, co), (-lo, hi)


def _input_perm(splits) -> np.ndarray:
    """Packed-kernel input-row permutation for a packed CONCAT input.

    A packed concat of parts with full-res channel counts ``splits`` lays
    channels out as [part0 (p,q,c0), part1 (p,q,c1), ...], while the packed
    kernels index inputs as (p, q, ci_total).  Returns idx such that
    k2[:, :, idx, :] matches the concat layout: idx[i_data] = i_standard.
    """
    ci_total = sum(splits)
    idx = []
    off = 0
    for c in splits:
        for p in (0, 1):
            for q in (0, 1):
                base = (2 * p + q) * ci_total + off
                idx.extend(range(base, base + c))
        off += c
    return np.asarray(idx)


def _apply_splits(k2: jax.Array, in_splits) -> jax.Array:
    if in_splits is None or len(in_splits) <= 1:
        return k2
    return k2[:, :, _input_perm(in_splits), :]


def conv_a2s(x: jax.Array, kernel: jax.Array, in_splits=None) -> jax.Array:
    """3x3/s1 SAME conv, aligned input (B,h,w,4Ci) -> staggered output
    (B,h+1,w+1,4Co).  Output is NOT masked (callers mask after bias and
    activation via staggered_mask)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jax.lax.conv_general_dilated(
        xp, _apply_splits(_pack_kernel_a2s(kernel), in_splits), (1, 1),
        "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_s2a(s: jax.Array, kernel: jax.Array, in_splits=None) -> jax.Array:
    """3x3/s1 SAME conv, staggered input (B,h+1,w+1,4Ci) -> aligned output
    (B,h,w,4Co).  The staggered input must already be masked."""
    return jax.lax.conv_general_dilated(
        s, _apply_splits(_pack_kernel_s2a(kernel), in_splits), (1, 1),
        "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_s2_from_stag(s: jax.Array, kernel: jax.Array,
                      in_splits=None) -> jax.Array:
    """3x3/s2 SAME conv, staggered input (B,h+1,w+1,4Ci) -> unpacked
    half-res output (B,h,w,Co)."""
    return jax.lax.conv_general_dilated(
        s, _apply_splits(_pack_kernel_s2_from_stag(kernel), in_splits),
        (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_s2_from_aligned(x: jax.Array, kernel: jax.Array,
                         in_splits=None) -> jax.Array:
    """Odd-K (e.g. 7x7 or 5x5) stride-2 SAME conv, aligned input
    (B,h,w,4Ci) -> unpacked half-res output (B,h,w,Co)."""
    k2, (pad_lo, pad_hi) = _pack_kernel_s2_from_aligned(kernel)
    xp = jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (pad_lo, pad_hi), (0, 0)))
    return jax.lax.conv_general_dilated(
        xp, _apply_splits(k2, in_splits), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _pack_kernel_a2f(kernel: jax.Array) -> jax.Array:
    """(3, 3, Ci, Co) -> (4, 4, 4Ci, Co): 3x3/s1 SAME conv reading an
    aligned input and emitting the UNPACKED full-res output in one
    input-dilated conv (lhs_dilation=2, padding (2, 2)) — the composition
    of the conv with the depth-to-space unpack, in the conv-transpose form
    XLA lowers well.  Tap (dy, phase a) lands at dilated window offset
    wy = dy - a + 2; only offsets matching the output row's parity hit
    real (non-dilation-zero) input positions."""
    ci, co = kernel.shape[2], kernel.shape[3]
    k2 = jnp.zeros((4, 2, 4, 2, ci, co), kernel.dtype)  # wy a wx b ci co
    for a in (0, 1):
        for dy in (-1, 0, 1):
            wy = dy - a + 2
            for b in (0, 1):
                for dx in (-1, 0, 1):
                    wx = dx - b + 2
                    k2 = k2.at[wy, a, wx, b].set(kernel[1 + dy, 1 + dx])
    return k2.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * ci, co)


def conv_a2f(x: jax.Array, kernel: jax.Array, in_splits=None) -> jax.Array:
    """3x3/s1 SAME conv, aligned input (B,h,w,4Ci) -> full-res unpacked
    output (B,2h,2w,Co)."""
    return jax.lax.conv_general_dilated(
        x, _apply_splits(_pack_kernel_a2f(kernel), in_splits), (1, 1),
        [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def tconv_to_staggered(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """ConvTranspose2d(4, 2, 1) (flipped-kernel storage, see nn.layers)
    from unpacked half-res input -> staggered full-res output
    (B,h+1,w+1,4Co); phase (p, q) of output pixel (2u+p, 2v+q) lands at
    conv-grid position (u+p, v+q), which IS the staggered layout.  Output
    not masked."""
    cin, cout = kernel.shape[2], kernel.shape[3]
    k2 = kernel.reshape(2, 2, 2, 2, cin, cout)
    k2 = k2.transpose(0, 2, 4, 1, 3, 5).reshape(2, 2, cin, 4 * cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return jax.lax.conv_general_dilated(
        xp, k2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def bias_phase(bias: jax.Array) -> jax.Array:
    """Broadcast a (Co,) bias over the 4 phase groups -> (4Co,)."""
    return jnp.tile(bias, 4)
