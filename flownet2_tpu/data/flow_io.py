"""Middlebury ``.flo`` I/O and flow visualisation.

TPU-framework port of /root/reference/utils/flow_utils.py: the .flo wire
format (magic 202021.25, little-endian W, H int32 then H*W*2 float32,
flow_utils.py:5,7-57) and the HSV color-wheel rendering
(flow_utils.py:72-204).
"""

from __future__ import annotations

import os
import pathlib
from typing import Optional

import numpy as np

TAG_FLOAT = 202021.25


def read_flo(path: str | pathlib.Path) -> np.ndarray:
    """Read a Middlebury .flo file -> (H, W, 2) float32 (dx, dy)."""
    from .. import native
    if native.available():
        return native.read_flo(path)
    with open(path, "rb") as f:
        magic = np.frombuffer(f.read(4), np.float32)[0]
        if magic != np.float32(TAG_FLOAT):
            raise ValueError(f"{path}: bad .flo magic {magic!r}")
        w = int(np.frombuffer(f.read(4), np.int32)[0])
        h = int(np.frombuffer(f.read(4), np.int32)[0])
        data = np.frombuffer(f.read(h * w * 2 * 4), np.float32)
        if data.size != h * w * 2:
            raise ValueError(f"{path}: truncated .flo ({data.size} floats "
                             f"for {h}x{w})")
        return data.reshape(h, w, 2).copy()


def write_flo(path: str | pathlib.Path, flow: np.ndarray) -> None:
    """Write (H, W, 2) float32 flow as Middlebury .flo."""
    flow = np.asarray(flow)
    if flow.ndim != 3 or flow.shape[2] != 2:
        raise ValueError(f"flow must be (H, W, 2), got {flow.shape}")
    from .. import native
    if native.available():
        return native.write_flo(path, flow)
    h, w = flow.shape[:2]
    with open(path, "wb") as f:
        f.write(np.float32(TAG_FLOAT).tobytes())
        f.write(np.int32(w).tobytes())
        f.write(np.int32(h).tobytes())
        f.write(flow.astype(np.float32).tobytes())


def make_color_wheel() -> np.ndarray:
    """55-entry RGB color wheel (flow_utils.py:163-204)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col:col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col:col + YG, 1] = 255
    col += YG
    wheel[col:col + GC, 1] = 255
    wheel[col:col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col:col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col:col + CB, 2] = 255
    col += CB
    wheel[col:col + BM, 2] = 255
    wheel[col:col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col:col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col:col + MR, 0] = 255
    return wheel


def compute_color(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Map normalised flow (u, v) to RGB via the color wheel
    (flow_utils.py:119-161)."""
    h, w = u.shape
    img = np.zeros((h, w, 3), np.uint8)
    nan_idx = np.isnan(u) | np.isnan(v)
    u = np.where(nan_idx, 0, u)
    v = np.where(nan_idx, 0, v)

    wheel = make_color_wheel()
    ncols = wheel.shape[0]
    rad = np.sqrt(u ** 2 + v ** 2)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1) + 1
    k0 = np.floor(fk).astype(int)
    k1 = np.where(k0 + 1 == ncols + 1, 1, k0 + 1)
    f = fk - k0
    for i in range(3):
        col0 = wheel[k0 - 1, i] / 255.0
        col1 = wheel[k1 - 1, i] / 255.0
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col = np.where(idx, 1 - rad * (1 - col), col * 0.75)
        img[:, :, i] = np.uint8(np.floor(255 * col * (1 - nan_idx)))
    return img


def flow_to_image(flow: np.ndarray, display: bool = False) -> np.ndarray:
    """Render (H, W, 2) flow as an RGB image (flow_utils.py:72-117)."""
    u, v = flow[:, :, 0].astype(np.float64), flow[:, :, 1].astype(np.float64)
    UNKNOWN_FLOW_THRESH = 1e7
    idx_unknown = (np.abs(u) > UNKNOWN_FLOW_THRESH) | (np.abs(v) > UNKNOWN_FLOW_THRESH)
    u = np.where(idx_unknown, 0, u)
    v = np.where(idx_unknown, 0, v)

    rad = np.sqrt(u ** 2 + v ** 2)
    maxrad = max(-1.0, float(rad.max()) if rad.size else -1.0)
    if display:
        print(f"max flow: {maxrad:.4f} flow range: u = "
              f"{u.min():.3f} .. {u.max():.3f}; v = {v.min():.3f} .. {v.max():.3f}")
    eps = np.finfo(float).eps
    u = u / (maxrad + eps)
    v = v / (maxrad + eps)
    img = compute_color(u, v)
    img[idx_unknown] = 0
    return img


def visualize_flow_file(flow_path: str | pathlib.Path,
                        save_dir: Optional[str] = None) -> np.ndarray:
    """Render a .flo file to PNG (flow_utils.py:59-70 equivalent,
    without the matplotlib dependency)."""
    flow = read_flo(flow_path)
    img = flow_to_image(flow)
    if save_dir:
        from PIL import Image
        name = os.path.splitext(os.path.basename(str(flow_path)))[0] + ".png"
        Image.fromarray(img).save(os.path.join(save_dir, name))
    return img
