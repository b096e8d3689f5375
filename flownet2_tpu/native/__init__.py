"""Native (C++) data-path bindings.

Builds ``src/fileio.cc`` on first import (g++ -O3, linking libpng/libjpeg)
and exposes it via ctypes — no pybind11 dependency.  Decoding runs outside
the GIL, so the loader's worker threads scale across cores; the batch call
decodes+crops+converts a whole batch with an internal thread pool in one C
call.

Everything degrades gracefully: if the toolchain or image libraries are
missing, ``available()`` returns False and callers (data.frame_io,
data.flow_io, data.loader) fall back to the pure-Python implementations.

This is the TPU framework's analog of the reference's native input path
(torch's C++ DataLoader workers, /root/reference/main.py:130-159).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import sys
import sysconfig
import threading
from typing import Optional, Sequence

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_SRC = _DIR / "src" / "fileio.cc"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _so_path() -> pathlib.Path:
    tag = sysconfig.get_platform().replace("-", "_").replace(".", "_")
    return _DIR / f"_fileio_{tag}.so"


def _build(so: pathlib.Path) -> bool:
    cmd = [
        os.environ.get("CXX", "g++"), "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(so), "-lpng", "-ljpeg", "-pthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if proc.returncode != 0:
        print(f"flownet2_tpu.native: build failed:\n{proc.stderr}",
              file=sys.stderr)
        return False
    return True


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    c_int_p = ctypes.POINTER(ctypes.c_int)
    f32_p = ctypes.POINTER(ctypes.c_float)
    u8_p = ctypes.POINTER(ctypes.c_uint8)
    lib.f2t_image_info.argtypes = [ctypes.c_char_p, c_int_p, c_int_p, c_int_p]
    lib.f2t_image_read_rgb.argtypes = [ctypes.c_char_p, u8_p, ctypes.c_int,
                                       ctypes.c_int]
    lib.f2t_flo_info.argtypes = [ctypes.c_char_p, c_int_p, c_int_p]
    lib.f2t_flo_read.argtypes = [ctypes.c_char_p, f32_p, ctypes.c_int,
                                 ctypes.c_int]
    lib.f2t_flo_write.argtypes = [ctypes.c_char_p, f32_p, ctypes.c_int,
                                  ctypes.c_int]
    lib.f2t_batch_load.argtypes = [
        ctypes.c_char_p, ctypes.c_int, f32_p, c_int_p, c_int_p,
        ctypes.c_char_p, ctypes.c_int, f32_p, c_int_p, c_int_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    for name in ("f2t_image_info", "f2t_image_read_rgb", "f2t_flo_info",
                 "f2t_flo_read", "f2t_flo_write", "f2t_batch_load"):
        getattr(lib, name).restype = ctypes.c_int
    return lib


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("FLOWNET2_TPU_NO_NATIVE"):
            return None
        so = _so_path()
        try:
            fresh = so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime
            if not fresh and not _build(so):
                return None
            _LIB = _bind(ctypes.CDLL(str(so)))
        except OSError as e:
            print(f"flownet2_tpu.native: load failed: {e}", file=sys.stderr)
            _LIB = None
        return _LIB


def available() -> bool:
    return _load() is not None


def _check(rc: int, what: str, path) -> None:
    if rc == 0:
        return
    codes = {-1: "cannot open", -2: "bad format/magic", -3: "truncated",
             -4: "decoder init failed", -5: "shape mismatch"}
    msg = f"{what} {path!r}: {codes.get(rc, f'error {rc}')}"
    if rc in (-2, -5):  # malformed content: match the Python readers
        raise ValueError(msg)
    raise IOError(msg)


def read_image(path) -> np.ndarray:
    """Decode PNG/JPEG/PPM/PGM to an (H, W, 3) uint8 RGB array."""
    lib = _load()
    assert lib is not None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    p = str(path).encode()
    _check(lib.f2t_image_info(p, ctypes.byref(h), ctypes.byref(w),
                              ctypes.byref(c)), "image", path)
    out = np.empty((h.value, w.value, 3), np.uint8)
    _check(lib.f2t_image_read_rgb(
        p, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h.value, w.value), "image", path)
    return out


def read_flo(path) -> np.ndarray:
    """Read a Middlebury .flo file to (H, W, 2) float32."""
    lib = _load()
    assert lib is not None
    h = ctypes.c_int()
    w = ctypes.c_int()
    p = str(path).encode()
    _check(lib.f2t_flo_info(p, ctypes.byref(h), ctypes.byref(w)),
           ".flo", path)
    out = np.empty((h.value, w.value, 2), np.float32)
    _check(lib.f2t_flo_read(
        p, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h.value, w.value), ".flo", path)
    return out


def write_flo(path, flow: np.ndarray) -> None:
    lib = _load()
    assert lib is not None
    flow = np.ascontiguousarray(flow, np.float32)
    if flow.ndim != 3 or flow.shape[2] != 2:
        raise ValueError(f"flow must be (H, W, 2), got {flow.shape}")
    _check(lib.f2t_flo_write(
        str(path).encode(),
        flow.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        flow.shape[0], flow.shape[1]), ".flo", path)


def batch_load(img_paths: Sequence[str], img_offsets: np.ndarray,
               flo_paths: Sequence[str], flo_offsets: np.ndarray,
               crop_h: int, crop_w: int, flip_flow_vertical: bool = False,
               n_threads: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Parallel decode+crop of a batch.

    img_offsets/flo_offsets: (N, 2) int32 (oy, ox) crop origins per item
    (for flipped flows: in post-flip coordinates).
    Returns (imgs (n_img, ch, cw, 3) f32, flows (n_flo, ch, cw, 2) f32).
    """
    lib = _load()
    assert lib is not None
    n_img, n_flo = len(img_paths), len(flo_paths)
    imgs = np.empty((n_img, crop_h, crop_w, 3), np.float32)
    flows = np.empty((n_flo, crop_h, crop_w, 2), np.float32)
    ioff = np.ascontiguousarray(np.asarray(img_offsets, np.int32).reshape(-1, 2))
    foff = np.ascontiguousarray(np.asarray(flo_offsets, np.int32).reshape(-1, 2))
    assert ioff.shape[0] == n_img and foff.shape[0] == n_flo
    ipaths = b"".join(str(p).encode() + b"\0" for p in img_paths)
    fpaths = b"".join(str(p).encode() + b"\0" for p in flo_paths)
    if n_threads <= 0:
        n_threads = min(16, os.cpu_count() or 4)
    f32_p = ctypes.POINTER(ctypes.c_float)
    i32_p = ctypes.POINTER(ctypes.c_int)
    # keep the per-column copies alive for the duration of the call
    ioy, iox = ioff[:, 0].copy(), ioff[:, 1].copy()
    foy, fox = foff[:, 0].copy(), foff[:, 1].copy()
    rc = lib.f2t_batch_load(
        ipaths, n_img, imgs.ctypes.data_as(f32_p),
        ioy.ctypes.data_as(i32_p), iox.ctypes.data_as(i32_p),
        fpaths, n_flo, flows.ctypes.data_as(f32_p),
        foy.ctypes.data_as(i32_p), fox.ctypes.data_as(i32_p),
        crop_h, crop_w, int(flip_flow_vertical), n_threads)
    _check(rc, "batch", f"{n_img} images + {n_flo} flows")
    return imgs, flows
