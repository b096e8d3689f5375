"""Frame reading by extension (reference: /root/reference/utils/frame_utils.py).

png/jpg/jpeg/ppm -> RGB uint8 via PIL (alpha dropped, frame_utils.py:9-13);
.flo -> float32 flow; .bin/.raw -> np.load (frame_utils.py:14-15).
"""

from __future__ import annotations

import os
import pathlib

import numpy as np

from .flow_io import read_flo

_IMG_EXTS = {".png", ".jpg", ".jpeg", ".ppm"}


def read_gen(file_name: str | pathlib.Path) -> np.ndarray:
    ext = os.path.splitext(str(file_name))[-1].lower()
    if ext in _IMG_EXTS:
        from .. import native
        if native.available():
            return native.read_image(file_name)
        from PIL import Image
        im = np.asarray(Image.open(str(file_name)))
        if im.ndim == 2:
            im = np.stack([im] * 3, axis=-1)
        if im.shape[2] > 3:
            im = im[:, :, :3]
        return im
    if ext in (".bin", ".raw"):
        return np.load(str(file_name))
    if ext == ".flo":
        return read_flo(file_name).astype(np.float32)
    raise ValueError(f"unsupported extension {ext!r} for {file_name}")
