"""PFM image IO (optical-flow storage format).

Same on-disk format as ref:third_party/ext_utils/util_flow.py:36-119 (the
standard Portable Float Map: 'PF'/'Pf' header, bottom-up row order, scale
sign encodes endianness)."""

from __future__ import annotations

import re

import numpy as np


def read_pfm(path: str):
    with open(path, "rb") as f:
        header = f.readline().rstrip().decode("ascii")
        if header == "PF":
            color = True
        elif header == "Pf":
            color = False
        else:
            raise ValueError(f"{path}: not a PFM file")
        m = re.match(r"^(\d+)\s(\d+)\s*$", f.readline().decode("ascii"))
        if not m:
            raise ValueError(f"{path}: malformed PFM header")
        width, height = map(int, m.groups())
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        data = np.fromfile(f, endian + "f")
    shape = (height, width, 3) if color else (height, width)
    return np.flipud(data.reshape(shape)), abs(scale)


def write_pfm(path: str, image: np.ndarray, scale: float = 1.0) -> None:
    if image.dtype != np.float32:
        raise ValueError("PFM requires float32")
    color = image.ndim == 3 and image.shape[2] == 3
    if not color and not (image.ndim == 2 or (image.ndim == 3 and image.shape[2] == 1)):
        raise ValueError("image must be HxW, HxWx1 or HxWx3")
    data = np.flipud(image)
    import sys
    if data.dtype.byteorder == "<" or (data.dtype.byteorder == "="
                                       and sys.byteorder == "little"):
        scale = -scale
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode())
        f.write(f"{scale}\n".encode())
        data.tofile(f)
