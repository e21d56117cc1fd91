"""Radiance ``.hdr`` (RGBE) loader with RLE support.

Replaces the DevIL HDR import path used for environment maps
(``nrc/src/Picture.cpp`` loading ``NV_Default_HDR_3000x1500.hdr``).
Handles both flat and adaptive-RLE scanlines.
"""

from __future__ import annotations

import numpy as np


def load_radiance_hdr(path: str) -> np.ndarray:
    """Load a Radiance HDR file -> [H, W, 3] float32 linear RGB.

    Row 0 of the output is the bottom row (v == 0 south pole), matching the
    reference's lower-left texture origin convention.
    """
    with open(path, "rb") as f:
        data = f.read()

    if not (data.startswith(b"#?RADIANCE") or data.startswith(b"#?RGBE")):
        raise ValueError("not a Radiance HDR file")

    # header: lines until blank line
    pos = 0
    flip_y = False
    while True:
        eol = data.index(b"\n", pos)
        line = data[pos:eol]
        pos = eol + 1
        if line == b"":
            break
    # resolution line, e.g. "-Y 1500 +X 3000"
    eol = data.index(b"\n", pos)
    dims = data[pos:eol].split()
    pos = eol + 1
    if dims[0] == b"-Y":
        h, w = int(dims[1]), int(dims[3])
        flip_y = True  # first scanline is the top row
    elif dims[0] == b"+Y":
        h, w = int(dims[1]), int(dims[3])
    else:
        raise ValueError(f"unsupported resolution line {dims}")

    rgbe = np.zeros((h, w, 4), dtype=np.uint8)
    buf = memoryview(data)

    from ..native import get_lib

    lib = get_lib()
    if lib is not None:
        consumed = lib.hdr_decode_rle(
            data, len(data), pos, w, h, rgbe.ctypes.data
        )
        if consumed < 0:
            raise ValueError("corrupt HDR scanline data")
        return _rgbe_to_float(rgbe, flip_y)

    for y in range(h):
        if pos + 4 > len(data):
            raise ValueError("truncated HDR")
        if data[pos] == 2 and data[pos + 1] == 2 and ((data[pos + 2] << 8) | data[pos + 3]) == w:
            # adaptive RLE scanline: 4 component planes
            pos += 4
            row = np.zeros((4, w), dtype=np.uint8)
            for c in range(4):
                x = 0
                while x < w:
                    cnt = data[pos]
                    pos += 1
                    if cnt > 128:  # run
                        row[c, x : x + cnt - 128] = data[pos]
                        pos += 1
                        x += cnt - 128
                    else:  # literal
                        row[c, x : x + cnt] = np.frombuffer(
                            buf[pos : pos + cnt], dtype=np.uint8
                        )
                        pos += cnt
                        x += cnt
            rgbe[y] = row.T
        else:
            # flat scanline
            row = np.frombuffer(buf[pos : pos + 4 * w], dtype=np.uint8).reshape(w, 4)
            rgbe[y] = row
            pos += 4 * w

    return _rgbe_to_float(rgbe, flip_y)


def _rgbe_to_float(rgbe: np.ndarray, flip_y: bool) -> np.ndarray:
    e = rgbe[..., 3].astype(np.int32) - 128
    scale = np.ldexp(1.0, e - 8).astype(np.float32)
    out = rgbe[..., :3].astype(np.float32) * scale[..., None]
    out[rgbe[..., 3] == 0] = 0.0
    if flip_y:
        out = out[::-1]
    return np.ascontiguousarray(out)
