"""ctypes loader for the native host runtime (``nrc_native.c``).

Compiles the shared library on first use (cached next to the source) and
exposes typed wrappers. Pure-Python fallbacks exist at every call site, so
the package works without a C toolchain — just slower.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "nrc_native.c")
_LIB = os.path.join(_HERE, "libnrc_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _compile() -> bool:
    cmd = [
        os.environ.get("CC", "cc"),
        "-O3", "-march=native", "-fPIC", "-shared", "-o", _LIB, _SRC, "-lm",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (compiling if needed) the native library; None if unavailable."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.isfile(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _compile():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None

        lib.hdr_decode_rle.restype = ctypes.c_int64
        lib.hdr_decode_rle.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p,
        ]
        lib.bvh_build_binned_sah.restype = ctypes.c_int32
        lib.bvh_build_binned_sah.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.bvh_flatten_preorder.restype = ctypes.c_int32
        lib.bvh_flatten_preorder.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.bvh_collapse_sizes.restype = None
        lib.bvh_collapse_sizes.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.alias_table_build.restype = ctypes.c_int32
        lib.alias_table_build.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,             # p (f64), n
            ctypes.c_void_p, ctypes.c_void_p,            # prob (f32), alias (i32)
        ]
        lib.bvh_collapse_wide.restype = ctypes.c_int32
        lib.bvh_collapse_wide.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,            # left, right
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # start,count,order
            ctypes.c_void_p, ctypes.c_void_p,            # lo, hi
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,  # n, leaf_size, branch
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # meta, box, leaf_ids
            ctypes.c_void_p,                             # out_counts[3]
        ]
        _lib = lib
        return _lib
