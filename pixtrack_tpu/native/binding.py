"""ctypes bindings for the native COLMAP parser (libcolmap_fast.so).

Compiled lazily with g++ -O3; results are returned as the same record dicts
colmap_io produces, assembled from the parser's flat packed arrays. Falls
back cleanly to the pure-Python reader when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Dict, Optional

import numpy as np

_DIR = Path(__file__).parent
_SRC = _DIR / "colmap_fast.cpp"
_LIB = _DIR / "libcolmap_fast.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def ensure_built() -> bool:
    """Compile the shared library if needed. Returns availability."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return True
        if _build_failed:
            return False
        try:
            if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB), str(_SRC)],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            lib = ctypes.CDLL(str(_LIB))
            lib.colmap_points3d_counts.restype = ctypes.c_int
            lib.colmap_points3d_parse.restype = ctypes.c_int
            lib.colmap_images_counts.restype = ctypes.c_int
            lib.colmap_images_parse.restype = ctypes.c_int
            _lib = lib
            return True
        except Exception:
            _build_failed = True
            return False


def native_available() -> bool:
    return ensure_built()


def _c(arr):
    return arr.ctypes.data_as(ctypes.c_void_p)


def fast_read_points3D_bin(path) -> Optional[Dict[int, "object"]]:
    """Native points3D.bin reader; None if the library is unavailable."""
    if not ensure_built():
        return None
    from pixtrack_tpu.sfm.colmap_io import Point3DRecord

    spath = str(path).encode()
    n = ctypes.c_int64()
    ntr = ctypes.c_int64()
    if _lib.colmap_points3d_counts(spath, ctypes.byref(n), ctypes.byref(ntr)):
        return None
    n, ntr = n.value, ntr.value
    ids = np.empty(n, np.int64)
    xyz = np.empty((n, 3), np.float64)
    rgb = np.empty((n, 3), np.uint8)
    errors = np.empty(n, np.float64)
    offs = np.empty(n + 1, np.int64)
    tids = np.empty(ntr, np.int32)
    tidx = np.empty(ntr, np.int32)
    rc = _lib.colmap_points3d_parse(
        spath, n, _c(ids), _c(xyz), _c(rgb), _c(errors), _c(offs), _c(tids), _c(tidx)
    )
    if rc:
        return None
    out = {}
    for i in range(n):
        s, e = offs[i], offs[i + 1]
        out[int(ids[i])] = Point3DRecord(
            int(ids[i]), xyz[i], rgb[i], float(errors[i]), tids[s:e], tidx[s:e]
        )
    return out


def fast_read_images_bin(path) -> Optional[Dict[int, "object"]]:
    """Native images.bin reader; None if the library is unavailable."""
    if not ensure_built():
        return None
    from pixtrack_tpu.sfm.colmap_io import ImageRecord

    spath = str(path).encode()
    n = ctypes.c_int64()
    nobs = ctypes.c_int64()
    nb = ctypes.c_int64()
    if _lib.colmap_images_counts(
        spath, ctypes.byref(n), ctypes.byref(nobs), ctypes.byref(nb)
    ):
        return None
    n, nobs, nb = n.value, nobs.value, nb.value
    ids = np.empty(n, np.int32)
    qvecs = np.empty((n, 4), np.float64)
    tvecs = np.empty((n, 3), np.float64)
    cams = np.empty(n, np.int32)
    names_blob = ctypes.create_string_buffer(max(nb, 1))
    offs = np.empty(n + 1, np.int64)
    xys = np.empty((nobs, 2), np.float64)
    p3ds = np.empty(nobs, np.int64)
    rc = _lib.colmap_images_parse(
        spath, n, _c(ids), _c(qvecs), _c(tvecs), _c(cams), names_blob,
        _c(offs), _c(xys), _c(p3ds),
    )
    if rc:
        return None
    names = names_blob.raw[: nb].split(b"\x00")[:-1] if nb else []
    out = {}
    for i in range(n):
        s, e = offs[i], offs[i + 1]
        out[int(ids[i])] = ImageRecord(
            int(ids[i]), qvecs[i], tvecs[i], int(cams[i]),
            names[i].decode("utf-8"), xys[s:e], p3ds[s:e],
        )
    return out
