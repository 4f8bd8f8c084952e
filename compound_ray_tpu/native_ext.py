"""ctypes loader for the native host runtime (native/compoundray_native.cpp).

Builds the shared library on first use when a compiler is available; every
entry point has a pure-numpy fallback so the framework works without it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcompoundray_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.isfile(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.isfile(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.cr_parse_eye_file.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.cr_parse_eye_file.restype = ctypes.c_int
    lib.cr_free.argtypes = [ctypes.c_void_p]
    lib.cr_build_clusters.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    lib.cr_build_clusters.restype = ctypes.c_int
    lib.cr_point_in_mesh.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_float,
    ]
    lib.cr_point_in_mesh.restype = ctypes.c_int
    lib.cr_write_ppm.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_ubyte),
        ctypes.c_int, ctypes.c_int,
    ]
    lib.cr_write_ppm.restype = ctypes.c_int
    _lib = lib
    return _lib


def parse_eye_file(path: str) -> Optional[np.ndarray]:
    """(N, 8) float32 rows, or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    data = ctypes.POINTER(ctypes.c_float)()
    count = ctypes.c_int()
    rc = lib.cr_parse_eye_file(path.encode(), ctypes.byref(data),
                               ctypes.byref(count))
    if rc == -4:
        raise ValueError(
            f"{path}: line {count.value} is not a valid .eye row "
            "(expected 7 or 8 space-separated numbers: pos dir angle "
            "[focal_offset])"
        )
    if rc == -2:
        raise ValueError(f"{path}: no ommatidia found (empty .eye file)")
    if rc != 0:
        return None
    try:
        arr = np.ctypeslib.as_array(data, shape=(count.value, 8)).copy()
    finally:
        lib.cr_free(data)
    return arr


def build_cluster_order(
    tris9: np.ndarray, leaf_size: int
) -> Optional[Tuple[np.ndarray, List[int]]]:
    """Native median-split: returns (order, cluster_sizes) or None."""
    lib = get_lib()
    if lib is None:
        return None
    tris9 = np.ascontiguousarray(tris9, np.float32)
    n = tris9.shape[0]
    order = np.zeros(n, np.int32)
    max_clusters = 2 * (n // max(leaf_size, 1) + 2)
    sizes = np.zeros(max_clusters, np.int32)
    rc = lib.cr_build_clusters(
        tris9.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n, leaf_size,
        order.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        max_clusters,
    )
    if rc < 0:
        return None
    return order, sizes[:rc].tolist()


def point_in_mesh(tris_obj: np.ndarray, obj_point: np.ndarray,
                  aabb_min_x: float) -> Optional[bool]:
    """Native ray-parity test; tris_obj is (n, 3, 3) object-space vertices."""
    lib = get_lib()
    if lib is None:
        return None
    tris = np.ascontiguousarray(tris_obj.reshape(-1, 9), np.float32)
    pt = np.ascontiguousarray(obj_point, np.float32)
    rc = lib.cr_point_in_mesh(
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        tris.shape[0],
        pt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        float(aabb_min_x),
    )
    return bool(rc)


def write_ppm(path: str, frame_rgba: np.ndarray) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    frame = np.ascontiguousarray(frame_rgba, np.uint8)
    h, w = frame.shape[:2]
    rc = lib.cr_write_ppm(
        path.encode(),
        frame.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), w, h,
    )
    return rc == 0
