"""ctypes binding for the native C++ support library (native/coda_native.cpp).

Builds on demand with g++ (no pybind11 in the image); falls back gracefully
when no compiler is available.  See native/coda_native.cpp for what these
implement and the reference anchors.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO_ROOT, "native", "coda_native.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libcoda_native.so")

_lib = None


def build(force: bool = False) -> str:
    if not force and os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    try:
        path = build()
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    lib = ctypes.CDLL(path)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.fps_cpu.argtypes = [f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, i32p]
    lib.ball_query_cpu.argtypes = [
        f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_int, i32p,
    ]
    lib.clip_area_cpu.argtypes = [f32p, f32p]
    lib.clip_area_cpu.restype = ctypes.c_double
    lib.clip_area_batch_cpu.argtypes = [
        f32p, f32p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p, f64p,
    ]
    lib.nms_3d_samecls_cpu.argtypes = [
        f32p, ctypes.c_int, ctypes.c_float, ctypes.c_int, i32p,
    ]
    lib.nms_3d_samecls_cpu.restype = ctypes.c_int
    lib.clip_area_eval_cpu.argtypes = [f32p, f32p]
    lib.clip_area_eval_cpu.restype = ctypes.c_double
    lib.box3d_iou_eval_cpu.argtypes = [f32p, f32p, ctypes.c_int, f64p]
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def fps(xyz: np.ndarray, npoint: int) -> np.ndarray:
    lib = get_lib()
    xyz = np.ascontiguousarray(xyz, np.float32)
    b, n, _ = xyz.shape
    out = np.zeros((b, npoint), np.int32)
    lib.fps_cpu(xyz, b, n, npoint, out)
    return out


def ball_query(radius: float, nsample: int, xyz: np.ndarray, new_xyz: np.ndarray) -> np.ndarray:
    lib = get_lib()
    xyz = np.ascontiguousarray(xyz, np.float32)
    new_xyz = np.ascontiguousarray(new_xyz, np.float32)
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    out = np.zeros((b, m, nsample), np.int32)
    lib.ball_query_cpu(xyz, new_xyz, b, n, m, radius, nsample, out)
    return out


def clip_area(subject: np.ndarray, clip: np.ndarray) -> float:
    lib = get_lib()
    return lib.clip_area_cpu(
        np.ascontiguousarray(subject, np.float32), np.ascontiguousarray(clip, np.float32)
    )


def box3d_iou_eval_batch(bb: np.ndarray, gts: np.ndarray) -> np.ndarray:
    """Eval-path rotated 3D IoU of one (8,3) box vs (M,8,3) boxes."""
    lib = get_lib()
    bb = np.ascontiguousarray(bb, np.float32)
    gts = np.ascontiguousarray(gts, np.float32)
    out = np.zeros((gts.shape[0],), np.float64)
    lib.box3d_iou_eval_cpu(bb, gts, gts.shape[0], out)
    return out


def nms_3d_samecls(boxes: np.ndarray, thresh: float, old_type: bool = False) -> np.ndarray:
    """boxes (K, 8) -> indices kept (ascending order of selection not
    preserved; use the mask)."""
    lib = get_lib()
    boxes = np.ascontiguousarray(boxes, np.float32)
    keep = np.zeros((boxes.shape[0],), np.int32)
    lib.nms_3d_samecls_cpu(boxes, boxes.shape[0], thresh, int(old_type), keep)
    return np.where(keep)[0]
