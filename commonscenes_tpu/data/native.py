"""ctypes bindings for the native host-side data kernels.

Loads ``native/libcommonscenes_native.so`` (built by ``make -C native``);
every entry point has a numpy fallback so the framework runs without the
build step. See native/data_kernels.cpp for what each kernel replaces in
the reference's data path.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


def load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(_repo_root(), "native", "libcommonscenes_native.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        i64, f32p, i32p = (ctypes.c_int64, ctypes.POINTER(ctypes.c_float),
                           ctypes.POINTER(ctypes.c_int32))
        lib.clamp_pad_sdf.argtypes = [f32p, i32p, f32p, i64, i64,
                                      ctypes.c_float]
        lib.normalize_boxes.argtypes = [f32p, f32p, f32p, ctypes.c_float,
                                        f32p, i64, i64]
        lib.denormalize_boxes.argtypes = lib.normalize_boxes.argtypes
        lib.nn_distance_cpu.argtypes = [f32p, i64, f32p, i64, f32p, f32p]
        lib.bin_angles.argtypes = [f32p, i32p, i64, ctypes.c_int32]
        lib.partition_vertices.argtypes = [i32p, i64, i32p, i64, i32p,
                                           ctypes.POINTER(ctypes.c_int64)]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def _fp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def clamp_pad_sdf(src: np.ndarray, sel: np.ndarray, n_dst: int,
                  trunc: float) -> np.ndarray:
    """src [n_src, R, R, R] float32, sel [n_dst] int32 (−1 = zero row) →
    [n_dst, R, R, R, 1] clamped batch."""
    src = np.ascontiguousarray(src, np.float32)
    sel = np.ascontiguousarray(sel, np.int32)
    R = src.shape[1]
    grid = R * R * R
    lib = load_library()
    if lib is not None and src.size:
        dst = np.empty((n_dst, grid), np.float32)
        lib.clamp_pad_sdf(_fp(src.reshape(-1)), _ip(sel), _fp(dst),
                          n_dst, grid, trunc)
        return dst.reshape(n_dst, R, R, R, 1)
    dst = np.zeros((n_dst, R, R, R, 1), np.float32)
    for row, s in enumerate(sel):
        if s >= 0:
            dst[row, ..., 0] = np.clip(src[s], -trunc, trunc)
    return dst


def normalize_boxes(boxes: np.ndarray, mean: np.ndarray, std: np.ndarray,
                    scale: float = 3.0) -> np.ndarray:
    boxes = np.ascontiguousarray(boxes, np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib = load_library()
    if lib is not None and boxes.size:
        out = np.empty_like(boxes)
        lib.normalize_boxes(_fp(boxes), _fp(mean), _fp(std), scale, _fp(out),
                            boxes.shape[0], boxes.shape[1])
        return out
    return scale * (boxes - mean) / std


def denormalize_boxes(boxes: np.ndarray, mean: np.ndarray, std: np.ndarray,
                      scale: float = 3.0) -> np.ndarray:
    boxes = np.ascontiguousarray(boxes, np.float32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib = load_library()
    if lib is not None and boxes.size:
        out = np.empty_like(boxes)
        lib.denormalize_boxes(_fp(boxes), _fp(mean), _fp(std), scale,
                              _fp(out), boxes.shape[0], boxes.shape[1])
        return out
    return boxes * std / scale + mean


def nn_distance_cpu(x: np.ndarray, y: np.ndarray):
    """Golden-path bidirectional NN distances ([n,3],[m,3] → [n],[m])."""
    x = np.ascontiguousarray(x, np.float32)
    y = np.ascontiguousarray(y, np.float32)
    lib = load_library()
    if lib is not None and x.size and y.size:
        d1 = np.empty(x.shape[0], np.float32)
        d2 = np.empty(y.shape[0], np.float32)
        lib.nn_distance_cpu(_fp(x), x.shape[0], _fp(y), y.shape[0],
                            _fp(d1), _fp(d2))
        return d1, d2
    d = ((x[:, None] - y[None]) ** 2).sum(-1)
    return d.min(1), d.min(0)


def bin_angles(angles_rad: np.ndarray, nbins: int = 24) -> np.ndarray:
    angles_rad = np.ascontiguousarray(angles_rad, np.float32)
    lib = load_library()
    if lib is not None and angles_rad.size:
        out = np.empty(angles_rad.shape[0], np.int32)
        lib.bin_angles(_fp(angles_rad), _ip(out), angles_rad.shape[0], nbins)
        return out
    bins = np.linspace(-np.pi, np.pi, nbins)
    return np.clip(np.digitize(angles_rad, bins) - 1, 0, nbins - 1).astype(np.int32)


def partition_vertices(vert_ids: np.ndarray, inst_ids: np.ndarray):
    """Partition annotated-scan vertex indices by instance id in one pass
    (3RScan points path). Returns ``(idx [V'], off [n+1])`` with instance
    ``i``'s vertex indices at ``idx[off[i]:off[i+1]]``."""
    vert_ids = np.ascontiguousarray(vert_ids, np.int32)
    inst_ids = np.ascontiguousarray(inst_ids, np.int32)
    n, V = inst_ids.shape[0], vert_ids.shape[0]
    lib = load_library()
    if lib is not None and V and n:
        idx = np.empty(V, np.int32)
        off = np.empty(n + 1, np.int64)
        lib.partition_vertices(_ip(vert_ids), V, _ip(inst_ids), n,
                               _ip(idx), off.ctypes.data_as(
                                   ctypes.POINTER(ctypes.c_int64)))
        return idx[: off[n]].copy(), off
    parts = [np.where(vert_ids == i)[0].astype(np.int32) for i in inst_ids]
    off = np.zeros(n + 1, np.int64)
    off[1:] = np.cumsum([len(p) for p in parts])
    return (np.concatenate(parts) if parts else np.zeros(0, np.int32)), off
