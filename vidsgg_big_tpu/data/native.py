"""ctypes bindings for the native host-side packer (native/packer.cpp).

Auto-builds the shared library on first use if a toolchain is available;
every entry point has a numpy fallback so the pure-python path keeps working.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False
_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = os.path.join(_NATIVE_DIR, "libvidsgg_packer.so")
    if not os.path.exists(so):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.stretch_index.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64, i32p]
    lib.pad_pack.argtypes = [f32p, i64p, i32p, ctypes.c_int64,
                             ctypes.c_int64, ctypes.c_int64, f32p]
    lib.stretch_pack.argtypes = [f32p, i64p, i32p, ctypes.c_int64,
                                 ctypes.c_int64, ctypes.c_int64, f32p]
    lib.group_tracklet_rows.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i32p, i64p,
        i32p]
    lib.group_tracklet_rows.restype = ctypes.c_int64
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def stretch_index(lengths, t: int) -> np.ndarray:
    lengths = np.ascontiguousarray(lengths, np.int32)
    lib = _load()
    if lib is None:
        from ..ops.segments import stretch_index_np
        return stretch_index_np(lengths, t)
    out = np.empty((lengths.shape[0], t), np.int32)
    lib.stretch_index(lengths, lengths.shape[0], t, out)
    return out


def pad_pack(trajs, n_bucket: int, t_bucket: int, stretch: bool = False
             ) -> np.ndarray:
    """trajs: list of (L_i, D) float arrays -> (n_bucket, t_bucket, D)."""
    # NOTE: numpy slice assignment / fancy indexing is already memcpy-bound
    # here (measured faster than routing through the C++ entry points, which
    # need an extra concatenation copy); the C++ pad_pack/stretch_pack remain
    # for callers that already hold one contiguous buffer.
    d = trajs[0].shape[1] if trajs else 0
    lengths = np.asarray([x.shape[0] for x in trajs], np.int32)
    dst = np.zeros((n_bucket, t_bucket, d), np.float32)
    if not trajs:
        return dst
    if stretch:
        idx = stretch_index(lengths, t_bucket)
        for i, x in enumerate(trajs):
            dst[i] = np.asarray(x, np.float32)[np.minimum(
                idx[i], x.shape[0] - 1)]
    else:
        for i, x in enumerate(trajs):
            L = min(x.shape[0], t_bucket)
            dst[i, :L] = x[:L]
    return dst


def group_tracklet_rows(rows: np.ndarray, max_trajs: int = 4096):
    """rows: (R, C) numeric array with columns [fid, tid, ...].

    Returns (order (R,), traj_offsets (n+1,), traj_tids (n,)): row indices
    sorted by (tid, fid) and per-trajectory segments.
    """
    rows32 = np.ascontiguousarray(rows, np.float32)
    lib = _load()
    if lib is None:
        tid = rows[:, 1].astype(np.int64)
        fid = rows[:, 0].astype(np.int64)
        order = np.lexsort((fid, tid)).astype(np.int32)
        st = tid[order]
        starts = np.flatnonzero(np.concatenate([[True], st[1:] != st[:-1]]))
        off = np.concatenate([starts, [rows.shape[0]]]).astype(np.int64)
        return order, off, st[starts].astype(np.int32)
    order = np.empty(rows.shape[0], np.int32)
    off = np.empty(max_trajs + 1, np.int64)
    tids = np.empty(max_trajs, np.int32)
    n = lib.group_tracklet_rows(rows32, rows.shape[0], rows.shape[1],
                                max_trajs, order, off, tids)
    assert n >= 0, "max_trajs too small"
    return order, off[:n + 1], tids[:n]
