"""ctypes bindings for the native RLE kernels (with numpy fallback).

Builds ``librle_native.so`` from :file:`native/rle_native.cpp` on first use
(g++ is part of the image toolchain); if compilation is unavailable the
pure-numpy paths in :mod:`lsnet_tpu.evalkit.rle` are used instead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

from .rle import RLE, _runs_to_intervals, area

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_and_load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "native", "rle_native.cpp")
    so = os.path.join(here, "native", "librle_native.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", src, "-o", so],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        dp = ctypes.POINTER(ctypes.c_double)
        lib.rle_iou_matrix.argtypes = [i64p, i64p, i64p, i64p, i64p,
                                       ctypes.c_int64, ctypes.c_int64,
                                       i64p, i64p, u8p, dp]
        lib.rle_iou_matrix.restype = None
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


class RLEBank:
    """Interval-encoded mask bank for batched native IoU."""

    def __init__(self, rles: Sequence[RLE]):
        starts_all: List[np.ndarray] = []
        ends_all: List[np.ndarray] = []
        self.offs = np.zeros(len(rles), np.int64)
        self.lens = np.zeros(len(rles), np.int64)
        self.areas = np.zeros(len(rles), np.int64)
        pos = 0
        for i, r in enumerate(rles):
            s, e = _runs_to_intervals(r.cnts)
            starts_all.append(s)
            ends_all.append(e)
            self.offs[i] = pos
            self.lens[i] = len(s)
            self.areas[i] = area(r)
            pos += len(s)
        self.starts = (np.concatenate(starts_all) if starts_all
                       else np.zeros(0, np.int64)).astype(np.int64)
        self.ends = (np.concatenate(ends_all) if ends_all
                     else np.zeros(0, np.int64)).astype(np.int64)

    def iou_matrix(self, d_idx: np.ndarray, g_idx: np.ndarray,
                   iscrowd: np.ndarray) -> np.ndarray:
        lib = _build_and_load()
        D, G = len(d_idx), len(g_idx)
        out = np.zeros((D, G), np.float64)
        if D == 0 or G == 0:
            return out
        if lib is None:
            from .rle import rle_intersection  # numpy fallback path
            raise RuntimeError("native lib unavailable; use rle.iou fallback")
        i64p = ctypes.POINTER(ctypes.c_int64)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        dp = ctypes.POINTER(ctypes.c_double)
        d_idx = np.ascontiguousarray(d_idx, np.int64)
        g_idx = np.ascontiguousarray(g_idx, np.int64)
        crowd = np.ascontiguousarray(iscrowd, np.uint8)
        lib.rle_iou_matrix(
            self.starts.ctypes.data_as(i64p), self.ends.ctypes.data_as(i64p),
            self.offs.ctypes.data_as(i64p), self.lens.ctypes.data_as(i64p),
            self.areas.ctypes.data_as(i64p),
            ctypes.c_int64(D), ctypes.c_int64(G),
            d_idx.ctypes.data_as(i64p), g_idx.ctypes.data_as(i64p),
            crowd.ctypes.data_as(u8p), out.ctypes.data_as(dp))
        return out


def native_available() -> bool:
    return _build_and_load() is not None


def rle_iou_native(dt: Sequence[RLE], gt: Sequence[RLE],
                   iscrowd: Sequence[bool]) -> np.ndarray:
    """Drop-in accelerated version of :func:`lsnet_tpu.evalkit.rle.iou`
    for RLE masks."""
    bank = RLEBank(list(dt) + list(gt))
    d_idx = np.arange(len(dt), dtype=np.int64)
    g_idx = np.arange(len(gt), dtype=np.int64) + len(dt)
    return bank.iou_matrix(d_idx, g_idx,
                           np.asarray(iscrowd, np.uint8))
