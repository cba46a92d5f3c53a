"""ctypes loader for the native collation kernels.

Compiles ``fastcollate.cc`` with the system toolchain on first use
(cached next to the source); every entry point has a numpy fallback so
the framework works without a compiler.  See the .cc file for the
semantics contract with the Python collators.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastcollate.cc")
_LIB_PATH = os.path.join(_HERE, "_fastcollate.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_LIB_PATH) and os.path.getmtime(
        _LIB_PATH
    ) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-shared",
                "-fPIC",
                _SRC,
                "-o",
                _LIB_PATH,
            ],
            check=True,
            capture_output=True,
        )
        return _LIB_PATH
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        path = _build()
        if path:
            lib = ctypes.CDLL(path)
            c_i64 = ctypes.c_int64
            c_f32 = ctypes.c_float
            pp = ctypes.POINTER(ctypes.c_void_p)
            lib.pad_rows_f32.argtypes = [
                pp, ctypes.c_void_p, c_i64, c_i64, c_f32,
                ctypes.c_void_p, ctypes.c_void_p,
            ]
            lib.pad_rows_fill_f32.argtypes = [
                pp, ctypes.c_void_p, c_i64, c_i64, c_f32,
                ctypes.c_void_p,
            ]
            lib.pad_seq2d_f32.argtypes = [
                pp, ctypes.c_void_p, c_i64, c_i64, c_i64, c_f32,
                ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
            ]
            _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _row_pointers(rows: List[Optional[np.ndarray]]):
    """(ptr array, keepalive list) for a list of C-contiguous f32 rows."""
    n = len(rows)
    ptrs = (ctypes.c_void_p * n)()
    keep = []
    for i, r in enumerate(rows):
        if r is None or r.size == 0:
            ptrs[i] = None
        else:
            r = np.ascontiguousarray(r, dtype=np.float32)
            keep.append(r)
            ptrs[i] = r.ctypes.data
    return ptrs, keep


def pad_rows(
    rows: List[Optional[np.ndarray]],
    pad_len: int,
    pad_value: float,
    with_mask: bool = True,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Native path of SequenceCollator's primary column."""
    lib = get_lib()
    n = len(rows)
    lens = np.asarray(
        [0 if r is None else int(np.asarray(r).reshape(-1).shape[0]) for r in rows],
        dtype=np.int64,
    )
    flat = [
        None if r is None else np.asarray(r, np.float32).reshape(-1)
        for r in rows
    ]
    out = np.empty((n, pad_len), np.float32)
    mask = np.empty((n, pad_len), np.int64) if with_mask else None
    ptrs, keep = _row_pointers(flat)
    lib.pad_rows_f32(
        ptrs,
        lens.ctypes.data,
        n,
        pad_len,
        float(pad_value),
        out.ctypes.data,
        mask.ctypes.data if with_mask else None,
    )
    return out, mask


def pad_rows_fill(
    rows: List[Optional[np.ndarray]], pad_len: int, fill: float
) -> np.ndarray:
    lib = get_lib()
    n = len(rows)
    lens = np.asarray(
        [0 if r is None else int(np.asarray(r).reshape(-1).shape[0]) for r in rows],
        dtype=np.int64,
    )
    flat = [
        None if r is None else np.asarray(r, np.float32).reshape(-1)
        for r in rows
    ]
    out = np.empty((n, pad_len), np.float32)
    ptrs, keep = _row_pointers(flat)
    lib.pad_rows_fill_f32(
        ptrs, lens.ctypes.data, n, pad_len, float(fill),
        out.ctypes.data,
    )
    return out


def pad_seq2d(
    rows: List[Optional[np.ndarray]],
    pad_len: int,
    width: int,
    fill: float,
    clean: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Native path of EmbeddedSequenceCollator (tokens + length mask)."""
    lib = get_lib()
    n = len(rows)
    rows2 = [
        None
        if r is None
        else np.ascontiguousarray(r, np.float32)
        for r in rows
    ]
    lens = np.asarray(
        [0 if r is None else r.shape[0] for r in rows2], np.int64
    )
    out = np.empty((n, pad_len, width), np.float32)
    mask = np.empty((n, pad_len), np.bool_)
    ptrs, keep = _row_pointers(rows2)
    lib.pad_seq2d_f32(
        ptrs,
        lens.ctypes.data,
        n,
        pad_len,
        width,
        float(fill),
        1 if clean else 0,
        out.ctypes.data,
        mask.ctypes.data,
    )
    return out, mask
