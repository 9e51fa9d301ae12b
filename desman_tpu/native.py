"""ctypes bindings for the native C++ counts reader (native/countsio.cpp).

``read_counts_csv_native`` is a drop-in, ~10x-faster replacement for
io.read_counts_csv on large inputs (the data-loader role the reference fills
with Python text parsing — SURVEY.md §2 'Count extraction'). The shared
library is built by ``make native``; if it is missing and a compiler is
available it is built on first use, else callers should fall back to the
pandas reader (io.read_counts_csv does not depend on this module).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from .io import CountsData

_LIB_NAME = "_libcountsio.so"
_PKG_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(os.path.dirname(_PKG_DIR), "native", "countsio.cpp")
_LIB_PATH = os.path.join(_PKG_DIR, _LIB_NAME)

_PILEUP_SRC = os.path.join(os.path.dirname(_PKG_DIR), "native", "pileupio.cpp")
_PILEUP_LIB_PATH = os.path.join(_PKG_DIR, "_libpileupio.so")

_lib = None
_pileup_lib = None


def _compile(src: str, out: str) -> str:
    subprocess.run(
        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src, "-o", out],
        check=True, capture_output=True,
    )
    return out


def _build() -> str:
    return _compile(_SRC, _LIB_PATH)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        if not os.path.exists(_SRC):
            raise RuntimeError("native source missing; use io.read_counts_csv")
        _build()
    lib = ctypes.CDLL(_LIB_PATH)
    lib.counts_open.restype = ctypes.c_void_p
    lib.counts_open.argtypes = [ctypes.c_char_p]
    lib.counts_error.restype = ctypes.c_char_p
    lib.counts_error.argtypes = [ctypes.c_void_p]
    for fn in ("counts_V", "counts_S", "counts_n_contigs"):
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.counts_fill.restype = None
    lib.counts_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 3
    for fn in ("counts_sample_name", "counts_contig_name"):
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ]
    lib.counts_close.restype = None
    lib.counts_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


_pileup_load_error = None


def _load_pileup():
    global _pileup_lib, _pileup_load_error
    if _pileup_lib is not None:
        return _pileup_lib
    if _pileup_load_error is not None:  # don't re-run a failing compile
        raise _pileup_load_error
    try:
        _pileup_lib = _load_pileup_uncached()
    except Exception as e:
        _pileup_load_error = RuntimeError(f"native pileup lib unavailable: {e}")
        raise _pileup_load_error
    return _pileup_lib


def _load_pileup_uncached():
    if not os.path.exists(_PILEUP_LIB_PATH) or (
        os.path.exists(_PILEUP_SRC)
        and os.path.getmtime(_PILEUP_SRC) > os.path.getmtime(_PILEUP_LIB_PATH)
    ):
        if not os.path.exists(_PILEUP_SRC):
            raise RuntimeError("native source missing; use pileup.read_pileup_py")
        _compile(_PILEUP_SRC, _PILEUP_LIB_PATH)
    lib = ctypes.CDLL(_PILEUP_LIB_PATH)
    lib.pileup_open.restype = ctypes.c_void_p
    lib.pileup_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.pileup_error.restype = ctypes.c_char_p
    lib.pileup_error.argtypes = [ctypes.c_void_p]
    for fn in ("pileup_V", "pileup_S", "pileup_n_contigs"):
        getattr(lib, fn).restype = ctypes.c_int64
        getattr(lib, fn).argtypes = [ctypes.c_void_p]
    lib.pileup_fill.restype = None
    lib.pileup_fill.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 4
    lib.pileup_contig_name.restype = ctypes.c_int64
    lib.pileup_contig_name.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
    ]
    lib.pileup_close.restype = None
    lib.pileup_close.argtypes = [ctypes.c_void_p]
    return lib


def pileup_available() -> bool:
    try:
        _load_pileup()
        return True
    except Exception:
        return False


def read_pileup_native(path: str, samples=None, min_baseq: int = 0) -> CountsData:
    """Parse a multi-sample mpileup file with the C++ scanner
    (native/pileupio.cpp; same semantics as pileup.read_pileup_py)."""
    lib = _load_pileup()
    h = lib.pileup_open(path.encode(), int(min_baseq))
    try:
        err = lib.pileup_error(h)
        if err:
            raise ValueError(f"{path}: {err.decode()}")
        V = lib.pileup_V(h)
        S = lib.pileup_S(h)
        if V == 0 and S == 0:
            raise ValueError(f"{path}: empty pileup")
        counts = np.empty((V, S, 4), dtype=np.int32)
        positions = np.empty(V, dtype=np.int64)
        contig_ids = np.empty(V, dtype=np.int32)
        refs = np.empty(V, dtype=np.uint8)
        lib.pileup_fill(
            h,
            counts.ctypes.data_as(ctypes.c_void_p),
            positions.ctypes.data_as(ctypes.c_void_p),
            contig_ids.ctypes.data_as(ctypes.c_void_p),
            refs.ctypes.data_as(ctypes.c_void_p),
        )
        buf = ctypes.create_string_buffer(4096)
        names = []
        for i in range(lib.pileup_n_contigs(h)):
            lib.pileup_contig_name(h, i, buf, 4096)
            names.append(buf.value.decode())
        contigs = np.array(names, dtype=object)[contig_ids]
        if samples is None:
            samples = [f"Sample{i + 1}" for i in range(S)]
        elif len(samples) != S:
            raise ValueError(
                f"{len(samples)} sample names for {S} pileup columns")
        return CountsData(counts=counts, contigs=contigs,
                          positions=positions, samples=list(samples))
    finally:
        lib.pileup_close(h)


def read_counts_csv_native(path: str) -> CountsData:
    """Parse a DESMAN counts CSV with the C++ reader."""
    lib = _load()
    h = lib.counts_open(path.encode())
    try:
        err = lib.counts_error(h)
        if err:
            raise ValueError(f"{path}: {err.decode()}")
        V = lib.counts_V(h)
        S = lib.counts_S(h)
        counts = np.empty((V, S, 4), dtype=np.int32)
        positions = np.empty(V, dtype=np.int64)
        contig_ids = np.empty(V, dtype=np.int32)
        lib.counts_fill(
            h,
            counts.ctypes.data_as(ctypes.c_void_p),
            positions.ctypes.data_as(ctypes.c_void_p),
            contig_ids.ctypes.data_as(ctypes.c_void_p),
        )
        buf = ctypes.create_string_buffer(4096)
        samples = []
        for i in range(S):
            lib.counts_sample_name(h, i, buf, 4096)
            samples.append(buf.value.decode())
        names = []
        for i in range(lib.counts_n_contigs(h)):
            lib.counts_contig_name(h, i, buf, 4096)
            names.append(buf.value.decode())
        contigs = np.array(names, dtype=object)[contig_ids]
        return CountsData(counts=counts, contigs=contigs,
                          positions=positions, samples=samples)
    finally:
        lib.counts_close(h)
