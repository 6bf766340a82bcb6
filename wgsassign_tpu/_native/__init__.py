"""ctypes bindings + lazy build for the native Beagle parser.

The shared library is built on first use with g++ (cached next to this
module); if no toolchain/zlib is available every caller falls back to the
pure-Python parser transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "beagle_reader.cpp")
_LIB = os.path.join(_HERE, "libbeagle_reader.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


class _BeagleResult(ctypes.Structure):
    _fields_ = [
        ("m", ctypes.c_int64),
        ("n", ctypes.c_int64),
        ("gl", ctypes.POINTER(ctypes.c_float)),
        ("sample_names", ctypes.c_char_p),
        ("site_names", ctypes.c_char_p),
        ("error", ctypes.c_char_p),
    ]


def _build() -> Optional[str]:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
        "-o", _LIB, "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (OSError, subprocess.SubprocessError):
        return None
    return _LIB


def _get_lib():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _build()
        if path is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        lib.beagle_read.restype = ctypes.POINTER(_BeagleResult)
        lib.beagle_read.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.beagle_read_range.restype = ctypes.POINTER(_BeagleResult)
        lib.beagle_read_range.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.beagle_dims.restype = ctypes.c_int
        lib.beagle_dims.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.beagle_free.restype = None
        lib.beagle_free.argtypes = [ctypes.POINTER(_BeagleResult)]
        _lib = lib
        return _lib


def read_beagle_native(path: str, n_threads: Optional[int] = None,
                       row_range=None):
    """Parse with the C++ loader; returns a BeagleData or None when the
    native library is unavailable.  Raises ValueError on malformed input.

    ``row_range=(lo, hi)`` parses only data rows lo..hi-1 (the multi-host
    per-process shard-loading window); sample names still come from the
    header, site names cover only the window.
    """
    lib = _get_lib()
    if lib is None:
        return None
    if n_threads is None:
        n_threads = max(os.cpu_count() or 1, 1)
    if row_range is None:
        res = lib.beagle_read(path.encode(), int(n_threads))
    else:
        lo, hi = row_range
        res = lib.beagle_read_range(
            path.encode(), int(n_threads), int(lo), int(hi)
        )
    if not res:
        return None
    try:
        if res.contents.error:
            raise ValueError(
                f"Malformed Beagle file {path}: {res.contents.error.decode()}"
            )
        m, n = res.contents.m, res.contents.n
        if m > 0:
            flat = np.ctypeslib.as_array(res.contents.gl, shape=(m, n, 2)).copy()
        else:  # empty row window (lo >= file rows)
            flat = np.empty((0, n, 2), dtype=np.float32)
        samples = res.contents.sample_names.decode().splitlines()
        sites = res.contents.site_names.decode().splitlines()
    finally:
        lib.beagle_free(res)

    from wgsassign_tpu.io.beagle import BeagleData

    if len(samples) != n or len(sites) != m:
        raise ValueError(f"Malformed Beagle file {path}: name/shape mismatch")
    return BeagleData(flat, samples, sites)


def beagle_dims_native(path: str):
    """Fast (header + newline count, no float parsing) dimensions scan.
    Returns ``(m_sites, n_inds)`` or None when the native library is
    unavailable.  Raises ValueError on malformed input."""
    lib = _get_lib()
    if lib is None:
        return None
    m = ctypes.c_int64()
    n = ctypes.c_int64()
    rc = lib.beagle_dims(path.encode(), ctypes.byref(m), ctypes.byref(n))
    if rc == 1:
        raise FileNotFoundError(f"Beagle file doesn't exist: {path}")
    if rc != 0:
        raise ValueError(f"Malformed Beagle file {path} (dims scan rc={rc})")
    return int(m.value), int(n.value)
