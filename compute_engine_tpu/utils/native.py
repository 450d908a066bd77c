"""ctypes binding for the native host library (csrc/).

Builds ``libce_host.so`` lazily with g++ the first time it is needed and
caches it next to the sources. All entry points have numpy fallbacks, so the
package works without a toolchain; with it, host-side packing (converter,
input pipelines) runs at native speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_CSRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc")


def _build_and_load():
    src = os.path.join(_CSRC, "bitpack.cc")
    out = os.path.join(_CSRC, "libce_host.so")
    if not os.path.exists(src):
        return None
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", out, src],
                check=True, capture_output=True, timeout=120)
        except (OSError, subprocess.SubprocessError):
            return None
    try:
        lib = ctypes.CDLL(out)
    except OSError:
        return None
    i64 = ctypes.c_int64
    lib.ce_bitpack_f32.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint32),
        i64, i64]
    lib.ce_bitpack_i8.argtypes = [
        ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_uint32),
        i64, i64, ctypes.c_int32]
    lib.ce_unpack_f32.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_float),
        i64, i64, ctypes.c_float, ctypes.c_float]
    return lib


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if not _TRIED:
            _LIB = _build_and_load()
            _TRIED = True
        return _LIB


def native_bitpack(x, zero_point: int = 0):
    """Native host bitpack; returns None if the library is unavailable or
    the dtype unsupported. Same semantics as ``core.bitpack.bitpack_np``."""
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x)
    cols = x.shape[-1]
    rows = int(np.prod(x.shape[:-1], dtype=np.int64)) if x.ndim > 1 else 1
    packed_cols = -(-cols // 32)
    out = np.empty((*x.shape[:-1], packed_cols), np.uint32)
    if x.dtype == np.float32:
        if zero_point != 0:
            return None
        lib.ce_bitpack_f32(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            rows, cols)
    elif x.dtype == np.int8:
        lib.ce_bitpack_i8(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            rows, cols, zero_point)
    else:
        return None
    return out


def native_unpack(packed, channels: int, zero_bit=1.0, one_bit=-1.0):
    """Native host unpack to float32; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    packed = np.ascontiguousarray(packed, np.uint32)
    rows = int(np.prod(packed.shape[:-1], dtype=np.int64)) \
        if packed.ndim > 1 else 1
    out = np.empty((*packed.shape[:-1], channels), np.float32)
    lib.ce_unpack_f32(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows, channels, zero_bit, one_bit)
    return out
