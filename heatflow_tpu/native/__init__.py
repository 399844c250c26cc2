"""ctypes bindings for the native C++ mesh/assembly kernels.

The library is compiled on demand (g++ -O3 -shared) into this directory;
every entry point has a numpy fallback so the framework works without a
toolchain. ``HEATFLOW_TPU_NO_NATIVE=1`` disables the native path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "meshkernel.cpp")
_SO = os.path.join(_DIR, "libhfmeshkernel.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
             "-o", _SO],
            check=True, capture_output=True, timeout=300)
        return True
    except Exception as e:  # toolchain missing / compile error → fallback
        print(f"heatflow_tpu.native: build failed ({e}); using numpy "
              "fallback", file=sys.stderr)
        return False


def get_lib():
    """Load (building if necessary) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("HEATFLOW_TPU_NO_NATIVE") == "1":
        return None
    if not os.path.exists(_SO) or (os.path.getmtime(_SO)
                                   < os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.hf_graded_axis.restype = ctypes.c_long
    lib.hf_graded_axis.argtypes = [
        ctypes.c_double, ctypes.c_double,
        np.ctypeslib.ndpointer(np.float64), ctypes.c_long, ctypes.c_double,
        np.ctypeslib.ndpointer(np.float64), ctypes.c_long]
    lib.hf_assign_cell_tags.restype = None
    lib.hf_assign_cell_tags.argtypes = [
        np.ctypeslib.ndpointer(np.float64), ctypes.c_long,
        np.ctypeslib.ndpointer(np.float64), ctypes.c_long,
        np.ctypeslib.ndpointer(np.float64), ctypes.c_long,
        np.ctypeslib.ndpointer(np.int32)]
    lib.hf_assemble_stencils.restype = None
    lib.hf_assemble_stencils.argtypes = [
        np.ctypeslib.ndpointer(np.float64), ctypes.c_long,
        np.ctypeslib.ndpointer(np.float64), ctypes.c_long,
        np.ctypeslib.ndpointer(np.int32), ctypes.c_long,
        np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64), np.ctypeslib.ndpointer(np.float64)]
    _lib = lib
    return _lib


def native_graded_axis(lo, hi, spans, default_size) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    spans_arr = np.asarray([(a, b, h) for a, b, h in spans],
                           dtype=np.float64).reshape(-1, 3)
    cap = 16
    for s_a, s_b, s_h in spans_arr.tolist() if len(spans_arr) else []:
        cap += int((s_b - s_a) / s_h) + 4
    cap += int((hi - lo) / default_size) + 4
    out = np.empty(max(cap, 64), dtype=np.float64)
    n = lib.hf_graded_axis(lo, hi, spans_arr.ravel(), len(spans_arr),
                           default_size, out, len(out))
    if n < 0:
        out = np.empty(4 * len(out), dtype=np.float64)
        n = lib.hf_graded_axis(lo, hi, spans_arr.ravel(), len(spans_arr),
                               default_size, out, len(out))
        if n < 0:
            return None
    return out[:n].copy()


def native_assign_cell_tags(z, r, rects) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    z = np.ascontiguousarray(z, np.float64)
    r = np.ascontiguousarray(r, np.float64)
    rects = np.ascontiguousarray(rects, np.float64).reshape(-1, 4)
    tags = np.zeros((len(z) - 1, len(r) - 1), dtype=np.int32)
    lib.hf_assign_cell_tags(z, len(z), r, len(r), rects.ravel(), len(rects),
                            tags)
    return tags


def native_assemble_stencils(z, r, cell_tags, n_mats):
    """Returns (K, M, K_flat, M_flat, G_r, G_z) or None."""
    lib = get_lib()
    if lib is None:
        return None
    z = np.ascontiguousarray(z, np.float64)
    r = np.ascontiguousarray(r, np.float64)
    tags = np.ascontiguousarray(cell_tags, np.int32)
    nz, nr = len(z), len(r)
    shape = (n_mats, 7, nz, nr)
    K = np.zeros(shape)
    M = np.zeros(shape)
    Kf = np.zeros(shape)
    Mf = np.zeros(shape)
    G_r = np.zeros((7, nz, nr))
    G_z = np.zeros((7, nz, nr))
    lib.hf_assemble_stencils(z, nz, r, nr, tags, n_mats, K, M, Kf, Mf,
                             G_r, G_z)
    return K, M, Kf, Mf, G_r, G_z
