# -*- coding: utf-8 -*-
"""Native (C++) host-side runtime, loaded over a C ABI via ctypes.

The reference keeps its performance-critical host work in C++ (the HODLR tree
construction in include/george/hodlr.h, the kernel bridge in
kernel_interface.cpp) behind pybind11.  Here the device math is XLA; the
native layer owns what stays on the host: spatial-ordering decisions that
shape the HODLR tree (see src/ordering.cpp).

The shared library is built on demand with ``g++ -O3`` the first time it is
needed and cached next to the source; every entry point has a NumPy fallback
so the package works (more slowly) without a toolchain.  Build explicitly
with ``python -m george_tpu.native.build``.
"""

import ctypes
import os
import subprocess
import tempfile
import warnings

import numpy as np

__all__ = ["distance_order", "kd_order", "hilbert_order", "have_native",
           "build", "load"]

_SRC = os.path.join(os.path.dirname(__file__), "src", "ordering.cpp")
_LIB_NAME = "_ordering.so"
_lib = None
_tried = False


def _lib_path():
    return os.path.join(os.path.dirname(__file__), _LIB_NAME)


def build(verbose=False):
    """Compile src/ordering.cpp into the package directory. Returns path."""
    out = _lib_path()
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", out]
    # Build to a temp file first so a half-written .so is never loaded.
    with tempfile.NamedTemporaryFile(
        suffix=".so", dir=os.path.dirname(out), delete=False
    ) as tmp:
        tmp_path = tmp.name
    try:
        cmd[-1] = tmp_path
        subprocess.run(cmd, check=True, capture_output=not verbose)
        os.replace(tmp_path, out)
    except BaseException:
        if os.path.exists(tmp_path):
            os.unlink(tmp_path)
        raise
    return out


def load():
    """Load (building if necessary) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = _lib_path()
    try:
        if not os.path.exists(path) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(path)
        ):
            build()
        lib = ctypes.CDLL(path)
        for name in ("gt_distance_order", "gt_kd_order"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ]
        lib.gt_hilbert_order.restype = ctypes.c_int
        lib.gt_hilbert_order.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    except Exception as exc:  # pragma: no cover - toolchain-dependent
        warnings.warn(
            "george_tpu.native: could not build/load the C++ ordering "
            "library ({0}); falling back to NumPy implementations.".format(exc)
        )
        _lib = None
    return _lib


def have_native():
    """True when the C++ library is available."""
    return load() is not None


def _call_native(fn_name, samples, *extra):
    lib = load()
    if lib is None:
        return None
    samples = np.ascontiguousarray(samples, dtype=np.float64)
    n, d = samples.shape
    out = np.empty(n, dtype=np.int64)
    rc = getattr(lib, fn_name)(
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(n), ctypes.c_int64(d), *extra,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out if rc == 0 else None


def distance_order(samples):
    """Indices ordering samples by distance from samples[0].

    Matches the reference's ``nd_sort_samples`` (utils.py:36-56, a cKDTree
    k=N query, i.e. a distance sort).
    """
    samples = np.atleast_2d(samples)
    out = _call_native("gt_distance_order", samples)
    if out is not None:
        return out
    d2 = np.sum((samples - samples[0]) ** 2, axis=1)
    return np.argsort(d2, kind="stable")


def _kd_order_numpy(samples):
    n = samples.shape[0]
    idx = np.arange(n, dtype=np.int64)

    def recurse(sl):
        m = sl.shape[0]
        if m <= 2:
            return
        sub = samples[sl]
        axis = int(np.argmax(sub.max(axis=0) - sub.min(axis=0)))
        mid = m // 2
        part = np.argpartition(sub[:, axis], mid)
        sl[:] = sl[part]
        recurse(sl[:mid])
        recurse(sl[mid:])

    recurse(idx)
    return idx


def kd_order(samples):
    """Recursive median-split (KD) ordering aligned with HODLR halving.

    At every level the first/second halves of the returned ordering are
    spatially separated clusters, which keeps the HODLR off-diagonal blocks
    numerically low-rank for multi-dimensional inputs.
    """
    samples = np.atleast_2d(samples)
    out = _call_native("gt_kd_order", samples)
    if out is not None:
        return out
    return _kd_order_numpy(samples)


def hilbert_order(samples, bits=16):
    """Hilbert space-filling-curve ordering (falls back to kd_order)."""
    samples = np.atleast_2d(samples)
    out = _call_native("gt_hilbert_order", samples, ctypes.c_int(bits))
    if out is not None:
        return out
    return kd_order(samples)
