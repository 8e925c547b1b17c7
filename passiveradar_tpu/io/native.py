"""ctypes bindings for the native ingest kernels (native/pr_io.cc).

The shared library is built on demand with g++ (no pip packages involved);
every entry point has a numpy fallback so the framework works without a
compiler, just slower on weak hosts.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "pr_io.cc")
_LIB = os.path.join(_REPO_ROOT, "native", "libpr_io.so")

_lib = None
_tried = False


def build_library(force: bool = False) -> str | None:
    """Compile native/pr_io.cc → libpr_io.so. Returns the path or None."""
    if not os.path.exists(_SRC):
        return None
    if os.path.exists(_LIB) and not force and (
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
        return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", _LIB, _SRC],
            check=True, capture_output=True)
        return _LIB
    except (OSError, subprocess.CalledProcessError):
        return None


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    path = build_library()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.pr_i16_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_float]
        lib.pr_f32_demux2.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
        lib.pr_i16_demux2.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_size_t, ctypes.c_float]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def i16_to_f32(x: np.ndarray, scale: float = 1.0) -> np.ndarray:
    """int16 stream → float32 (native when available)."""
    x = np.ascontiguousarray(x, np.int16)
    out = np.empty(x.size, np.float32)
    lib = _load()
    if lib is not None:
        lib.pr_i16_to_f32(x.ctypes.data, out.ctypes.data, x.size,
                          ctypes.c_float(scale))
    else:
        np.multiply(x, scale, out=out, casting="unsafe")
    return out.reshape(x.shape)


def demux2(x: np.ndarray, scale: float = 1.0):
    """[refI, refQ, srvI, srvQ, ...] stream → (ref, srv) complex64 arrays.

    Implements the reference's interleaved-capture channel split
    (main.py:59-65: deinterleave to complex, then de-interleave channels).
    Accepts float32 or int16 input.
    """
    n_pairs = x.size // 4
    ref = np.empty(2 * n_pairs, np.float32)
    srv = np.empty(2 * n_pairs, np.float32)
    lib = _load()
    if x.dtype == np.int16:
        x = np.ascontiguousarray(x[:4 * n_pairs])
        if lib is not None:
            lib.pr_i16_demux2(x.ctypes.data, ref.ctypes.data, srv.ctypes.data,
                              n_pairs, ctypes.c_float(scale))
        else:
            xf = x.astype(np.float32) * scale
            quads = xf.reshape(n_pairs, 4)
            ref = quads[:, :2].reshape(-1).copy()
            srv = quads[:, 2:].reshape(-1).copy()
    else:
        x = np.ascontiguousarray(x[:4 * n_pairs], np.float32)
        if lib is not None:
            lib.pr_f32_demux2(x.ctypes.data, ref.ctypes.data, srv.ctypes.data,
                              n_pairs)
        else:
            quads = x.reshape(n_pairs, 4)
            ref = quads[:, :2].reshape(-1).copy()
            srv = quads[:, 2:].reshape(-1).copy()
    return ref.view(np.complex64), srv.view(np.complex64)
