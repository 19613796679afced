"""ctypes binding for the reference-compatible CPU Huffman codec.

The C++ source lives in native/mgard_huffman.cpp and is compiled on first
use (g++ -O3 -shared); the resulting library is cached next to the source.
See that file for the format notes (mirrors src/compressors.cpp:316-419 of
the reference).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None

_SRC = pathlib.Path(__file__).resolve().parents[2] / "native" / \
    "mgard_huffman.cpp"
_SO = _SRC.with_suffix(".so")


def _load():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if (not _SO.exists()
                or _SO.stat().st_mtime < _SRC.stat().st_mtime):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                 str(_SRC), "-o", str(_SO)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        lib.mh_encode.restype = ctypes.c_int
        lib.mh_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.mh_decode.restype = ctypes.c_int
        lib.mh_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t,
        ]
        lib.mh_free.restype = None
        lib.mh_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return lib


def huffman_encode(q: np.ndarray):
    """Encode int64 values -> (tree bytes, hit bytes, hit_bits, miss bytes).

    ``hit bytes`` follows the reference layout: ``hit_bits/8 + 4`` bytes.
    """
    lib = _load()
    q = np.ascontiguousarray(q, dtype=np.int64)
    tree_p = ctypes.c_void_p()
    tree_n = ctypes.c_size_t()
    hit_p = ctypes.c_void_p()
    hit_bits = ctypes.c_size_t()
    miss_p = ctypes.c_void_p()
    miss_n = ctypes.c_size_t()
    rc = lib.mh_encode(
        q.ctypes.data_as(ctypes.c_void_p), q.size,
        ctypes.byref(tree_p), ctypes.byref(tree_n),
        ctypes.byref(hit_p), ctypes.byref(hit_bits),
        ctypes.byref(miss_p), ctypes.byref(miss_n))
    if rc != 0:
        raise RuntimeError(f"huffman encode failed: {rc}")
    try:
        tree = ctypes.string_at(tree_p, tree_n.value)
        hit = ctypes.string_at(hit_p, hit_bits.value // 8 + 4)
        miss = ctypes.string_at(miss_p, miss_n.value)
    finally:
        lib.mh_free(tree_p)
        lib.mh_free(hit_p)
        lib.mh_free(miss_p)
    return tree, hit, hit_bits.value, miss


def huffman_decode(tree: bytes, hit: bytes, hit_bits: int, miss: bytes,
                   n: int) -> np.ndarray:
    lib = _load()
    out = np.empty(n, dtype=np.int64)
    rc = lib.mh_decode(
        tree, len(tree), hit, hit_bits, miss, len(miss),
        out.ctypes.data_as(ctypes.c_void_p), n)
    if rc != 0:
        raise RuntimeError(f"huffman decode failed: {rc}")
    return out
