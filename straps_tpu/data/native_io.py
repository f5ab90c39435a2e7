"""ctypes bindings for the native host-IO library (native/straps_io.cpp).

Provides zero-copy .npy mmap views, multithreaded batched npy loading (the
predict path's cached-proxy reader) and deterministic native epoch shuffles.
Auto-builds the shared library with g++ on first use; every entry point has
a pure-numpy fallback so the framework works without a toolchain.
"""

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libstraps_io.so")

_MAX_DIMS = 8


class _NpyInfo(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.c_void_p),
        ("map_base", ctypes.c_void_p),
        ("map_len", ctypes.c_int64),
        ("num_elems", ctypes.c_int64),
        ("word_size", ctypes.c_int32),
        ("ndim", ctypes.c_int32),
        ("shape", ctypes.c_int64 * _MAX_DIMS),
        ("dtype_char", ctypes.c_char),
    ]


_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _build_library() -> bool:
    src = os.path.join(_NATIVE_DIR, "straps_io.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, OSError):
        return False


def get_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH) and not _build_library():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.si_open_npy.argtypes = [ctypes.c_char_p, ctypes.POINTER(_NpyInfo)]
    lib.si_open_npy.restype = ctypes.c_int
    lib.si_close_npy.argtypes = [ctypes.POINTER(_NpyInfo)]
    lib.si_load_batch_f32.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32]
    lib.si_load_batch_f32.restype = ctypes.c_int
    lib.si_shuffled_indices.argtypes = [
        ctypes.c_int64, ctypes.c_uint64, ctypes.POINTER(ctypes.c_int64)]
    _lib = lib
    return _lib


def load_npy_batch(paths: List[str], item_shape, threads: int = 8) -> np.ndarray:
    """Load many same-shaped float32 .npy files into one (N, *item_shape)
    batch buffer — multithreaded native path, numpy fallback."""
    n = len(paths)
    elems = int(np.prod(item_shape))
    # Validate every file's header against item_shape up front (cheap mmap
    # header reads): the native path only checks element COUNT, so a
    # transposed same-count file would be silently reinterpreted, and a
    # mismatched count failed without naming the offending file.
    for p in paths:
        shape = np.load(p, mmap_mode="r").shape
        if tuple(shape) != tuple(item_shape):
            raise ValueError(f"{p}: shape {tuple(shape)} != expected "
                             f"{tuple(item_shape)} (all files in a batch "
                             f"must share one shape)")
    out = np.empty((n,) + tuple(item_shape), dtype=np.float32)
    lib = get_library()
    if lib is not None:
        arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        rc = lib.si_load_batch_f32(
            arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            elems, threads)
        if rc == 0:
            return out
    for i, p in enumerate(paths):  # fallback
        out[i] = np.load(p).astype(np.float32).reshape(item_shape)
    return out


def shuffled_indices(n: int, seed: int) -> np.ndarray:
    """Deterministic epoch permutation (native xorshift Fisher-Yates;
    numpy fallback uses its own RNG — both are valid shuffles)."""
    lib = get_library()
    if lib is not None:
        out = np.empty(n, dtype=np.int64)
        lib.si_shuffled_indices(
            n, np.uint64(seed),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        return out
    return np.random.RandomState(seed).permutation(n).astype(np.int64)


def mmap_npy(path: str) -> np.ndarray:
    """Zero-copy read-only view of an .npy file (native mmap; falls back to
    np.load(mmap_mode='r'))."""
    lib = get_library()
    if lib is None:
        return np.load(path, mmap_mode="r")
    info = _NpyInfo()
    rc = lib.si_open_npy(path.encode(), ctypes.byref(info))
    if rc != 0:
        return np.load(path, mmap_mode="r")
    shape = tuple(info.shape[i] for i in range(info.ndim))
    dtype = {b"f": np.dtype(f"<f{info.word_size}"),
             b"i": np.dtype(f"<i{info.word_size}"),
             b"u": np.dtype(f"<u{info.word_size}"),
             b"b": np.dtype("bool")}[info.dtype_char]
    buf = (ctypes.c_char * (info.num_elems * info.word_size)).from_address(
        info.data)
    arr = np.frombuffer(buf, dtype=dtype).reshape(shape)
    arr.flags.writeable = False
    # Keep the mapping alive for the lifetime of the process (mmaps are
    # reclaimed by the OS at exit; ndarray instances cannot carry attrs).
    _OPEN_MAPPINGS.append(info)
    return arr


_OPEN_MAPPINGS: list = []
