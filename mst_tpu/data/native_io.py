"""ctypes binding for the native mstio loader (native/mstio.cpp).

Auto-builds `libmstio.so` with the repo's Makefile on first use when a
toolchain is present; callers fall back to the pure-Python NIfTI reader
(`mst_tpu.utils.nifti`) when the library is unavailable, so the framework
never hard-depends on a compiler at runtime.

API:
  read_nifti(path)          -> (data [D, H, W] float32, affine [4, 4])
  read_nifti_batch(paths)   -> list of the same, decoded by a thread pool
  h5_read(path, name)       -> ndarray (native HDF5 reader, native/h5lite.cpp)
  h5_read_batch(items)      -> list of ndarrays, decoded by a thread pool
  available()               -> bool

The HDF5 reader (h5lite.cpp) covers what h5py/libhdf5 writes by default
(old/new-style groups, contiguous + gzip/shuffle-chunked datasets, v1
B-tree and v4 single/implicit/fixed-array chunk indexes); callers fall
back to h5py on IOError for anything exotic.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libmstio.so"
_lib = None
_tried = False


class _MstVolume(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.POINTER(ctypes.c_float)),
        ("shape", ctypes.c_int64 * 3),
        ("affine", ctypes.c_double * 16),
        ("ok", ctypes.c_int32),
        ("error", ctypes.c_char * 256),
    ]


class _H5Array(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.c_void_p),
        ("shape", ctypes.c_int64 * 8),
        ("rank", ctypes.c_int32),
        ("dtype", ctypes.c_int32),  # 0 = float32, 1 = float64
        ("ok", ctypes.c_int32),
        ("error", ctypes.c_char * 256),
    ]


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.mstio_read_nifti.argtypes = [ctypes.c_char_p, ctypes.POINTER(_MstVolume)]
    lib.mstio_read_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
        ctypes.POINTER(_MstVolume), ctypes.c_int32,
    ]
    lib.mstio_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.mstio_h5_read.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.POINTER(_H5Array),
    ]
    lib.mstio_h5_read_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int32, ctypes.POINTER(_H5Array), ctypes.c_int32,
    ]
    lib.mstio_h5_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def has_libdeflate() -> Optional[bool]:
    """True/False when libmstio is loaded (did libdeflate dlopen?),
    None when the native lib itself is unavailable. Bench env detail:
    cold-decode rates differ ~1.8x with/without the fast inflate path."""
    lib = _load()
    if lib is None:
        return None
    try:
        return bool(lib.mstio_has_libdeflate())
    except AttributeError:  # stale .so built before this export
        return None


def _take(vol: _MstVolume, lib) -> Tuple[np.ndarray, np.ndarray]:
    if not vol.ok:
        raise IOError(vol.error.decode(errors="replace"))
    shape = tuple(vol.shape)
    n = int(np.prod(shape))
    data = np.ctypeslib.as_array(vol.data, shape=(n,)).astype(np.float32,
                                                              copy=True)
    lib.mstio_free(vol.data)
    affine = np.asarray(vol.affine, dtype=np.float64).reshape(4, 4)
    return data.reshape(shape), affine


def read_nifti(path) -> Tuple[np.ndarray, np.ndarray]:
    """-> (data [D, H, W] float32, affine). Raises IOError on failure."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libmstio unavailable (no toolchain?)")
    vol = _MstVolume()
    lib.mstio_read_nifti(str(path).encode(), ctypes.byref(vol))
    return _take(vol, lib)


def _take_h5(arr: _H5Array, lib) -> np.ndarray:
    if not arr.ok:
        raise IOError(arr.error.decode(errors="replace"))
    shape = tuple(arr.shape[: arr.rank])
    n = int(np.prod(shape)) if arr.rank else 1
    ct = ctypes.c_double if arr.dtype else ctypes.c_float
    data = np.ctypeslib.as_array((ct * n).from_address(arr.data)).copy()
    lib.mstio_h5_free(arr.data)
    return data.reshape(shape)


def h5_read(path, name: str) -> np.ndarray:
    """Read HDF5 dataset `name` (a '/'-separated path) from `path`.
    float64 datasets come back float64; everything else float32.
    Raises IOError on failure or unsupported format features."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libmstio unavailable (no toolchain?)")
    arr = _H5Array()
    lib.mstio_h5_read(str(path).encode(), name.encode(), ctypes.byref(arr))
    return _take_h5(arr, lib)


def h5_read_batch(items: Sequence[Tuple], num_threads: int = 4) -> List:
    """items: (file_path, dataset_name) pairs, parallel-decoded by the
    native thread pool. Raises the first failure AFTER freeing every
    successful buffer."""
    lib = _load()
    if lib is None:
        raise RuntimeError("libmstio unavailable (no toolchain?)")
    n = len(items)
    arrs = (_H5Array * n)()
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p, _ in items])
    c_names = (ctypes.c_char_p * n)(*[str(d).encode() for _, d in items])
    lib.mstio_h5_read_batch(c_paths, c_names, n, arrs, num_threads)
    results, first_err = [], None
    for a, (p, d) in zip(arrs, items):
        if a.ok:
            results.append(_take_h5(a, lib))
        elif first_err is None:
            first_err = IOError(
                f"{p}:{d}: {a.error.decode(errors='replace')}")
    if first_err is not None:
        raise first_err
    return results


def read_nifti_batch(paths: Sequence, num_threads: int = 4) -> List:
    lib = _load()
    if lib is None:
        raise RuntimeError("libmstio unavailable (no toolchain?)")
    n = len(paths)
    vols = (_MstVolume * n)()
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.mstio_read_batch(c_paths, n, vols, num_threads)
    # Take (and free) EVERY successful buffer before raising on the first
    # failure — a mid-list raise would leak the remaining volumes' native
    # buffers on every retry.
    results, first_err = [], None
    for v, p in zip(vols, paths):
        if v.ok:
            results.append(_take(v, lib))
        elif first_err is None:
            first_err = IOError(
                f"{p}: {v.error.decode(errors='replace')}")
    if first_err is not None:
        raise first_err
    return results
