"""ctypes binding for the native mstio loader (native/mstio.cpp).

Auto-builds `libmstio.so` with the repo's Makefile on first use when a
toolchain is present; callers fall back to the pure-Python NIfTI reader
(`mst_tpu.utils.nifti`) when the library is unavailable, so the framework
never hard-depends on a compiler at runtime.

API:
  read_nifti(path)          -> (data [D, H, W] float32, affine [4, 4])
  read_nifti_batch(paths)   -> list of the same, decoded by a thread pool
  available()               -> bool
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
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


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
