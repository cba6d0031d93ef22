"""Dataset base: split.csv filtering + the MST sample dict contract.

Every dataset yields dicts with (a superset of):
  uid, source [C, D, H, W] float32, target int, and optionally
  mask [1, D, H, W], rater_masks [R, 1, D, H, W], affine [4, 4], path,
  needs_padding_mask (bool: derive src_key_padding_mask from `mask`).

`load_split` mirrors the reference classmethod exactly
(`dataset_3d_lidc.py:104-112`): filter Fold == fold, optional Split
filter, optional seeded fractional subsample (`random_state=0`).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd

from mst_tpu.data.transforms import AugmentConfig


def load_volume_dhw(path):
    """Read a NIfTI volume as ([D, H, W] float32, affine), using the native
    C++ loader (native/mstio.cpp) when built, else the pure-Python reader.
    Both produce the torchio->torch axis order of the reference
    (`augmentations_3d.py:19-21`)."""
    from mst_tpu.data import native_io

    if native_io.available():
        return native_io.read_nifti(path)
    from mst_tpu.utils.nifti import read_nifti

    data, affine = read_nifti(path)
    if data.ndim == 4:  # [X, Y, Z, 1] -> [X, Y, Z]
        data = data[..., 0]
    return np.ascontiguousarray(
        np.transpose(np.asarray(data, np.float32), (2, 1, 0))
    ), affine


class Dataset3D:
    LABEL: str = "target"

    def __init__(self, path_root, split: Optional[str] = None):
        self.path_root = Path(path_root)
        self.split = split
        self._decode_cache = {}

    def __len__(self):
        return len(self.item_pointers)

    # -- native batch decode -------------------------------------------------

    def nifti_paths(self, index) -> list:
        """NIfTI files `__getitem__(index)` will read — the batch-decode
        protocol. Datasets without NIfTI inputs (DUKE reads HDF5) return []."""
        return []

    def h5_items(self, index) -> list:
        """(file, dataset-path) pairs `__getitem__(index)` will read from
        HDF5 — the batch-decode protocol for H5-backed datasets (DUKE)."""
        return []

    def prefetch_decode(self, indices, num_threads: Optional[int] = None) -> None:
        """Batch-decode the chunk's NIfTI files through the native pthread
        pool (native/mstio.cpp `mstio_read_batch`) into the decode cache;
        `__getitem__` consumes via `_read_volume`. The DataModule producer
        calls this once per batch so gzip-inflate parallelises across
        cores while the device computes. No-op without the native lib."""
        import os

        from mst_tpu.data import native_io

        if not native_io.available():
            return
        if num_threads is None:
            # pool size follows the host: oversubscribing a small host
            # (this dev image has 1 core) measurably HURTS zlib-bound
            # decode (tools/bench_h5.py); a TPU pod host has dozens of
            # cores and wants the parallel inflate.
            num_threads = max(1, min(8, (os.cpu_count() or 1) - 1))
        paths = []
        for i in indices:
            paths.extend(str(p) for p in self.nifti_paths(i))
        paths = [p for p in paths if p not in self._decode_cache]
        if paths:
            try:
                results = native_io.read_nifti_batch(
                    paths, num_threads=min(num_threads, len(paths)))
                self._decode_cache.update(zip(paths, results))
            except IOError:
                pass  # per-sample read raises a proper error with the path
        items = []
        for i in indices:
            items.extend((str(p), str(d)) for p, d in self.h5_items(i))
        items = [it for it in items
                 if f"{it[0]}::{it[1]}" not in self._decode_cache]
        if items:
            try:
                results = native_io.h5_read_batch(
                    items, num_threads=min(num_threads, len(items)))
                self._decode_cache.update(
                    (f"{p}::{d}", r) for (p, d), r in zip(items, results))
            except IOError:
                pass  # __getitem__ falls back to h5py with a proper error

    def _read_volume(self, path):
        """Cache-aware volume read (pops, so the cache stays bounded)."""
        out = self._decode_cache.pop(str(path), None)
        return out if out is not None else load_volume_dhw(path)

    def _read_h5(self, path, name):
        """Cache-aware HDF5 dataset read: prefetched native decode if
        present, else native h5lite, else None (caller uses h5py)."""
        out = self._decode_cache.pop(f"{path}::{name}", None)
        if out is not None:
            return out
        from mst_tpu.data import native_io

        if native_io.available():
            try:
                return native_io.h5_read(path, name)
            except IOError:
                return None  # unsupported feature: h5py fallback
        return None

    @classmethod
    def load_split(cls, filepath_or_buffer, fold: int = 0,
                   split: Optional[str] = None, fraction: Optional[float] = None):
        df = pd.read_csv(filepath_or_buffer)
        df = df[df["Fold"] == fold]
        if split is not None:
            df = df[df["Split"] == split]
        if fraction is not None:
            df = df.sample(frac=fraction, random_state=0).reset_index()
        return df

    def augment_config(self, train: bool) -> AugmentConfig:
        raise NotImplementedError

    def class_counts(self) -> np.ndarray:
        """Label value counts, for the balanced sampler weights
        (reference `main_train.py:62-68`)."""
        labels = self.df[self.LABEL].astype(int).to_numpy()
        return np.bincount(labels, minlength=2)

    def labels(self) -> np.ndarray:
        return self.df[self.LABEL].astype(int).to_numpy()
