"""Dataset base: split.csv filtering + the MST sample dict contract.

Every dataset yields dicts with (a superset of):
  uid, source [C, D, H, W] float32, target int, and optionally
  mask [1, D, H, W], rater_masks [R, 1, D, H, W], affine [4, 4], path,
  needs_padding_mask (bool: derive src_key_padding_mask from `mask`).

`load_split` mirrors the reference classmethod exactly
(`dataset_3d_lidc.py:104-112`): filter Fold == fold, optional Split
filter, optional seeded fractional subsample (`random_state=0`).

Decoded-volume disk cache (`decode_cache=` / `$MST_DECODE_CACHE`):
training revisits the same volumes every epoch, and the dominant host
cost is gzip-inflate of the nii.gz / chunked-H5 artifacts (the reference
pays the full torchio decode in 24 worker processes every epoch,
`main_train.py:77`). With a cache directory set, the first decode of
each volume materialises the raw array (uncompressed .npy, content-keyed
by source path+mtime+size, dtype-compacted when lossless) and every
later epoch mmaps it back at page-cache speed — no inflate, no NIfTI
parse, no copy until the crop window. Cache size <= decoded dataset
size; stale entries from edited sources are orphaned, never served.
Writes are atomic (tmp + rename), so concurrent per-host producers can
share one cache directory.
"""

from __future__ import annotations

import hashlib
import os
import threading
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
    # class-level fallback: subclasses that skip __init__ (Synthetic builds
    # in-memory samples) still read coherent cache state
    _cache_dir: Optional[Path] = None

    def __init__(self, path_root, split: Optional[str] = None,
                 decode_cache=None):
        self.path_root = Path(path_root)
        self.split = split
        self._decode_cache = {}
        # decode_cache: None -> $MST_DECODE_CACHE; False -> disabled;
        # str/Path -> that directory.
        if decode_cache is None:
            decode_cache = os.environ.get("MST_DECODE_CACHE") or None
        self._cache_dir = None
        if decode_cache:
            self._cache_dir = Path(decode_cache)
            self._cache_dir.mkdir(parents=True, exist_ok=True)

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
        if self._cache_dir is not None:
            # Disk-cached volumes skip the native inflate entirely;
            # __getitem__ reads them back via np.load at page-cache speed.
            paths = [p for p in paths
                     if not (cf := self._cache_file(p)) or not cf.exists()]
        if paths:
            try:
                results = native_io.read_nifti_batch(
                    paths, num_threads=min(num_threads, len(paths)))
                self._decode_cache.update(zip(paths, results))
                for p, (vol, aff) in zip(paths, results):
                    self._cache_put_volume(self._cache_file(p), vol, aff)
            except IOError:
                pass  # per-sample read raises a proper error with the path
        items = []
        for i in indices:
            items.extend((str(p), str(d)) for p, d in self.h5_items(i))
        items = [it for it in items
                 if f"{it[0]}::{it[1]}" not in self._decode_cache]
        if self._cache_dir is not None:
            items = [(p, d) for p, d in items
                     if not (cf := self._cache_file(p, d)) or not cf.exists()]
        if items:
            try:
                results = native_io.h5_read_batch(
                    items, num_threads=min(num_threads, len(items)))
                self._decode_cache.update(
                    (f"{p}::{d}", r) for (p, d), r in zip(items, results))
                for (p, d), r in zip(items, results):
                    self._cache_put(self._cache_file(p, d), r)
            except IOError:
                pass  # __getitem__ falls back to h5py with a proper error

    # -- decoded-volume disk cache -------------------------------------------

    def _cache_file(self, path, name: Optional[str] = None) -> Optional[Path]:
        """Cache entry for a source file (or an (h5, dataset) pair).
        Content-keyed on resolved path + mtime_ns + size: editing the
        source orphans the old entry instead of serving stale data.
        Volumes use a `.vol.npy` + sibling `.aff.npy` pair (raw .npy reads
        back via mmap at page-cache speed — npz would re-pay zipfile
        chunking + CRC32 on every hit, measured ~13 ms/volume)."""
        if self._cache_dir is None:
            return None
        p = Path(path)
        try:
            st = p.stat()
        except OSError:
            return None
        h = hashlib.sha1(
            f"{p.resolve()}|{st.st_mtime_ns}|{st.st_size}|{name or ''}"
            .encode()).hexdigest()
        return self._cache_dir / (
            h + (".npy" if name is not None else ".vol.npy"))

    @staticmethod
    def _atomic_save(cache_file: Path, arr) -> bool:
        """Atomic .npy write (tmp + rename); best-effort — a full disk or
        racing writer never breaks the read path. The tmp name includes the
        thread id: the producer's inline-fallback write can race the
        write-behind worker on the SAME entry (both write identical content;
        distinct tmp files keep the interleaving safe)."""
        tmp = cache_file.with_name(
            f"{cache_file.name}.{os.getpid()}.{threading.get_ident()}.tmp")
        try:
            with open(tmp, "wb") as f:
                np.save(f, arr)
            os.replace(tmp, cache_file)
            return True
        except OSError:
            tmp.unlink(missing_ok=True)
            return False

    # -- write-behind worker ---------------------------------------------------
    # Cache writes can cost more than the decode they memoise (np.save of
    # an 8 MB volume measured up to ~49 ms here vs 16 ms libdeflate decode)
    # and ran on the DataModule's single producer thread, capping EPOCH-1
    # throughput at the disk's write rate. With a spare core, one daemon
    # thread drains a small queue (compaction + atomic save both move off
    # the producer); a full queue falls back to an inline write, which is
    # natural backpressure — the cache stays best-effort and bounded either
    # way. On a 1-core host the thread is pure switching overhead (A/B:
    # 22.5 inline vs 18.1 vol/s write-behind on this dev box), so writes
    # stay inline there.
    _write_queue = None  # lazily created; shared across all datasets
    _write_queue_lock = threading.Lock()

    @classmethod
    def _writer(cls):
        import queue

        # under the lock: the producer and a concurrent main-thread read
        # must agree on ONE queue, or flush_cache_writes() would only see
        # the survivor and miss the orphan's pending writes
        with Dataset3D._write_queue_lock:
            q = Dataset3D._write_queue
            if q is None:
                q = queue.Queue(maxsize=8)

                def drain():
                    while True:
                        fn = q.get()
                        try:
                            fn()
                        except Exception:
                            pass  # best-effort, like the inline path
                        finally:
                            q.task_done()

                threading.Thread(target=drain, daemon=True,
                                 name="mst-cache-writer").start()
                Dataset3D._write_queue = q
        return q

    @classmethod
    def flush_cache_writes(cls) -> None:
        """Block until every queued cache write has hit disk (tests and
        tools/warm_decode_cache.py verify entries right after reads)."""
        # grab the queue reference under the lock (a concurrent first
        # submit could otherwise publish the queue after our None read),
        # then join outside it
        with Dataset3D._write_queue_lock:
            q = Dataset3D._write_queue
        if q is not None:
            q.join()

    @classmethod
    def _submit_write(cls, write) -> None:
        import queue

        # $MST_CACHE_WRITE_BEHIND=1/0 overrides the spare-core heuristic
        # (tests force the threaded path on 1-core hosts with it)
        env = os.environ.get("MST_CACHE_WRITE_BEHIND")
        threaded = (env == "1") if env in ("0", "1") else (
            (os.cpu_count() or 1) > 1)
        if not threaded:
            write()  # no spare core: a writer thread only adds switching
            return
        try:
            cls._writer().put_nowait(write)
        except queue.Full:
            write()  # backpressure: producer pays for this one

    @classmethod
    def _cache_put(cls, cache_file: Optional[Path], arr) -> None:
        if cache_file is None or cache_file.exists():
            return
        cls._submit_write(lambda: cls._atomic_save(cache_file, arr))

    @classmethod
    def _cache_put_volume(cls, cache_file: Optional[Path], vol, affine) -> None:
        if cache_file is None or cache_file.exists():
            return

        def write():
            if cache_file.exists():  # duplicate enqueue (pending at re-decode)
                return
            v = vol
            # Exact dtype compaction (write-time only): decoded CT/seg
            # volumes are usually integral float32 — int16/uint8 storage
            # quarters the disk + page-cache footprint and converts back
            # losslessly.
            with np.errstate(invalid="ignore"):  # inf/NaN casts: compare fails
                for dt in (np.uint8, np.int16):
                    small = v.astype(dt)
                    if np.array_equal(v, small):
                        v = small
                        break
            aff_file = cache_file.with_name(
                cache_file.name[: -len(".vol.npy")] + ".aff.npy")
            # affine first: volume file existence implies a complete pair
            if cls._atomic_save(aff_file, np.asarray(affine)):
                cls._atomic_save(cache_file, v)

        cls._submit_write(write)

    def _cache_get_volume(self, path):
        cf = self._cache_file(path)
        if cf is not None and cf.exists():
            try:
                # read-only mmap: nothing downstream mutates the decoded
                # volume (every __getitem__ copies via crop/astype), so the
                # hit is zero-copy until the crop window is materialised
                vol = np.load(cf, mmap_mode="r")
                aff = np.load(cf.with_name(
                    cf.name[: -len(".vol.npy")] + ".aff.npy"))
                return vol, aff
            except Exception:
                # truncated/corrupt/half-complete entry: unlink the PAIR so
                # the fallback decode rewrites it (and prefetch stops
                # filtering the path out of the parallel batch decode)
                cf.unlink(missing_ok=True)
                cf.with_name(cf.name[: -len(".vol.npy")]
                             + ".aff.npy").unlink(missing_ok=True)
        return None

    def _read_volume(self, path):
        """Cache-aware volume read (pops, so the cache stays bounded)."""
        out = self._decode_cache.pop(str(path), None)
        if out is not None:
            return out
        out = self._cache_get_volume(path)
        if out is not None:
            return out
        out = load_volume_dhw(path)
        self._cache_put_volume(self._cache_file(path), out[0], out[1])
        return out

    def _read_h5(self, path, name):
        """Cache-aware HDF5 dataset read: prefetched native decode if
        present, else the decoded disk cache, else native h5lite, else
        None (caller uses h5py and write-throughs via _cache_put, so the
        fallback is cached too — duke.py:96-111)."""
        out = self._decode_cache.pop(f"{path}::{name}", None)
        if out is not None:
            return out
        cf = self._cache_file(path, name)
        if cf is not None and cf.exists():
            try:
                # read-only mmap (safe: consumers copy via crop/astype)
                return np.load(cf, mmap_mode="r")
            except Exception:
                pass
        from mst_tpu.data import native_io

        if native_io.available():
            try:
                out = native_io.h5_read(path, name)
            except IOError:
                return None  # unsupported feature: h5py fallback
            self._cache_put(cf, out)
            return out
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
