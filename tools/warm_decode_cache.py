#!/usr/bin/env python
"""Pre-warm the decoded-volume disk cache (`--decode_cache` /
`$MST_DECODE_CACHE`) before training: decode every artifact of the given
splits through the native pthread pool once, write-through to the cache,
and report the rate. Optional — the first training epoch materialises the
cache anyway — but a pod host with many cores warms the whole dataset in
parallel up front instead of riding the epoch-1 producer thread.

    python tools/warm_decode_cache.py --dataset LIDC --path_root /data/LIDC \
        --decode_cache /fast/cache [--splits train,val,test] [--threads 16]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mst_tpu.registry import get_dataset  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="LIDC",
                    choices=["LIDC", "DUKE", "MRNet"])
    ap.add_argument("--path_root", required=True)
    ap.add_argument("--decode_cache", required=True)
    ap.add_argument("--splits", default="train,val,test")
    ap.add_argument("--fold", type=int, default=0)
    ap.add_argument("--threads", type=int, default=None,
                    help="native decode pool size "
                         "(default: min(8, cores - 1), base.py caps at 8 "
                         "— pass the core count explicitly on a big host)")
    ap.add_argument("--chunk", type=int, default=32,
                    help="volumes per prefetch_decode call")
    args = ap.parse_args(argv)

    total = covered = 0
    t0 = time.perf_counter()
    for split in args.splits.split(","):
        split = split.strip()
        try:
            ds = get_dataset(args.dataset, split=split,
                             path_root=args.path_root, fold=args.fold,
                             decode_cache=args.decode_cache)
        except FileNotFoundError as e:
            print(f"{split}: skipped ({e})", flush=True)
            continue
        from mst_tpu.data import native_io

        use_native = native_io.available()
        n = len(ds)
        for lo in range(0, n, args.chunk):
            idx = list(range(lo, min(lo + args.chunk, n)))
            if use_native:
                ds.prefetch_decode(idx, num_threads=args.threads)
                # drop the in-memory prefetch so the dict stays bounded;
                # the disk write-through already happened inside
                ds._decode_cache.clear()
            else:  # pure-python decode: _read_volume write-throughs
                for i in idx:
                    ds[i]
            total += len(idx)
            print(f"\r{split}: {min(lo + args.chunk, n)}/{n}",
                  end="", flush=True)
        print(flush=True)
        # barrier: cache writes are write-behind (daemon thread); the
        # verification below reads the filesystem
        type(ds).flush_cache_writes()
        # Verify, don't trust: prefetch_decode swallows per-batch IOErrors
        # (a corrupt artifact leaves its volume uncached while the loop
        # rolls on), so count the samples whose every cache entry
        # actually exists on disk.
        split_cov = 0
        for i in range(n):
            entries = [ds._cache_file(p) for p in ds.nifti_paths(i)]
            entries += [ds._cache_file(p, str(d)) for p, d in ds.h5_items(i)]
            if entries and all(e is not None and e.exists() for e in entries):
                split_cov += 1
        covered += split_cov
        if split_cov < n:
            print(f"  WARNING {split}: only {split_cov}/{n} samples have "
                  "complete cache entries — the rest will decode at "
                  "epoch 1 (native lib missing, unsupported artifact "
                  "layout, or decode errors)", flush=True)
    dt = time.perf_counter() - t0
    print(f"warmed {total} samples, {covered} verified cached, in {dt:.1f}s "
          f"({total / max(dt, 1e-9):.1f} samples/s)", flush=True)
    return 0 if covered == total else 1


if __name__ == "__main__":
    sys.exit(main())
