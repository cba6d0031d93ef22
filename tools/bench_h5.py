#!/usr/bin/env python
"""Native h5lite vs h5py decode throughput on DUKE-shaped volumes.

The DUKE training path reads [1, 512, 256, 32] float32 gzip-chunked
volumes from one packed HDF5 file per sample (reference
`mst/data/datasets/dataset_3d_duke.py:92-98`). This measures the host-side
decode rate of:
  - h5py per-sample reads (the reference's loader path),
  - native per-sample reads (native/h5lite.cpp via ctypes),
  - the native pthread batch API (what `DataModule` prefetch uses).

Usage: python tools/bench_h5.py [--n 16] [--threads 4]
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16, help="volumes in the file")
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--shape", type=int, nargs=4, default=(1, 512, 256, 32))
    args = ap.parse_args()

    import h5py

    from mst_tpu.data import native_io

    if not native_io.available():
        print("libmstio unavailable (no toolchain?)")
        return

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as td:
        path = Path(td) / "duke_bench.h5"
        with h5py.File(path, "w") as f:
            for i in range(args.n):
                g = f.create_group(f"Breast_MRI_{i:03d}")
                # smooth-ish data so gzip ratios resemble real MRI
                v = rng.normal(size=args.shape).astype(np.float32)
                v = np.cumsum(v, axis=1).astype(np.float32)
                g.create_dataset("sub", data=v, compression="gzip",
                                 compression_opts=4)
                g.create_dataset("sub_affine",
                                 data=np.diag([0.7, 0.7, 3.0, 1.0]))
        mb = path.stat().st_size / 1e6
        vol_mb = np.prod(args.shape) * 4 / 1e6

        names = [f"Breast_MRI_{i:03d}/sub" for i in range(args.n)]

        t0 = time.perf_counter()
        with h5py.File(path, "r") as f:
            for nm in names:
                ref = f[nm][()]
        t_h5py = time.perf_counter() - t0

        t0 = time.perf_counter()
        for nm in names:
            out = native_io.h5_read(path, nm)
        t_native = time.perf_counter() - t0
        np.testing.assert_array_equal(out, ref)

        t0 = time.perf_counter()
        outs = native_io.h5_read_batch([(path, nm) for nm in names],
                                       num_threads=args.threads)
        t_batch = time.perf_counter() - t0
        np.testing.assert_array_equal(outs[-1], ref)

        print(f"file {mb:.0f} MB, {args.n} x {vol_mb:.0f} MB volumes")
        for label, t in [("h5py per-sample", t_h5py),
                         ("native per-sample", t_native),
                         (f"native batch x{args.threads}", t_batch)]:
            print(f"  {label:22s} {t:6.2f}s  "
                  f"{args.n / t:6.1f} vol/s  {args.n * vol_mb / t:7.0f} MB/s")


if __name__ == "__main__":
    main()
