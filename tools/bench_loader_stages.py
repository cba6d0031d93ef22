#!/usr/bin/env python
"""Per-stage host-loader accounting (VERDICT r4 #7): replaces the
"cold decode is inflate-bound, scales per core" ASSERTION with measured
per-stage times and an explicit decode-pool thread curve on this host.

Stages of one training-batch production (the DataModule producer path):

  read       raw .nii.gz bytes off disk (page cache after pass 1)
  inflate    gzip inflate + NIfTI parse + int16->f32 scale
             (native libmstio, the thread-pool stage; with libdeflate
             when present)
  transform  mask-centred random crop_or_pad(224,224,D) + flips + noise
             (LIDC __getitem__ on a pre-decoded volume)
  collate    stack dicts -> batch arrays
  cache_hit  np.load of the decode-cache .npy (the warm-epoch
             replacement for read+inflate)

plus the cold-decode vol/s at pool sizes 1/2/4/8 (on a 1-core host this
is the oversubscription penalty; on a pod host, per-core scaling).

    python tools/bench_loader_stages.py [--n 24] [--depth 32]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main(n_vols: int = 24, depth: int = 32, batch: int = 8):
    import pandas as pd

    from mst_tpu.data import native_io
    from mst_tpu.data.datamodule import _collate
    from mst_tpu.data.datasets.lidc import LIDC_Dataset3D
    from mst_tpu.utils.nifti import write_nifti

    root = Path(tempfile.mkdtemp(prefix="mst_stage_bench_"))
    try:
        rng = np.random.default_rng(0)
        rows, img_paths = [], []
        for i in range(n_vols):
            d = (root / "preprocessed_crop" / "data" / f"LIDC-IDRI-{i:04d}"
                 / f"study{i}" / f"series{i}")
            d.mkdir(parents=True)
            base = rng.normal(-400, 250, (8, 8, depth)).astype(np.float32)
            vol = np.kron(base, np.ones((32, 32, 1), np.float32))
            vol += rng.normal(0, 60, (256, 256, depth)).astype(np.float32)
            vol = np.clip(vol, -1024, 3071).astype(np.int16)
            seg = np.zeros((256, 256, depth), np.uint8)
            seg[120:136, 120:136, depth // 2 - 3:depth // 2 + 3] = 1
            aff = np.diag([0.7, 0.7, 2.5, 1.0])
            write_nifti(d / "img_0.nii.gz", vol, aff)
            write_nifti(d / "seg_0.nii.gz", seg, aff)
            img_paths.append(d / "img_0.nii.gz")
            rows.append({
                "patient_id": f"LIDC-IDRI-{i:04d}",
                "study_instance_uid": f"study{i}",
                "series_instance_uid": f"series{i}",
                "nodule_idx": 0, "annotation_num": 2,
                "Malignant": i % 2, "Fold": 0, "Split": "train",
            })
        splits = root / "preprocessed" / "splits"
        splits.mkdir(parents=True)
        pd.DataFrame(rows).to_csv(splits / "split.csv", index=False)

        out = {"n_vols": n_vols, "depth": depth,
               "libdeflate": native_io.has_libdeflate(),
               "file_mb": round(sum(p.stat().st_size
                                    for p in img_paths) / 1e6 / n_vols, 2)}

        def per_vol_ms(f, items, passes=3):
            best = float("inf")
            for _ in range(passes):
                t0 = time.perf_counter()
                for it in items:
                    f(it)
                best = min(best, (time.perf_counter() - t0) / len(items))
            return round(best * 1e3, 2)

        # stage: raw read (first call warms the page cache)
        out["read_ms"] = per_vol_ms(lambda p: p.read_bytes(), img_paths)
        # stage: inflate+parse (single-thread native decode, page-cache
        # reads included — subtract read_ms for the pure-inflate cost)
        out["inflate_parse_ms"] = per_vol_ms(
            lambda p: native_io.read_nifti(p), img_paths)

        # stage: transform + collate on pre-decoded volumes
        ds = LIDC_Dataset3D(root, split="train", fold=0,
                            image_crop=(224, 224, depth),
                            random_center=True, flip=True, noise=True)
        ds.prefetch_decode(list(range(n_vols)), num_threads=1)
        out["transform_ms"] = per_vol_ms(lambda i: ds[i], range(n_vols))
        samples = [ds[i] for i in range(batch)]
        out["collate_ms_per_vol"] = per_vol_ms(
            lambda _: _collate(samples), range(4), passes=3) / batch

        # stage: warm decode-cache hit (replaces read+inflate on epoch 2+)
        ds_c = LIDC_Dataset3D(root, split="train", fold=0,
                              image_crop=(224, 224, depth),
                              random_center=True, flip=True, noise=True,
                              decode_cache=root / "decode_cache")
        ds_c.prefetch_decode(list(range(n_vols)), num_threads=1)
        type(ds_c).flush_cache_writes()
        cache_files = sorted((root / "decode_cache").glob("*.npy"))
        out["cache_hit_ms"] = per_vol_ms(
            lambda f: np.load(f), cache_files[:n_vols])

        # decode-pool thread curve (cold path, page-cached files)
        curve = {}
        for t in (1, 2, 4, 8):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                native_io.read_nifti_batch([str(p) for p in img_paths],
                                           num_threads=t)
                best = min(best, time.perf_counter() - t0)
            curve[str(t)] = round(n_vols / best, 1)
        out["decode_pool_vols_per_sec"] = curve

        import os

        out["host_cores"] = os.cpu_count()
        total = (out["inflate_parse_ms"] + out["transform_ms"]
                 + out["collate_ms_per_vol"])
        out["cold_vol_per_sec_1thread"] = round(1e3 / total, 1)
        warm_total = (out["cache_hit_ms"] + out["transform_ms"]
                      + out["collate_ms_per_vol"])
        out["warm_vol_per_sec_1thread"] = round(1e3 / warm_total, 1)
        print(json.dumps(out, indent=1))
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--depth", type=int, default=32)
    a = ap.parse_args()
    main(a.n, a.depth)
