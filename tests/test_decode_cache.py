"""Decoded-volume disk cache (`decode_cache=` / `$MST_DECODE_CACHE`).

Training revisits the same artifacts every epoch; the cache materialises
each decode once (raw .npy, content-keyed on path+mtime+size) so
later epochs skip gzip-inflate/NIfTI-parse. These tests prove:
value-exactness vs uncached reads, that cache hits really bypass the
source files, prefetch write-through, source-edit invalidation, and
corruption recovery.
"""

import numpy as np
import pandas as pd
import pytest

from mst_tpu.data.datasets.base import Dataset3D
from mst_tpu.data.datasets.lidc import LIDC_Dataset3D
from mst_tpu.utils.nifti import write_nifti

# Cache writes are write-behind on multi-core hosts (a daemon thread
# drains them off the producer; inline on 1-core hosts). Force the
# threaded path so this module exercises it regardless of the test
# host's core count; the on-disk assertions then need the barrier.
flush = Dataset3D.flush_cache_writes


@pytest.fixture(autouse=True)
def _force_write_behind(monkeypatch):
    monkeypatch.setenv("MST_CACHE_WRITE_BEHIND", "1")


def _make_lidc_tree(root, n_vols=3, depth=6):
    rng = np.random.default_rng(0)
    rows = []
    for i in range(n_vols):
        d = (root / "preprocessed_crop" / "data" / f"LIDC-IDRI-{i:04d}"
             / f"study{i}" / f"series{i}")
        d.mkdir(parents=True)
        vol = rng.normal(-200, 300, (20, 20, depth)).astype(np.int16)
        seg = np.zeros((20, 20, depth), np.uint8)
        seg[8:12, 8:12, depth // 2] = 1
        aff = np.diag([0.7, 0.7, 2.5, 1.0])
        write_nifti(d / "img_0.nii.gz", vol, aff)
        write_nifti(d / "seg_0.nii.gz", seg, aff)
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
    return root


def _lidc(root, cache):
    return LIDC_Dataset3D(root, split="train", fold=0,
                          image_crop=(16, 16, 4), decode_cache=cache)


def test_cache_values_match_uncached(tmp_path):
    root = _make_lidc_tree(tmp_path / "lidc")
    cache = tmp_path / "cache"
    plain = _lidc(root, False)
    cached = _lidc(root, cache)
    for i in range(len(plain)):
        a, b = plain[i], cached[i]  # b populates the cache
        np.testing.assert_array_equal(a["source"], b["source"])
        np.testing.assert_array_equal(a["affine"], b["affine"])
    # second instance reads back from the cache files
    flush()
    assert len(list(cache.glob("*.vol.npy"))) == 2 * len(plain)  # img + seg
    again = _lidc(root, cache)
    for i in range(len(plain)):
        np.testing.assert_array_equal(plain[i]["source"], again[i]["source"])


def test_cache_hit_served_without_reading_source(tmp_path, monkeypatch):
    """Replace the decoder with a bomb after warming: hits never decode."""
    root = _make_lidc_tree(tmp_path / "lidc")
    cache = tmp_path / "cache"
    warm = _lidc(root, cache)
    expected = [warm[i]["source"] for i in range(len(warm))]
    flush()

    import mst_tpu.data.datasets.base as base

    def bomb(path):  # pragma: no cover - failure path
        raise AssertionError(f"decoder called on cache hit: {path}")

    monkeypatch.setattr(base, "load_volume_dhw", bomb)
    fresh = _lidc(root, cache)  # no prefetch: every read is a cache hit
    for i in range(len(fresh)):
        np.testing.assert_array_equal(fresh[i]["source"], expected[i])


def test_prefetch_write_through(tmp_path):
    root = _make_lidc_tree(tmp_path / "lidc")
    cache = tmp_path / "cache"
    ds = _lidc(root, cache)
    ds.prefetch_decode(list(range(len(ds))))
    flush()
    native_built = len(list(cache.glob("*.vol.npy")))
    if native_built:  # native lib present: prefetch materialised the cache
        assert native_built == 2 * len(ds)
    # consuming the prefetched items must not double-write
    _ = [ds[i] for i in range(len(ds))]
    flush()
    assert len(list(cache.glob("*.vol.npy"))) == 2 * len(ds)
    assert len(list(cache.glob("*.tmp"))) == 0


def test_source_edit_invalidates(tmp_path):
    root = _make_lidc_tree(tmp_path / "lidc", n_vols=1)
    cache = tmp_path / "cache"
    ds = _lidc(root, cache)
    before = ds[0]["source"].copy()
    flush()
    n_before = len(list(cache.glob("*.vol.npy")))
    # rewrite the image with different contents
    img = next((root / "preprocessed_crop").rglob("img_0.nii.gz"))
    rng = np.random.default_rng(7)
    write_nifti(img, rng.normal(500, 10, (20, 20, 6)).astype(np.int16),
                np.diag([0.7, 0.7, 2.5, 1.0]))
    after = _lidc(root, cache)[0]["source"]
    flush()
    assert not np.array_equal(before, after)  # fresh decode, not stale cache
    assert len(list(cache.glob("*.vol.npy"))) > n_before  # new key materialised


def test_corrupt_cache_entry_recovers_and_self_heals(tmp_path, monkeypatch):
    root = _make_lidc_tree(tmp_path / "lidc", n_vols=1)
    cache = tmp_path / "cache"
    ds = _lidc(root, cache)
    expected = ds[0]["source"]
    flush()
    for f in cache.glob("*.vol.npy"):
        f.write_bytes(b"not an npy")
    got = _lidc(root, cache)[0]["source"]
    np.testing.assert_array_equal(got, expected)
    flush()
    # the bad entries were unlinked and REWRITTEN by the fallback decode —
    # a later read must be a pure cache hit again (not a perpetual
    # re-decode): prove it with a bomb decoder
    import mst_tpu.data.datasets.base as base

    def bomb(path):  # pragma: no cover - failure path
        raise AssertionError(f"decoder called after self-heal: {path}")

    monkeypatch.setattr(base, "load_volume_dhw", bomb)
    healed = _lidc(root, cache)[0]["source"]
    np.testing.assert_array_equal(healed, expected)


def _make_duke_tree(tmp_path, h5py):
    rng = np.random.default_rng(0)
    root = tmp_path / "duke"
    (root / "splits").mkdir(parents=True)
    with h5py.File(root / "data_compressed.h5", "w") as f:
        for i in range(1, 3):
            g = f.create_group(f"Breast_MRI_{i:03d}")
            g.create_dataset("sub", data=rng.normal(500, 100, (1, 12, 10, 6))
                             .astype(np.float32), compression="gzip")
            g.create_dataset("sub_affine", data=np.diag([0.7, 0.8, 3.0, 1.0]))
    pd.DataFrame({
        "UID": [1, 2], "PatientID": [1, 2], "Malignant": [0, 1],
        "Fold": [0, 0], "Split": ["train", "train"],
    }).to_csv(root / "splits" / "split.csv", index=False)
    return root


def test_duke_h5_cache(tmp_path):
    h5py = pytest.importorskip("h5py")
    from mst_tpu.data.datasets.duke import DUKE_Dataset3D

    root = _make_duke_tree(tmp_path, h5py)
    cache = tmp_path / "cache"
    plain = DUKE_Dataset3D(root, split="train", image_crop=(8, 8, 4),
                           decode_cache=False)
    cached = DUKE_Dataset3D(root, split="train", image_crop=(8, 8, 4),
                            decode_cache=cache)
    for i in range(len(plain)):
        np.testing.assert_array_equal(plain[i]["source"],
                                      cached[i]["source"])
    flush()
    assert len(list(cache.glob("*.npy"))) == 2 * len(plain)  # sub + affine
    again = DUKE_Dataset3D(root, split="train", image_crop=(8, 8, 4),
                           decode_cache=cache)
    for i in range(len(plain)):
        np.testing.assert_array_equal(plain[i]["source"], again[i]["source"])


def test_env_var_enables_cache(tmp_path, monkeypatch):
    root = _make_lidc_tree(tmp_path / "lidc", n_vols=1)
    cache = tmp_path / "env_cache"
    monkeypatch.setenv("MST_DECODE_CACHE", str(cache))
    ds = LIDC_Dataset3D(root, split="train", fold=0, image_crop=(16, 16, 4))
    _ = ds[0]
    flush()
    assert len(list(cache.glob("*.vol.npy"))) == 2
    # explicit False wins over the env var
    off = _lidc(root, False)
    assert off._cache_dir is None


def test_warm_tool_verifies_coverage(tmp_path, monkeypatch, capsys):
    """tools/warm_decode_cache.py must VERIFY cache entries exist rather
    than trust prefetch (which swallows IOErrors / no-ops without the
    native lib): exit 0 + full coverage when writes happen, exit 1 + a
    warning when they silently don't."""
    import sys
    from pathlib import Path as P

    sys.path.insert(0, str(P(__file__).resolve().parent.parent / "tools"))
    import warm_decode_cache

    root = _make_lidc_tree(tmp_path / "lidc", n_vols=2)
    cache = tmp_path / "cache"
    rc = warm_decode_cache.main([
        "--dataset", "LIDC", "--path_root", str(root),
        "--decode_cache", str(cache), "--splits", "train"])
    out = capsys.readouterr().out
    assert rc == 0 and "2 verified cached" in out and "WARNING" not in out
    assert len(list(cache.glob("*.vol.npy"))) == 4  # img + seg per volume

    # sabotage every write path: a fresh cache dir stays empty -> must
    # report the gap instead of claiming success
    import mst_tpu.data.datasets.base as base

    monkeypatch.setattr(base.Dataset3D, "_cache_put_volume",
                        classmethod(lambda cls, *a, **k: None))
    monkeypatch.setattr(base.Dataset3D, "_cache_put",
                        classmethod(lambda cls, *a, **k: None))
    rc = warm_decode_cache.main([
        "--dataset", "LIDC", "--path_root", str(root),
        "--decode_cache", str(tmp_path / "cache2"), "--splits", "train"])
    out = capsys.readouterr().out
    assert rc == 1 and "WARNING train: only 0/2" in out


def test_duke_h5py_fallback_writes_through(tmp_path, monkeypatch):
    """Hosts WITHOUT the native h5lite (or on unsupported h5 features)
    must still populate the decode cache through the h5py fallback, and
    later reads must be pure cache hits (duke.py:96-111)."""
    h5py = pytest.importorskip("h5py")
    from mst_tpu.data import native_io
    from mst_tpu.data.datasets.duke import DUKE_Dataset3D

    root = _make_duke_tree(tmp_path, h5py)
    cache = tmp_path / "cache"
    monkeypatch.setattr(native_io, "available", lambda: False)
    warm = DUKE_Dataset3D(root, split="train", image_crop=(8, 8, 4),
                          decode_cache=cache)
    expected = [warm[i]["source"] for i in range(len(warm))]
    flush()
    assert len(list(cache.glob("*.npy"))) == 2 * len(warm)  # sub + affine

    def bomb(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("h5py opened on a cache hit")

    monkeypatch.setattr(h5py, "File", bomb)  # duke.py shares this module
    fresh = DUKE_Dataset3D(root, split="train", image_crop=(8, 8, 4),
                           decode_cache=cache)
    for i in range(len(fresh)):
        np.testing.assert_array_equal(fresh[i]["source"], expected[i])
