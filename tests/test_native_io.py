"""Native C++ loader (libmstio) parity vs the pure-Python NIfTI reader."""

import numpy as np
import pytest

from mst_tpu.data import native_io
from mst_tpu.utils.nifti import read_nifti, write_nifti

needs_native = pytest.mark.skipif(
    not native_io.available(), reason="libmstio not built (no toolchain)"
)


@needs_native
@pytest.mark.parametrize("dtype", [np.int16, np.uint8, np.float32, np.uint16])
def test_native_reader_parity(tmp_path, dtype):
    rng = np.random.default_rng(0)
    vol = rng.normal(100, 50, (9, 11, 7)).astype(dtype)
    aff = np.diag([0.7, 0.8, 2.0, 1.0])
    aff[:3, 3] = [4, 5, 6]
    p = tmp_path / "v.nii.gz"
    write_nifti(p, vol, aff)

    data, a = native_io.read_nifti(p)
    ref, _ = read_nifti(p)
    assert data.shape == (7, 11, 9)  # [Z, Y, X] == [D, H, W]
    np.testing.assert_allclose(data, np.transpose(ref, (2, 1, 0)).astype(np.float32))
    np.testing.assert_allclose(a, aff, atol=1e-5)


@needs_native
def test_native_reader_uncompressed_and_batch(tmp_path):
    vol = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    p = tmp_path / "v.nii"
    write_nifti(p, vol)
    data, _ = native_io.read_nifti(p)
    np.testing.assert_allclose(data, np.transpose(vol, (2, 1, 0)))

    outs = native_io.read_nifti_batch([p] * 5, num_threads=3)
    assert len(outs) == 5
    for d, _ in outs:
        np.testing.assert_allclose(d, np.transpose(vol, (2, 1, 0)))


@needs_native
def test_native_reader_multimember_gzip(tmp_path):
    """pigz / concatenated-stream .nii.gz (RFC 1952 multi-member): both the
    one-shot libdeflate fast path (iterates members; first-member ISIZE is
    unknowable from the file tail, so it must fall back or resize correctly)
    and the streaming zlib fallback must decode the full payload."""
    import gzip

    vol = np.random.default_rng(3).normal(0, 50, (6, 5, 4)).astype(np.int16)
    plain = tmp_path / "v.nii"
    write_nifti(plain, vol)
    payload = plain.read_bytes()
    # even: members of equal ISIZE (fast path decodes both).  small-first:
    # big last member, fast path still fits.  big-first: the first member's
    # output exceeds the file-tail ISIZE -> the one-shot path must bail
    # (INSUFFICIENT_SPACE) and the streaming zlib fallback decode it.
    for name, cut in [("even.nii.gz", len(payload) // 2),
                      ("small-first.nii.gz", 40),
                      ("big-first.nii.gz", len(payload) - 40)]:
        p = tmp_path / name
        p.write_bytes(gzip.compress(payload[:cut]) +
                      gzip.compress(payload[cut:]))
        data, _ = native_io.read_nifti(p)
        np.testing.assert_allclose(
            data, np.transpose(vol, (2, 1, 0)).astype(np.float32))


@needs_native
def test_native_reader_error_paths(tmp_path):
    with pytest.raises(IOError):
        native_io.read_nifti(tmp_path / "missing.nii.gz")
    bad = tmp_path / "bad.nii"
    bad.write_bytes(b"not a nifti at all" * 30)
    with pytest.raises(IOError):
        native_io.read_nifti(bad)


@needs_native
def test_dataset_prefetch_decode_cache(tmp_path):
    """The batch-decode protocol: prefetch_decode fills the cache via the
    native pthread pool and _read_volume consumes (then falls back to the
    per-sample reader once drained)."""
    from mst_tpu.data.datasets.base import Dataset3D

    vols = []
    paths = []
    for i in range(3):
        v = np.random.default_rng(i).normal(0, 10, (4, 5, 6)).astype(np.float32)
        p = tmp_path / f"v{i}.nii.gz"
        write_nifti(p, v)
        vols.append(np.transpose(v, (2, 1, 0)))
        paths.append(p)

    class DS(Dataset3D):
        def __init__(self):
            super().__init__(tmp_path)

        def nifti_paths(self, index):
            return [paths[index]]

    ds = DS()
    ds.prefetch_decode([0, 1, 2], num_threads=2)
    assert len(ds._decode_cache) == 3
    for i in range(3):
        d, _ = ds._read_volume(paths[i])
        np.testing.assert_allclose(d, vols[i])
    assert not ds._decode_cache  # popped on read
    d, _ = ds._read_volume(paths[0])  # cold path still works
    np.testing.assert_allclose(d, vols[0])


# ---------------------------------------------------------------------------
# native HDF5 reader (native/h5lite.cpp)
# ---------------------------------------------------------------------------


@needs_native
def test_h5_reader_formats(tmp_path):
    """h5lite vs h5py across the format features libhdf5 writes: old-style
    groups + v1 chunk B-tree (h5py default), new-style groups + v4 indexes
    (libver='latest'), gzip/shuffle filters, contiguous f64, ints,
    edge-clipped chunks."""
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(0)
    vol = rng.normal(size=(1, 96, 64, 32)).astype(np.float32)
    big = rng.normal(size=(7, 130, 61)).astype(np.float32)
    aff = np.diag([0.7, 0.7, 3.0, 1.0])
    ints = rng.integers(-500, 500, size=(5, 9)).astype(np.int16)

    p0 = tmp_path / "default.h5"
    with h5py.File(p0, "w") as f:
        g = f.create_group("Breast_MRI_001")
        g.create_dataset("sub", data=vol, compression="gzip", compression_opts=4)
        g.create_dataset("sub_affine", data=aff)
        f.create_dataset("edge", data=big, chunks=(3, 37, 16), compression="gzip")
        f.create_dataset("shuf", data=big, compression="gzip", shuffle=True)
        f.create_dataset("ints", data=ints)
        f.create_dataset("raw_chunks", data=big, chunks=(4, 50, 30))

    r = native_io.h5_read(p0, "Breast_MRI_001/sub")
    assert r.dtype == np.float32
    np.testing.assert_array_equal(r, vol)
    a = native_io.h5_read(p0, "/Breast_MRI_001/sub_affine")
    assert a.dtype == np.float64
    np.testing.assert_array_equal(a, aff)
    np.testing.assert_array_equal(native_io.h5_read(p0, "edge"), big)
    np.testing.assert_array_equal(native_io.h5_read(p0, "shuf"), big)
    np.testing.assert_array_equal(native_io.h5_read(p0, "ints"), ints)
    np.testing.assert_array_equal(native_io.h5_read(p0, "raw_chunks"), big)

    p1 = tmp_path / "latest.h5"
    with h5py.File(p1, "w", libver="latest") as f:
        g = f.create_group("grp")
        g.create_dataset("x", data=big, compression="gzip")          # fixed array
        g.create_dataset("one", data=big, chunks=big.shape,
                         compression="gzip")                          # single chunk
        g.create_dataset("aff", data=aff)                             # contiguous
    np.testing.assert_array_equal(native_io.h5_read(p1, "grp/x"), big)
    np.testing.assert_array_equal(native_io.h5_read(p1, "grp/one"), big)
    np.testing.assert_array_equal(native_io.h5_read(p1, "grp/aff"), aff)


@needs_native
def test_h5_reader_many_groups_and_errors(tmp_path):
    """Group B-tree with many SNOD leaves; clear errors for missing names
    and non-HDF5 files (the h5py-fallback trigger)."""
    h5py = pytest.importorskip("h5py")
    p = tmp_path / "many.h5"
    with h5py.File(p, "w") as f:
        for i in range(120):
            f.create_group(f"Breast_MRI_{i:03d}").create_dataset(
                "sub", data=np.full((2, 3), float(i), np.float32))
    for i in (0, 57, 119):
        np.testing.assert_array_equal(
            native_io.h5_read(p, f"Breast_MRI_{i:03d}/sub"),
            np.full((2, 3), float(i), np.float32))
    with pytest.raises(IOError):
        native_io.h5_read(p, "Breast_MRI_999/sub")
    bad = tmp_path / "bad.h5"
    bad.write_bytes(b"definitely not hdf5" * 10)
    with pytest.raises(IOError):
        native_io.h5_read(bad, "x")


@needs_native
def test_h5_batch_and_duke_dataset(tmp_path):
    """The pthread batch API, and the DUKE dataset reading through the
    native path (h5_items protocol + _read_h5) with identical results to
    the h5py fallback."""
    h5py = pytest.importorskip("h5py")
    import pandas as pd

    from mst_tpu.data.datasets.duke import DUKE_Dataset3D

    rng = np.random.default_rng(1)
    root = tmp_path / "duke"
    (root / "splits").mkdir(parents=True)
    vols = {}
    with h5py.File(root / "data_compressed.h5", "w") as f:
        for i in (1, 2):
            g = f.create_group(f"Breast_MRI_{i:03d}")
            v = rng.normal(size=(1, 40, 30, 8)).astype(np.float32)
            g.create_dataset("sub", data=v, compression="gzip")
            g.create_dataset("sub_affine", data=np.diag([0.7, 0.8, 3.0, 1.0]))
            vols[i] = v
    pd.DataFrame({
        "UID": [1, 2], "PatientID": [1, 2], "Malignant": [0, 1],
        "Fold": [0, 0], "Split": ["train", "train"],
    }).to_csv(root / "splits" / "split.csv", index=False)

    items = [(root / "data_compressed.h5", "Breast_MRI_001/sub"),
             (root / "data_compressed.h5", "Breast_MRI_002/sub")]
    outs = native_io.h5_read_batch(items, num_threads=2)
    np.testing.assert_array_equal(outs[0], vols[1])
    np.testing.assert_array_equal(outs[1], vols[2])

    ds = DUKE_Dataset3D(root, split="train", image_crop=(16, 16, 4))
    assert len(ds.h5_items(0)) == 2
    ds.prefetch_decode([0, 1], num_threads=2)
    assert len(ds._decode_cache) == 4
    native_sample = ds[0]
    assert len(ds._decode_cache) == 2  # index 0 drained, index 1 remains
    ds2 = DUKE_Dataset3D(root, split="train", image_crop=(16, 16, 4))
    # force the h5py fallback by emptying the native cache AND disabling lib
    import mst_tpu.data.native_io as nio
    orig = nio._lib
    nio._lib, nio._tried = None, True
    try:
        h5py_sample = ds2[0]
    finally:
        nio._lib, nio._tried = orig, True
    np.testing.assert_array_equal(native_sample["source"], h5py_sample["source"])
    np.testing.assert_array_equal(native_sample["affine"], h5py_sample["affine"])
    assert native_sample["target"] == h5py_sample["target"]


@needs_native
def test_h5_reader_corruption_fuzz(tmp_path):
    """Randomly corrupted HDF5 files must produce Python IOErrors (or,
    when the corruption leaves metadata self-consistent, wrong-but-bounded
    data) — never a native crash. Guards the mmap bounds checks."""
    h5py = pytest.importorskip("h5py")
    rng = np.random.default_rng(0)
    base = tmp_path / "base.h5"
    with h5py.File(base, "w") as f:
        g = f.create_group("Breast_MRI_001")
        g.create_dataset("sub", data=rng.normal(size=(1, 16, 12, 8))
                         .astype(np.float32), compression="gzip")
        g.create_dataset("sub_affine", data=np.eye(4))
    blob = bytearray(base.read_bytes())

    for trial in range(60):
        data = bytearray(blob)
        r = np.random.default_rng(trial)
        if trial % 3 == 0:  # truncate
            data = data[: int(r.integers(8, len(data)))]
        elif trial % 3 == 1:  # flip random bytes in the metadata region
            for _ in range(8):
                pos = int(r.integers(0, min(4096, len(data))))
                data[pos] = int(r.integers(0, 256))
        else:  # flip random bytes anywhere
            for _ in range(16):
                pos = int(r.integers(0, len(data)))
                data[pos] = int(r.integers(0, 256))
        p = tmp_path / f"fuzz_{trial}.h5"
        p.write_bytes(bytes(data))
        try:
            native_io.h5_read(p, "Breast_MRI_001/sub")
            native_io.h5_read(p, "Breast_MRI_001/sub_affine")
        except IOError:
            pass  # expected for most corruptions


@needs_native
def test_h5_reader_big_endian_falls_back(tmp_path):
    """Big-endian datasets must raise IOError (the h5py-fallback trigger),
    never decode as byte-swapped garbage."""
    h5py = pytest.importorskip("h5py")
    p = tmp_path / "be.h5"
    data = np.arange(6, dtype=">f4").reshape(2, 3)
    with h5py.File(p, "w") as f:
        f.create_dataset("x", data=data)
    with pytest.raises(IOError):
        native_io.h5_read(p, "x")
    # the dataset-level fallback path returns None -> caller uses h5py
    from mst_tpu.data.datasets.base import Dataset3D

    class DS(Dataset3D):
        def __init__(self):
            super().__init__(tmp_path)

    assert DS()._read_h5(p, "x") is None
