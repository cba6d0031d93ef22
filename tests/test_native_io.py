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
