"""Data layer tests: crop/pad semantics, device transforms, datasets,
weighted sampling, padding-mask derivation (SURVEY §4 a, d)."""

import numpy as np
import pytest

from mst_tpu.data.datamodule import DataModule, balanced_weights
from mst_tpu.data.datasets.synthetic import Synthetic_Dataset3D
from mst_tpu.data.transforms import (
    AugmentConfig,
    DeviceAugment,
    crop_or_pad,
    rescale_intensity,
    resize_trilinear,
    rotate_z,
    znorm_percentile,
)


# -- crop_or_pad -----------------------------------------------------------


def test_crop_center():
    vol = np.arange(1 * 4 * 10 * 10, dtype=np.float32).reshape(1, 4, 10, 10)
    (out,) = crop_or_pad(vol, (4, 6, 6))
    assert out.shape == (1, 4, 6, 6)
    # torchio ceil split: crop of 4 -> start at ceil(4/2)=2
    np.testing.assert_array_equal(out, vol[:, :, 2:8, 2:8])


def test_pad_with_minimum():
    vol = np.full((1, 2, 4, 4), 5.0, np.float32)
    vol[0, 0, 0, 0] = -3.0
    (out,) = crop_or_pad(vol, (4, 4, 4))
    assert out.shape == (1, 4, 4, 4)
    assert out.min() == -3.0  # 'minimum' padding
    # ceil split: 2 pad slices -> 1 before, 1 after
    np.testing.assert_array_equal(out[:, 1:3], vol)


def test_mask_centered_crop():
    vol = np.zeros((1, 8, 16, 16), np.float32)
    mask = np.zeros((1, 8, 16, 16), np.uint8)
    mask[0, 6, 12, 12] = 1
    vol[0, 6, 12, 12] = 7.0
    out_v, out_m = crop_or_pad(vol, (4, 6, 6), mask=mask)
    assert out_m.sum() == 1  # the mask voxel stays inside the window
    assert out_v.max() == 7.0


def test_random_center_stays_valid():
    rng = np.random.default_rng(0)
    vol = np.random.default_rng(1).normal(size=(1, 8, 12, 12)).astype(np.float32)
    for _ in range(5):
        (out,) = crop_or_pad(vol, (4, 6, 6), random_center=True, rng=rng)
        assert out.shape == (1, 4, 6, 6)


def test_extra_volumes_same_window():
    vol = np.random.default_rng(0).normal(size=(1, 6, 8, 8)).astype(np.float32)
    extra = vol.copy()
    out_v, out_e = crop_or_pad(vol, (4, 4, 4), extra=[extra])
    np.testing.assert_array_equal(out_v, out_e)


# -- device intensity ops --------------------------------------------------


def test_rescale_intensity():
    import jax.numpy as jnp

    x = jnp.array([[-2000.0, -1000.0, 0.0, 1000.0, 2000.0]])
    y = np.asarray(rescale_intensity(x, (-1, 1), (-1000, 1000)))
    np.testing.assert_allclose(y, [[-1, -1, 0, 1, 1]], atol=1e-6)


def test_znorm_percentile_masks_extremes():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    vals = rng.normal(10, 2, (1, 4, 8, 8)).astype(np.float32)
    vals[0, 0, 0, 0] = 1e6  # extreme to be excluded by the mask
    out = np.asarray(znorm_percentile(jnp.asarray(vals), (0.5, 99.5)))
    inner = out[out < out.max()]
    assert abs(inner.mean()) < 0.2
    assert 0.5 < inner.std() < 1.5


def test_rotate_z_quarter_turn_moves_mass():
    import jax.numpy as jnp

    vol = np.zeros((1, 1, 9, 9), np.float32)
    vol[0, 0, 4, 7] = 1.0  # right of centre
    out = np.asarray(rotate_z(jnp.asarray(vol), jnp.pi / 2))
    assert out[0, 0].sum() == pytest.approx(1.0, abs=1e-4)
    # rotation preserves distance from centre
    y, x = np.unravel_index(out[0, 0].argmax(), (9, 9))
    assert (y - 4) ** 2 + (x - 4) ** 2 == pytest.approx(9, abs=1)


def test_resize_trilinear_shape():
    import jax.numpy as jnp

    vol = jnp.ones((2, 4, 10, 10))
    out = resize_trilinear(vol, (4, 16, 16))
    assert out.shape == (2, 4, 16, 16)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def test_device_augment_flip_applies_to_mask_too():
    import jax

    cfg = AugmentConfig(flip=True, has_mask=True)
    aug = DeviceAugment(cfg, train=True)
    vol = np.random.default_rng(0).normal(size=(2, 1, 4, 8, 8)).astype(np.float32)
    mask = (vol > 0.5).astype(np.uint8)
    keys = jax.vmap(jax.random.PRNGKey)(np.array([1, 2], np.uint32))
    out_v, out_m = aug(vol, mask, keys)
    # mask relationship preserved under identical flips
    np.testing.assert_array_equal(np.asarray(out_v) > 0.5, np.asarray(out_m))


# -- datasets / datamodule -------------------------------------------------


def test_synthetic_contract_and_balanced_weights():
    ds = Synthetic_Dataset3D(num_samples=8)
    s = ds[1]
    assert s["source"].shape == (1, 8, 28, 28)
    assert set(s) >= {"uid", "source", "target", "affine", "path", "mask"}
    w = balanced_weights(ds.labels())
    assert np.allclose(w.sum(), 1.0)  # 0.5/count per class, 2 classes


def test_weighted_sampler_respects_weights_and_seed():
    ds = Synthetic_Dataset3D(num_samples=8)
    labels = ds.labels()
    w = np.where(labels == 1, 1.0, 1e-9)
    dm = DataModule(ds_train=ds, batch_size=2, weights=w,
                    num_train_samples=8, seed=3, augment_on_device=False)
    batches = list(dm.train_dataloader())
    targets = np.concatenate([b["target"] for b in batches])
    assert (targets == 1).all()
    dm2 = DataModule(ds_train=ds, batch_size=2, weights=w,
                     num_train_samples=8, seed=3, augment_on_device=False)
    b2 = list(dm2.train_dataloader())
    assert [b["uid"] for b in batches] == [b["uid"] for b in b2]


def test_datamodule_padding_mask_derivation():
    ds = Synthetic_Dataset3D(num_samples=4)

    class PadDS(Synthetic_Dataset3D):
        def __getitem__(self, i):
            s = super().__getitem__(i)
            m = np.ones_like(s["source"], np.uint8)[:1]
            m[:, -2:] = 0  # last two slices are padding
            s["mask"] = m
            s["needs_padding_mask"] = True
            return s

    ds = PadDS(num_samples=4)
    dm = DataModule(ds_test=ds, batch_size=2)
    batch = next(iter(dm.test_dataloader()))
    assert batch["src_key_padding_mask"].shape == (2, 8)
    np.testing.assert_array_equal(
        batch["src_key_padding_mask"][:, -2:], True
    )
    np.testing.assert_array_equal(
        batch["src_key_padding_mask"][:, :-2], False
    )


def test_multihost_eval_indices_equal_shards():
    """Eval index padding must yield equal per-host batch counts even when
    the split is smaller than one global batch (np.resize tiling)."""
    from mst_tpu.data.datamodule import DataModule

    class _DS:
        def __len__(self):
            return 3

    for n, shards, bs in [(3, 4, 2), (5, 2, 4), (16, 2, 4), (1, 8, 2)]:
        dm_list = [
            DataModule(ds_val=None, batch_size=bs, shard_id=s, num_shards=shards)
            for s in range(shards)
        ]
        lens = [len(dm._eval_indices(n)) for dm in dm_list]
        assert len(set(lens)) == 1, (n, shards, bs, lens)
        assert lens[0] % bs == 0, (n, shards, bs, lens)
        # every original index appears at least once across the shards
        all_idx = np.concatenate([dm._eval_indices(n) for dm in dm_list])
        assert set(all_idx.tolist()) == set(range(n))


def test_multihost_train_indices_raise_on_zero_steps():
    from mst_tpu.data.datamodule import DataModule

    class _DS:
        def __len__(self):
            return 100

    dm = DataModule(ds_train=_DS(), batch_size=8, num_train_samples=32,
                    shard_id=0, num_shards=8)
    with pytest.raises(ValueError, match="0 steps"):
        dm._train_indices()


def test_multihost_eval_valid_mask_dedups_exactly():
    """eval_valid_mask marks exactly one occurrence of every real sample as
    valid across all shards — metrics computed over valid samples see each
    sample once, with the wrap-padding duplicates dropped."""
    from mst_tpu.data.datamodule import DataModule

    for n, shards, bs in [(3, 4, 2), (5, 2, 4), (16, 2, 4), (1, 8, 2), (7, 3, 2)]:
        dms = [
            DataModule(ds_val=None, batch_size=bs, shard_id=s, num_shards=shards)
            for s in range(shards)
        ]
        valid_count = 0
        seen = []
        for dm in dms:
            idx = dm._eval_indices(n)
            mask = dm.eval_valid_mask(n)
            assert len(idx) == len(mask), (n, shards, bs)
            valid_count += int(mask.sum())
            seen.extend(idx[mask].tolist())
        assert valid_count == n, (n, shards, bs, valid_count)
        assert sorted(seen) == list(range(n)), (n, shards, bs)
    # single-shard: everything valid
    dm = DataModule(ds_val=None, batch_size=4)
    assert dm.eval_valid_mask(5).all() and len(dm.eval_valid_mask(5)) == 5


def test_duke_datamodule_end_to_end(tmp_path):
    """DUKE through the full DataModule loop: H5 pack -> prefetch batch
    decode (native h5lite pool when built, h5py otherwise) -> collate ->
    device augmentation (percentile ZNorm) -> train batches."""
    import h5py
    import pandas as pd

    from mst_tpu.data.datasets.duke import DUKE_Dataset3D

    rng = np.random.default_rng(0)
    root = tmp_path / "duke"
    (root / "splits").mkdir(parents=True)
    with h5py.File(root / "data_compressed.h5", "w") as f:
        for i in range(1, 5):
            g = f.create_group(f"Breast_MRI_{i:03d}")
            g.create_dataset(
                "sub", data=rng.normal(500, 100, (1, 24, 20, 6))
                .astype(np.float32), compression="gzip")
            g.create_dataset("sub_affine", data=np.diag([0.7, 0.8, 3.0, 1.0]))
    pd.DataFrame({
        "UID": [1, 2, 3, 4], "PatientID": [1, 2, 3, 4],
        "Malignant": [0, 1, 0, 1], "Fold": [0] * 4, "Split": ["train"] * 4,
    }).to_csv(root / "splits" / "split.csv", index=False)

    ds = DUKE_Dataset3D(root, split="train", image_crop=(16, 16, 4),
                        flip=True, noise=True)
    dm = DataModule(ds_train=ds, batch_size=2, num_train_samples=4, seed=0)
    batches = list(dm.train_dataloader())
    assert len(batches) == 2
    for b in batches:
        assert b["source"].shape == (2, 1, 4, 16, 16)
        src = np.asarray(b["source"], np.float32)
        assert np.isfinite(src).all()
        # percentile ZNorm ran on device: per-volume stats near (0, 1)
        assert abs(float(src.mean())) < 0.5
        assert 0.3 < float(src.std()) < 2.0
        assert set(np.asarray(b["target"]).tolist()) <= {0, 1}
