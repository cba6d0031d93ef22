"""LIDC-IDRI CT lung-nodule dataset (capability twin of
`mst/data/datasets/dataset_3d_lidc.py`).

Reads the same on-disk artifacts produced by the preprocessing pipeline
(`preprocessed/splits/split.csv`, per-nodule `img_{n}.nii.gz`, consensus
`seg_{n}.nii.gz`, per-rater `seg_{n}_{r}.nii.gz` on the test split,
reference :72-101) and replicates the transform chain semantics:
mask-centred CropOrPad(224,224,32) with minimum padding + random centre
(host), then on-device Clamp(-1000,1000) -> RescaleIntensity((-1,1)) ->
RandomAffine z-rot(0..90 deg) -> RandomFlip(0,1,2) -> random inversion ->
RandomNoise(sigma<=0.1) (reference :34-51).

The reference's axis quirk `moveaxis(1, 2)` ("just for viewing", :38) swaps
W/H in torchio space; replicated here as a transpose of the H/W axes so
saliency overlays match the reference orientation.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from mst_tpu.data.datasets.base import Dataset3D
from mst_tpu.data.transforms import AugmentConfig, crop_or_pad


class LIDC_Dataset3D(Dataset3D):
    LABEL = "Malignant"

    def __init__(
        self,
        path_root,
        fold: int = 0,
        split: Optional[str] = None,
        fraction: Optional[float] = None,
        flip: bool = False,
        random_rotate: bool = False,
        image_crop: Optional[Tuple[int, int, int]] = (224, 224, 32),  # (W,H,D) as reference
        random_center: bool = False,
        noise: bool = False,
        seed: int = 0,
        decode_cache=None,
    ):
        super().__init__(path_root, split, decode_cache=decode_cache)
        self.path_root_data = self.path_root / "preprocessed_crop" / "data"
        self.df = self.load_split(
            self.path_root / "preprocessed" / "splits" / "split.csv",
            fold=fold, split=split, fraction=fraction,
        )
        self.item_pointers = self.df.index.tolist()
        # reference gives crop as (W, H, D); we store (D, H, W)
        self.crop_dhw = None if image_crop is None else (
            image_crop[2], image_crop[1], image_crop[0]
        )
        self.random_center = random_center
        self.flip, self.random_rotate, self.noise = flip, random_rotate, noise
        self.rng = np.random.default_rng(seed)

    def augment_config(self, train: bool) -> AugmentConfig:
        return AugmentConfig(
            clamp_range=(-1000.0, 1000.0),
            rescale=((-1.0, 1.0), (-1000.0, 1000.0)),
            random_rotate=self.random_rotate,
            flip=self.flip,
            invert=self.noise,
            noise_std=0.1 if self.noise else 0.0,
            # the nodule mask is consumed on host (mask-centred crop; seg
            # eval vs the untransformed test volume) — never on device
            has_mask=False,
        )

    def _sample_paths(self, index):
        uid = self.item_pointers[index]
        item = self.df.loc[uid]
        nodule_idx = item["nodule_idx"]
        rel_path = (
            Path(str(item["patient_id"]))
            / str(item["study_instance_uid"])
            / str(item["series_instance_uid"])
        )
        path_dir = self.path_root_data / rel_path
        paths = [path_dir / f"img_{nodule_idx}.nii.gz",
                 path_dir / f"seg_{nodule_idx}.nii.gz"]
        if self.split == "test":
            paths += [path_dir / f"seg_{nodule_idx}_{r}.nii.gz"
                      for r in range(int(item["annotation_num"]))]
        return uid, item, rel_path, paths

    def nifti_paths(self, index) -> list:
        return self._sample_paths(index)[3]

    def __getitem__(self, index):
        uid, item, rel_path, paths = self._sample_paths(index)
        target = int(item[self.LABEL])

        img, affine = self._read_volume(paths[0])
        seg, _ = self._read_volume(paths[1])
        vol = img[None]
        mask = (seg > 0)[None]

        rater_masks = []
        for p in paths[2:]:
            m, _ = self._read_volume(p)
            rater_masks.append((m > 0)[None])

        # Crop FIRST (on the contiguous decode layout — scans and the
        # window copy run at memcpy speed), THEN apply the reference's
        # `moveaxis(1, 2)` view fix (== H/W transpose in our layout) to the
        # small crop. Equivalent to swap-then-crop with the H/W target
        # exchanged: the transpose commutes with per-axis windowing, and no
        # RNG draw depends on axis order (LIDC's fixed-size step4 inputs
        # never pad, and the mask-centred start is deterministic).
        if self.crop_dhw is not None:
            tgt = (self.crop_dhw[0], self.crop_dhw[2], self.crop_dhw[1])
            out = crop_or_pad(
                vol, tgt, mask=mask.astype(np.uint8),
                random_center=self.random_center, rng=self.rng,
                extra=rater_masks,
            )
            vol, mask, rater_masks = out[0], out[1] > 0, [m > 0 for m in out[2:]]
        vol = np.swapaxes(vol, 2, 3)
        mask = np.swapaxes(mask, 2, 3)
        rater_masks = [np.swapaxes(m, 2, 3) for m in rater_masks]

        # Physical spacing per OUR (D, H, W) axes: volume is [Z, Y, X]
        # then H/W transposed -> (sz, sx, sy).
        sx, sy, sz = np.abs(np.diag(affine)[:3])
        sample = {
            "uid": str(uid),
            "source": vol.astype(np.float32),
            "mask": mask.astype(np.uint8),
            "target": target,
            "affine": affine,
            "spacing_dhw": np.array([sz, sx, sy]),
            "path": str(rel_path),
            "filename": paths[0].name,
        }
        if rater_masks:
            sample["rater_masks"] = np.stack(rater_masks).astype(np.uint8)
        return sample
