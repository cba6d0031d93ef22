"""MRNet knee-MRI dataset (capability twin of
`mst/data/datasets/dataset_3d_mrnet.py`).

Reads `preprocessed/data/{folder}/sagittal/{uid:04d}.nii.gz` +
`preprocessed/splits/split.csv` (sagittal plane only, reference :79-80),
sorts by the label column descending like the reference (:59), and
replicates the transform chain: transpose(-1, 1), CropOrPad(150,150,32)
minimum-pad (host), then on-device Resize(224,224,32) -> percentile ZNorm
-> z-rot -> flips -> inversion -> noise(sigma<=0.25) (reference :34-51).

An all-ones background LabelMap rides through the same geometry
(reference :82-88); the per-slice key padding mask is derived downstream
as `~(mask.sum(H, W) > 0)` after the device pipeline.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from mst_tpu.data.datasets.base import Dataset3D
from mst_tpu.data.transforms import AugmentConfig, crop_or_pad


class MRNet_Dataset3D(Dataset3D):
    LABEL = "meniscus"

    def __init__(
        self,
        path_root,
        fold: int = 0,
        split: Optional[str] = None,
        fraction: Optional[float] = None,
        flip: bool = False,
        random_rotate: bool = False,
        random_center: bool = False,
        noise: bool = False,
        label: Optional[str] = None,
        seed: int = 0,
        decode_cache=None,
    ):
        super().__init__(path_root, split, decode_cache=decode_cache)
        if label is not None:
            self.LABEL = label
        df = self.load_split(
            self.path_root / "preprocessed" / "splits" / "split.csv",
            fold=fold, split=split, fraction=fraction,
        )
        self.df = df.sort_values(self.LABEL, ascending=False).reset_index(drop=True)
        self.item_pointers = self.df.index.tolist()
        self.flip, self.random_rotate, self.noise = flip, random_rotate, noise
        self.random_center = random_center
        self.rng = np.random.default_rng(seed)

    def augment_config(self, train: bool) -> AugmentConfig:
        return AugmentConfig(
            znorm_percentiles=(0.0, 100.0),
            resize_to=(32, 224, 224),
            random_rotate=self.random_rotate,
            flip=self.flip,
            invert=self.noise,
            noise_std=0.25 if self.noise else 0.0,
            has_mask=True,
        )

    def nifti_paths(self, index) -> list:
        item = self.df.loc[self.item_pointers[index]]
        return [self.path_root / "preprocessed" / "data" / item["Folder"]
                / "sagittal" / f"{int(item['ID']):04d}.nii.gz"]

    def __getitem__(self, index):
        idx = self.item_pointers[index]
        item = self.df.loc[idx]
        uid = int(item["ID"])
        target = int(item[self.LABEL])

        dhw, affine = self._read_volume(self.nifti_paths(index)[0])
        # The stored [X=S, Y, Z] stack's X axis is the slice axis (step1
        # writes npy [S, H, W] as NIfTI [S, H, W]); the reference's
        # transpose(-1, 1) + tensor swap nets out to swapping our H/W back:
        vol = np.swapaxes(dhw, 0, 2)[None]  # [1, S, W, H] -> match torchio
        vol = np.swapaxes(vol, 2, 3)
        mask_bg = np.ones_like(vol, dtype=np.uint8)[:1]

        vol, mask_bg = crop_or_pad(
            vol, (32, 150, 150), mask=None,
            random_center=self.random_center, rng=self.rng, extra=[mask_bg],
        )

        # [D, H, W] = [X, Z, Y] after the transposes above.
        sx, sy, sz = np.abs(np.diag(affine)[:3])
        return {
            "uid": uid,
            "source": vol.astype(np.float32),
            "mask": mask_bg.astype(np.uint8),
            "target": target,
            "affine": affine,
            "spacing_dhw": np.array([sx, sz, sy]),
            "needs_padding_mask": True,
        }

    def load_id(self, id):
        index = self.df[self.df["ID"] == id].index[0]
        return self[index]
