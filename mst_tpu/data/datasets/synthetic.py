"""Synthetic in-memory dataset mirroring the MST sample contract.

SURVEY.md §4 plan item (d): a fake dataset with the exact
`{uid, source, target, mask, src_key_padding_mask, affine, path}` contract
so the train / predict loops run hermetically (tests, benchmarks, CI).

Positives contain a bright Gaussian blob; a model that learns anything
drives AUC above 0.5 within a few steps, which the smoke tests assert.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from mst_tpu.data.datasets.base import Dataset3D
from mst_tpu.data.transforms import AugmentConfig


class Synthetic_Dataset3D(Dataset3D):
    LABEL = "target"

    def __init__(
        self,
        num_samples: int = 16,
        shape_cdhw: Tuple[int, int, int, int] = (1, 8, 28, 28),
        split: Optional[str] = None,
        seed: int = 0,
        flip: bool = False,
        noise: bool = False,
        with_mask: bool = True,
        blob_amplitude: float = 3.0,
    ):
        self.split = split
        self.shape = shape_cdhw
        self.flip, self.noise = flip, noise
        self.with_mask = with_mask
        rng = np.random.default_rng(seed)
        self._targets = (np.arange(num_samples) % 2).astype(int)
        self._vols = []
        self._masks = []
        C, D, H, W = shape_cdhw
        zz, yy, xx = np.meshgrid(
            np.arange(D), np.arange(H), np.arange(W), indexing="ij"
        )
        for i in range(num_samples):
            vol = rng.normal(0, 1, shape_cdhw).astype(np.float32)
            mask = np.zeros((1, D, H, W), np.uint8)
            if self._targets[i] == 1:
                cz = rng.integers(D // 4, 3 * D // 4)
                cy = rng.integers(H // 4, 3 * H // 4)
                cx = rng.integers(W // 4, 3 * W // 4)
                r2 = (zz - cz) ** 2 * 4 + (yy - cy) ** 2 + (xx - cx) ** 2
                blob = blob_amplitude * np.exp(-r2 / (2.0 * (H / 8) ** 2))
                vol[0] += blob.astype(np.float32)
                mask[0] = (blob > blob_amplitude * 0.5).astype(np.uint8)
            self._vols.append(vol)
            self._masks.append(mask)
        import pandas as pd

        self.df = pd.DataFrame({self.LABEL: self._targets})
        self.item_pointers = list(range(num_samples))

    def augment_config(self, train: bool) -> AugmentConfig:
        return AugmentConfig(
            flip=self.flip,
            noise_std=0.1 if self.noise else 0.0,
            has_mask=self.with_mask,
        )

    def __getitem__(self, index):
        sample = {
            "uid": f"synth_{index:04d}",
            "source": self._vols[index],
            "target": int(self._targets[index]),
            "affine": np.eye(4),
            "path": f"synthetic/{index:04d}",
        }
        if self.with_mask:
            sample["mask"] = self._masks[index]
            if self.split == "test":
                # two synthetic raters agreeing on the blob (mirrors LIDC's
                # per-rater masks on the test split, `dataset_3d_lidc.py:80-98`)
                sample["rater_masks"] = np.stack(
                    [self._masks[index], self._masks[index]]
                )
        return sample
