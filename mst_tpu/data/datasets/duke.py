"""DUKE breast DCE-MRI dataset (capability twin of
`mst/data/datasets/dataset_3d_duke.py`).

Reads the packed `data_compressed.h5` exactly like the reference
(`Breast_MRI_{uid:03d}/sub` + `sub_affine`, :92-98), replicates the UID
zero-padding / laterality-stripping (:75-87) and per-patient
de-duplication (:58-59), and the transform semantics: Flip(1) view fix,
CropOrPad(224,224,32) minimum-pad random-centre (host), then on-device
percentile ZNorm((0.5, 99.5), extremes-masked) -> z-rot -> flips ->
inversion -> noise(sigma<=0.25) (reference :37-49).
"""

from __future__ import annotations

from typing import Optional, Tuple

import h5py
import numpy as np

from mst_tpu.data.datasets.base import Dataset3D
from mst_tpu.data.transforms import AugmentConfig, crop_or_pad


class DUKE_Dataset3D(Dataset3D):
    LABEL = "Malignant"

    def __init__(
        self,
        path_root,
        fold: int = 0,
        split: Optional[str] = None,
        fraction: Optional[float] = None,
        flip: bool = False,
        random_rotate: bool = False,
        image_crop: Optional[Tuple[int, int, int]] = (224, 224, 32),
        random_center: bool = False,
        noise: bool = False,
        seed: int = 0,
        decode_cache=None,
    ):
        super().__init__(path_root, split, decode_cache=decode_cache)
        self.path_h5 = self.path_root / "data_compressed.h5"
        df = self.load_split(
            self.path_root / "splits" / "split.csv",
            fold=fold, split=split, fraction=fraction,
        )
        self.df = df.drop_duplicates(subset=["PatientID"], keep="first").reset_index(
            drop=True
        )
        self.item_pointers = self.df.index.tolist()
        self.crop_dhw = None if image_crop is None else (
            image_crop[2], image_crop[1], image_crop[0]
        )
        self.random_center = random_center
        self.flip, self.random_rotate, self.noise = flip, random_rotate, noise
        self.rng = np.random.default_rng(seed)

    def augment_config(self, train: bool) -> AugmentConfig:
        return AugmentConfig(
            znorm_percentiles=(0.5, 99.5),
            random_rotate=self.random_rotate,
            flip=self.flip,
            invert=self.noise,
            noise_std=0.25 if self.noise else 0.0,
        )

    @staticmethod
    def format_uid(uid) -> str:
        """'1_left' -> '001_left'; 7 -> '007' (reference :75-87)."""
        uid = str(uid)
        if "_" in uid:
            num, rest = uid.split("_", 1)
            return f"{num.zfill(3)}_{rest}"
        return uid.zfill(3)

    def _patient_id(self, index) -> str:
        item = self.df.loc[self.item_pointers[index]]
        return f"Breast_MRI_{self.format_uid(item['UID'])}"

    def h5_items(self, index) -> list:
        """Batch-decode protocol: volume + affine through the native
        h5lite reader (native/h5lite.cpp) on the prefetch thread pool."""
        pid = self._patient_id(index)
        return [(self.path_h5, f"{pid}/sub"), (self.path_h5, f"{pid}/sub_affine")]

    def __getitem__(self, index):
        idx = self.item_pointers[index]
        item = self.df.loc[idx]
        target = int(item[self.LABEL])
        uid = item["UID"]
        patient_id = self._patient_id(index)  # == the prefetch cache key

        # native h5lite fast path (prefetched or direct), h5py fallback
        data = self._read_h5(self.path_h5, f"{patient_id}/sub")
        affine = self._read_h5(self.path_h5, f"{patient_id}/sub_affine")
        if data is None or affine is None:
            with h5py.File(self.path_h5, "r") as f:
                grp = f[patient_id]
                # write-through: hosts without the native h5lite (or on h5
                # features it doesn't support) still get mmap-speed epochs
                # >= 2 from the decoded-volume cache
                if data is None:
                    data = grp["sub"][()]
                    self._cache_put(
                        self._cache_file(self.path_h5, f"{patient_id}/sub"),
                        data)
                if affine is None:
                    affine = grp["sub_affine"][()]
                    self._cache_put(
                        self._cache_file(self.path_h5,
                                         f"{patient_id}/sub_affine"),
                        affine)

        vol = np.asarray(data, np.float32)
        if vol.ndim == 3:
            vol = vol[None]
        # torchio [C, W, H, D] -> [C, D, H, W], then Flip(1) view fix
        vol = np.swapaxes(vol, 1, 3)
        vol = vol[:, :, ::-1]  # tio.Flip(1) flips the (torchio) H axis

        if self.crop_dhw is not None:
            (vol,) = crop_or_pad(
                vol, self.crop_dhw, random_center=self.random_center, rng=self.rng
            )

        sx, sy, sz = np.abs(np.diag(np.asarray(affine))[:3])
        return {
            "uid": str(uid),
            "source": vol.astype(np.float32),
            "target": target,
            "affine": affine,
            "spacing_dhw": np.array([sz, sy, sx]),
        }
