"""Dataset catalog + loading (LIDC / DUKE / MRNet / synthetic)."""

from mst_tpu.data.datamodule import DataModule, balanced_weights  # noqa: F401
from mst_tpu.data.datasets.duke import DUKE_Dataset3D  # noqa: F401
from mst_tpu.data.datasets.lidc import LIDC_Dataset3D  # noqa: F401
from mst_tpu.data.datasets.mrnet import MRNet_Dataset3D  # noqa: F401
from mst_tpu.data.datasets.synthetic import Synthetic_Dataset3D  # noqa: F401
from mst_tpu.data.transforms import AugmentConfig, DeviceAugment, crop_or_pad  # noqa: F401
