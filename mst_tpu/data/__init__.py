"""Dataset catalog + loading (LIDC / DUKE / MRNet / synthetic).

Dataset classes resolve lazily (PEP 562) so `import mst_tpu.data` does not
hard-depend on their optional IO libraries (DUKE pulls in h5py).
"""

from mst_tpu.data.datamodule import DataModule, balanced_weights  # noqa: F401
from mst_tpu.data.transforms import (  # noqa: F401
    AugmentConfig,
    DeviceAugment,
    crop_or_pad,
)

_DATASETS = {
    "DUKE_Dataset3D": "mst_tpu.data.datasets.duke",
    "LIDC_Dataset3D": "mst_tpu.data.datasets.lidc",
    "MRNet_Dataset3D": "mst_tpu.data.datasets.mrnet",
    "Synthetic_Dataset3D": "mst_tpu.data.datasets.synthetic",
}


def __getattr__(name):
    if name in _DATASETS:
        import importlib

        return getattr(importlib.import_module(_DATASETS[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
