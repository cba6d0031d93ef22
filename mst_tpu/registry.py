"""Model / dataset registries keyed by the reference's CLI names.

Mirrors `scripts/main_train.py:21-41` (`get_dataset`, `get_model`): the
same `--dataset {DUKE,LIDC,MRNet}` / `--model {ResNet,ResNetSliceTrans,
DinoV2ClassifierSlice,DinoV3ClassifierSlice}` surface, plus `Synthetic`
for hermetic runs. Each model entry carries the reference's default
optimizer settings (DINO classifiers train with lr=1e-6, wd=1e-2,
`mst/models/dino.py:41`; ResNets with lr=1e-4, `base_model.py:125`).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict

import jax.numpy as jnp


@dataclass
class ModelEntry:
    build: Callable[..., Any]
    learning_rate: float
    weight_decay: float = 1e-2
    defaults: Dict = field(default_factory=dict)


def _build_dino_v2(**kw):
    from mst_tpu.models.mst import dino_v2_classifier_slice

    return dino_v2_classifier_slice(**kw)


def _build_dino_v3(**kw):
    from mst_tpu.models.mst import dino_v3_classifier_slice

    return dino_v3_classifier_slice(**kw)


def _build_resnet(**kw):
    from mst_tpu.models.resnet import ResNet3DClassifier

    kw.setdefault("variant", 50)
    kw.pop("model_size", None)
    return ResNet3DClassifier(**{k: v for k, v in kw.items()
                                 if k in ResNet3DClassifier.__dataclass_fields__})


def _build_resnet_slice_trans(**kw):
    from mst_tpu.models.resnet import ResNetSliceTrans

    return ResNetSliceTrans(**{k: v for k, v in kw.items()
                               if k in ResNetSliceTrans.__dataclass_fields__})


MODELS: Dict[str, ModelEntry] = {
    "DinoV2ClassifierSlice": ModelEntry(_build_dino_v2, learning_rate=1e-6),
    "DinoV3ClassifierSlice": ModelEntry(_build_dino_v3, learning_rate=1e-6),
    "ResNet": ModelEntry(_build_resnet, learning_rate=1e-4),
    "ResNetSliceTrans": ModelEntry(_build_resnet_slice_trans, learning_rate=1e-4),
}


def get_model(name: str, dtype=jnp.float32, **overrides):
    if name not in MODELS:
        raise ValueError(
            f"unknown model {name!r}; available: {sorted(MODELS)}"
        )
    entry = MODELS[name]
    kw = dict(entry.defaults)
    kw.update(overrides)
    model = entry.build(out_ch=kw.pop("out_ch", 2), dtype=dtype, **kw)
    return model, entry


def get_dataset(name: str, split, path_root=None, **kw):
    if name == "LIDC":
        from mst_tpu.data.datasets.lidc import LIDC_Dataset3D

        return LIDC_Dataset3D(path_root, split=split, **kw)
    if name == "DUKE":
        from mst_tpu.data.datasets.duke import DUKE_Dataset3D

        return DUKE_Dataset3D(path_root, split=split, **kw)
    if name == "MRNet":
        from mst_tpu.data.datasets.mrnet import MRNet_Dataset3D

        return MRNet_Dataset3D(path_root, split=split, **kw)
    if name == "Synthetic":
        from mst_tpu.data.datasets.synthetic import Synthetic_Dataset3D

        kw.pop("random_center", None)
        kw.pop("random_rotate", None)
        kw.pop("decode_cache", None)  # in-memory dataset: nothing to cache
        seed = {"train": 0, "val": 1, "test": 2}.get(split, 3)
        return Synthetic_Dataset3D(split=split, seed=seed, **kw)
    raise ValueError(f"unknown dataset {name!r}")
