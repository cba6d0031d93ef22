#!/usr/bin/env python
"""Measure the PyTorch reference's hot path on this host (baseline anchor).

The reference repo publishes no benchmark numbers (BASELINE.md), so the
anchor is measured: the actual reference model code
(`/root/reference/mst/models/dino.py` `DinoV2ClassifierSlice`, built with
`pretrained=False` so no network access is needed) running a full
[1, 1, 32, 224, 224] LIDC-shaped volume forward on CPU torch.

Missing heavy deps of the reference environment (pytorch-lightning, MONAI,
torchvision, torchmetrics, xformers) are stubbed with minimal shims — only
what the import chain and the DINOv2-slice forward actually touch.

Writes BASELINE_measured.json at the repo root; bench.py reads it for its
`vs_baseline` field.
"""

from __future__ import annotations

import json
import sys
import time
import types
from pathlib import Path

import torch

REPO = Path(__file__).resolve().parent.parent


def _install_stubs():
    class _Anything:
        def __getattr__(self, k):
            return _Anything()

        def __call__(self, *a, **k):
            return _Anything()

    import importlib.util

    def mod(name, **attrs):
        # Only stub modules that genuinely cannot be imported — overwriting
        # a real module (e.g. transformers) would poison later importers in
        # the same process.
        if name in sys.modules:
            return sys.modules[name]
        if "." not in name:
            try:
                if importlib.util.find_spec(name) is not None:
                    return importlib.import_module(name)
            except (ValueError, ModuleNotFoundError):
                pass
        m = types.ModuleType(name)
        m.__dict__.update(attrs)
        m._mst_stub = True
        sys.modules[name] = m
        return m

    def stub_attr(m, name, value):
        # Never clobber attributes of REAL installed modules (transformers
        # exists in this image) — only fill gaps, or populate our own stubs.
        if getattr(m, "_mst_stub", False) or not hasattr(m, name):
            setattr(m, name, value)

    # pytorch_lightning: LightningModule just needs to be an nn.Module.
    class LightningModule(torch.nn.Module):
        def __init__(self, *a, **kw):
            super().__init__()

        @property
        def device(self):
            return torch.device("cpu")

        def save_hyperparameters(self, *a, **kw):
            pass

        def log(self, *a, **kw):
            pass

    mod("pytorch_lightning", LightningModule=LightningModule)

    class _Metric(torch.nn.Module):
        def __init__(self, *a, **kw):
            super().__init__()

        def update(self, *a, **kw):
            pass

        def compute(self):
            return torch.tensor(0.0)

        def reset(self):
            pass

    mod("torchmetrics", MeanSquaredError=_Metric, Accuracy=_Metric, AUROC=_Metric)
    # torchvision.models.resnet{18,34} and monai.networks.nets.resnet{18,34}:
    # a REAL torch implementation (2D or 3D via `dim`) with the shared
    # torchvision/MONAI module names (conv1/bn1/layerX.i.*/downsample/fc) so
    # the reference's ResNetSliceTrans 2D slice path AND its from-scratch 3D
    # `ResNet` path run for live random-weights parity tests (neither
    # torchvision nor MONAI is in this image; weights stay random — no
    # egress). Caveat: real MONAI's default 3D stem strides the depth axis
    # by conv1_t_stride=1 and biases the downsample convs; this stub keeps
    # the torchvision topology in 3D, which is also what
    # `mst_tpu.models.resnet.ResNetBackbone` implements — the parity under
    # test is the classifier/Grad-CAM++ pipeline on shared random weights,
    # not MedicalNet checkpoint loading (that layout is covered by
    # `convert_torch_resnet`'s MONAI key mapping + its unit test).
    def _nd(dim):
        if dim == 3:
            return (torch.nn.Conv3d, torch.nn.BatchNorm3d,
                    torch.nn.MaxPool3d, torch.nn.AdaptiveAvgPool3d)
        return (torch.nn.Conv2d, torch.nn.BatchNorm2d,
                torch.nn.MaxPool2d, torch.nn.AdaptiveAvgPool2d)

    class _TVBasicBlock(torch.nn.Module):
        def __init__(self, inplanes, planes, stride=1, dim=2):
            super().__init__()
            Conv, BN, _, _ = _nd(dim)
            self.conv1 = Conv(inplanes, planes, 3, stride, 1, bias=False)
            self.bn1 = BN(planes)
            self.relu = torch.nn.ReLU(inplace=True)
            self.conv2 = Conv(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = BN(planes)
            self.downsample = None
            if stride != 1 or inplanes != planes:
                self.downsample = torch.nn.Sequential(
                    Conv(inplanes, planes, 1, stride, bias=False),
                    BN(planes))

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return self.relu(y + idn)

    class _TVResNet(torch.nn.Module):
        def __init__(self, counts, num_classes=1000, dim=2, in_ch=3):
            super().__init__()
            Conv, BN, MaxPool, AvgPool = _nd(dim)
            self.conv1 = Conv(in_ch, 64, 7, 2, 3, bias=False)
            self.bn1 = BN(64)
            self.relu = torch.nn.ReLU(inplace=True)
            self.maxpool = MaxPool(3, 2, 1)
            widths = (64, 128, 256, 512)
            inp = 64
            for s, (w, n) in enumerate(zip(widths, counts)):
                blocks = []
                for i in range(n):
                    stride = 2 if (i == 0 and s > 0) else 1
                    blocks.append(_TVBasicBlock(inp, w, stride, dim=dim))
                    inp = w
                setattr(self, f"layer{s + 1}", torch.nn.Sequential(*blocks))
            self.avgpool = AvgPool(1)
            self.fc = torch.nn.Linear(512, num_classes)

        def forward(self, x):
            y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for s in range(4):
                y = getattr(self, f"layer{s + 1}")(y)
            y = torch.flatten(self.avgpool(y), 1)
            return self.fc(y)

    def _tv_factory(counts):
        def make(weights=None, **kw):
            del weights, kw  # random init; no egress for real weights
            return _TVResNet(counts)
        return make

    def _monai_factory(counts):
        # MONAI resnet signature subset used by the reference's
        # from-scratch path (`mst/models/resnet.py:51-53`)
        def make(n_input_channels=3, spatial_dims=3, num_classes=400, **kw):
            del kw  # kwargs_resnet passthrough (empty in the reference CLI)
            return _TVResNet(counts, num_classes=num_classes,
                             dim=spatial_dims, in_ch=n_input_channels)
        return make

    mod("monai")
    mod("monai.networks")
    nets = mod("monai.networks.nets")
    stub_attr(nets, "ResNetFeatures", _Anything())
    stub_attr(nets, "resnet18", _monai_factory((2, 2, 2, 2)))
    stub_attr(nets, "resnet34", _monai_factory((3, 4, 6, 3)))
    for name in ("resnet50", "resnet101", "resnet152"):  # bottleneck: unused
        stub_attr(nets, name, _Anything())

    mod("torchvision")
    tvm = mod("torchvision.models")
    stub_attr(tvm, "resnet18", _tv_factory((2, 2, 2, 2)))
    stub_attr(tvm, "resnet34", _tv_factory((3, 4, 6, 3)))
    for name in ("resnet50", "resnet101", "resnet152"):  # referenced eagerly
        stub_attr(tvm, name, _Anything())
    tvu = mod("torchvision.utils")
    stub_attr(tvu, "draw_segmentation_masks", _Anything())
    tf = mod("transformers")
    stub_attr(tf, "AutoImageProcessor", _Anything())
    stub_attr(tf, "AutoModel", _Anything())


def measure(batch: int = 1, depth: int = 32, hw: int = 224, iters: int = 3,
            threads: int = 0):
    _install_stubs()
    sys.path.insert(0, "/root/reference")
    from mst.models.dino import DinoV2ClassifierSlice

    if threads:
        torch.set_num_threads(threads)
    model = DinoV2ClassifierSlice(
        in_ch=1, out_ch=2, model_size="s", pretrained=False,
        slice_fusion="transformer",
    ).eval()

    vol = torch.randn(batch, 1, depth, hw, hw)
    with torch.no_grad():
        t0 = time.time()
        model(vol)
        warm = time.time() - t0
        times = []
        for _ in range(iters):
            t0 = time.time()
            model(vol)
            times.append(time.time() - t0)
    lat = sorted(times)[len(times) // 2]
    result = {
        "config": "DinoV2ClassifierSlice ViT-S/14, LIDC shape "
                  f"[{batch},1,{depth},{hw},{hw}], pretrained=False",
        "hardware": f"host CPU, torch {torch.__version__}, "
                    f"{torch.get_num_threads()} threads",
        "volume_latency_s": lat,
        "volumes_per_sec": batch / lat,
        "warmup_s": warm,
        "note": "reference implementation measured in-situ (no GPU in this "
                "environment; Lightning/MONAI stubbed at import only — the "
                "measured forward is the reference's own dino.py code path)",
    }
    (REPO / "BASELINE_measured.json").write_text(json.dumps(result, indent=2))
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    measure()
