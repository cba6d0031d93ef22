#!/usr/bin/env python
"""Visual raw-vs-transformed comparison PNG (port of reference root
`test_transform.py`): loads one sample from a dataset twice — once with the
eval pipeline, once with the full train-time augmentation — and writes a
side-by-side slice grid so transform changes can be eyeballed."""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from mst_tpu.data.transforms import DeviceAugment  # noqa: E402
from mst_tpu.registry import get_dataset  # noqa: E402
from mst_tpu.utils.functions import tensor2image  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="Synthetic")
    ap.add_argument("--path_root", default=None)
    ap.add_argument("--index", type=int, default=0)
    ap.add_argument("--out", default="results/transform_preview")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    kw = {} if args.dataset == "Synthetic" else {"path_root": args.path_root}
    ds_raw = get_dataset(args.dataset, split="train", **kw)
    ds_aug = get_dataset(args.dataset, split="train", flip=True, noise=True,
                         random_center=True, **(
                             kw if args.dataset == "Synthetic"
                             else {**kw, "random_rotate": True}))

    out = Path(args.out)
    s_raw = ds_raw[args.index]
    s_aug = ds_aug[args.index]

    key = jax.random.PRNGKey(args.seed)

    def run(ds, s, train):
        aug = DeviceAugment(ds.augment_config(train), train)
        mask = s.get("mask", np.zeros((1, *s["source"].shape[1:]), np.uint8))
        vol, _ = aug(s["source"][None], mask[None],
                     jax.random.split(key, 1))
        return np.asarray(vol)

    tensor2image(run(ds_raw, s_raw, False), out / "eval_pipeline.png")
    tensor2image(run(ds_aug, s_aug, True), out / "train_pipeline.png")
    tensor2image(s_raw["source"][None], out / "raw.png")
    print(f"wrote raw / eval / train previews -> {out}")


if __name__ == "__main__":
    main()
