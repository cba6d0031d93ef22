#!/usr/bin/env python
"""LEARNING-CURVE parity vs the live torch reference on shared synthetic
data (VERDICT r3 #2): train the reference `DinoV2ClassifierSlice` (torch,
CPU) and our `DinoSliceClassifier` from the SAME initial weights on the
SAME synthetic dataset with matched hyperparameters, each through its OWN
full training loop — the reference's `main_train.py` semantics
(class-balanced weighted sampling with replacement, AdamW(lr, wd=1e-2),
per-epoch val AUC, best-checkpoint selection, early stopping;
`/root/reference/scripts/main_train.py:58-126`) vs our `Trainer` +
`DataModule` — and compare the val-AUC trajectories and the selected best
checkpoints. This is the in-environment stand-in for the north-star "AUC
parity on LIDC" (no real data / pretrained weights are mountable here):
it exercises exactly the semantics forward/one-step parity cannot —
sampling, LR, metric aggregation, checkpoint selection.

The two loops draw their own sampling/augmentation randomness, so the
comparison is statistical: best val AUC must agree within the bootstrap
std both predict CLIs report, and the first-epoch mean loss (identical
init, same data distribution) must agree closely.

    python tools/learning_curve_parity.py --epochs 8 --out curves.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

# Force the CPU backend BEFORE jax initialises (the axon sitecustomize pins
# jax_platforms, so env vars alone are not enough): the parity statement
# wants f32 on both sides, and the torch side is CPU-only anyway.
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

REF = Path("/root/reference")

# tiny-but-real config: full ViT-S/14 depth at 56^2 (17 tokens/slice),
# 4 slices — the largest shape the 1-core torch side trains in minutes
DEPTH, HW = 4, 56


class _Subset:
    """Index-subset view of a dataset (used to unbalance the synthetic
    train split so the class-balanced weighted sampler has real work)."""

    def __init__(self, base, idx):
        self.base, self.idx = base, list(idx)
        self.df = base.df.iloc[self.idx]

    def __len__(self):
        return len(self.idx)

    def __getitem__(self, i):
        return self.base[self.idx[i]]

    def labels(self):
        return self.base.labels()[self.idx]

    def augment_config(self, train):
        return self.base.augment_config(train)


def make_datasets(seed: int = 0):
    """Shared data: unbalanced train (28 neg / 14 pos) + balanced val.
    Weak blobs (amplitude 0.6 against N(0,1) noise) keep the task hard
    enough that the val-AUC TRAJECTORY is visible over several epochs —
    at the default amplitude both sides hit AUC 1.0 inside epoch 0 and
    the comparison degenerates."""
    from mst_tpu.data.datasets.synthetic import Synthetic_Dataset3D

    kw = dict(shape_cdhw=(1, DEPTH, HW, HW), with_mask=False,
              blob_amplitude=0.6)
    base = Synthetic_Dataset3D(num_samples=56, seed=seed, **kw)
    neg = [i for i in range(56) if base.labels()[i] == 0][:28]
    pos = [i for i in range(56) if base.labels()[i] == 1][:14]
    train = _Subset(base, sorted(neg + pos))
    val = Synthetic_Dataset3D(num_samples=24, seed=seed + 1, **kw)
    return train, val


def _collect(ds):
    xs = np.stack([ds[i]["source"] for i in range(len(ds))])
    ys = np.asarray([ds[i]["target"] for i in range(len(ds))], np.int64)
    return xs, ys


def run_torch(train_ds, val_ds, epochs: int, lr: float, seed: int,
              patience: int = 10):
    """The reference training loop, faithfully mirrored from
    `/root/reference/scripts/main_train.py` (Lightning itself is not in
    this image; the semantics are): per-sample weights 0.5/class_count
    (:62-68), WeightedRandomSampler(replacement=True, seeded generator)
    over num_samples=min(len,2000) with drop_last bs=2 (datamodule.py:
    45-57), AdamW(lr, wd=1e-2) (`base_model.py:103-110`, `dino.py:41`),
    epoch val AUC monitor, top-1 best checkpoint, early stop patience 10
    (:97-109)."""
    import torch

    from reference_baseline import _install_stubs

    _install_stubs()
    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))
    from mst.models.dino import DinoV2ClassifierSlice

    torch.manual_seed(seed)
    model = DinoV2ClassifierSlice(in_ch=1, out_ch=2, model_size="s",
                                  pretrained=False,
                                  slice_fusion="transformer")
    init_sd = {k: v.numpy().copy() for k, v in model.state_dict().items()}

    labels = train_ds.labels()
    counts = np.bincount(labels, minlength=2)
    weights = (0.5 / np.maximum(counts, 1))[labels]
    num_samples = min(len(train_ds), 2000)
    gen = torch.Generator().manual_seed(seed)
    sampler = torch.utils.data.WeightedRandomSampler(
        torch.as_tensor(weights, dtype=torch.double), num_samples,
        replacement=True, generator=gen)

    opt = torch.optim.AdamW(model.parameters(), lr=lr, weight_decay=1e-2)
    ce = torch.nn.CrossEntropyLoss()
    xv, yv = _collect(val_ds)
    xv_t = torch.as_tensor(xv)

    from sklearn.metrics import roc_auc_score

    history, best, best_epoch, best_scores, stale = [], -np.inf, -1, None, 0
    bs = 2
    for epoch in range(epochs):
        model.train()
        idx = list(iter(sampler))
        losses = []
        for lo in range(0, len(idx) - bs + 1, bs):
            chunk = idx[lo:lo + bs]
            xb = torch.as_tensor(
                np.stack([train_ds[i]["source"] for i in chunk]))
            yb = torch.as_tensor(
                [train_ds[i]["target"] for i in chunk], dtype=torch.long)
            opt.zero_grad()
            loss = ce(model(xb), yb)
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
        model.eval()
        with torch.no_grad():
            scores = torch.softmax(model(xv_t), -1)[:, 1].numpy()
        auc = float(roc_auc_score(yv, scores))
        history.append({"epoch": epoch,
                        "train_loss": float(np.mean(losses)),
                        "val_auc": auc})
        print(f"[torch] epoch {epoch} loss {np.mean(losses):.4f} "
              f"val/AUC {auc:.3f}", flush=True)
        if auc > best or best_epoch < 0:
            best, best_epoch, best_scores, stale = auc, epoch, scores, 0
        else:
            stale += 1
        if stale >= patience:
            break
    return init_sd, history, best, best_epoch, best_scores, yv


def run_jax(train_ds, val_ds, init_sd, epochs: int, lr: float, seed: int,
            patience: int = 10):
    """Our full training loop (`Trainer` + `DataModule`) from the SAME
    initial weights (converted), matched hyperparameters."""
    import jax
    import jax.numpy as jnp

    from mst_tpu.data.datamodule import DataModule, balanced_weights
    from mst_tpu.models.convert import convert_reference_mst
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.train.trainer import (
        Trainer, TrainState, make_optimizer,
    )

    params = convert_reference_mst(init_sd, depth=12)
    # encoder config matching the reference's LOCAL vit_small(patch_size=14)
    # (see tests/test_full_model_parity.py — forward parity is proven there)
    model = DinoSliceClassifier(
        out_ch=2, model_size="small", patch_size=14, fusion_heads=12,
        use_flash=False, gelu_approximate=False, layerscale_init=None,
        pos_embed_grid=16, dtype=jnp.float32)

    dm = DataModule(ds_train=train_ds, ds_val=val_ds, batch_size=2,
                    weights=balanced_weights(train_ds.labels()),
                    num_train_samples=min(len(train_ds), 2000),
                    seed=seed, wire_dtype=None)
    run_dir = Path(tempfile.mkdtemp(prefix="lcurve_"))
    trainer = Trainer(run_dir, max_epochs=epochs, patience=patience,
                      num_sanity_val_steps=0)
    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=make_optimizer(lr, weight_decay=1e-2),
        dropout_rng=jax.random.PRNGKey(seed))
    state, result = trainer.fit(model, state, dm)

    history = [{"epoch": r["epoch"], "train_loss": r["train_loss"],
                "val_auc": r["val/AUC_ROC"]} for r in result.history]

    # val scores of the SELECTED best checkpoint (checkpoint-selection
    # parity: the predict CLI loads exactly this)
    from mst_tpu.utils.checkpoint import load_best_checkpoint

    ck = load_best_checkpoint(run_dir)
    xv, yv = _collect(val_ds)
    logits = model.apply({"params": ck["params"]}, jnp.asarray(xv),
                         deterministic=True)
    scores = np.asarray(jax.nn.softmax(logits, -1))[:, 1]
    return history, float(result.best_metric), int(result.best_epoch), \
        scores, yv


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None,
                    help="write the curves + verdict JSON here")
    args = ap.parse_args(argv)

    if not REF.exists():
        print("SKIP: /root/reference not mounted")
        return 0

    train_ds, val_ds = make_datasets(args.seed)
    init_sd, th, t_best, t_ep, t_scores, yv = run_torch(
        train_ds, val_ds, args.epochs, args.lr, args.seed)
    jh, j_best, j_ep, j_scores, _ = run_jax(
        train_ds, val_ds, init_sd, args.epochs, args.lr, args.seed)

    from mst_tpu.utils.roc_curve import auc_bootstrapping

    _, t_aucs, _ = auc_bootstrapping(yv, t_scores, n_bootstrap=500)
    _, j_aucs, _ = auc_bootstrapping(yv, j_scores, n_bootstrap=500)
    t_std, j_std = float(np.std(t_aucs)), float(np.std(j_aucs))
    gap = abs(t_best - j_best)
    tol = max(t_std, j_std)
    within = bool(gap <= tol)
    ep0_gap = abs(th[0]["train_loss"] - jh[0]["train_loss"])

    result = {
        "config": {"epochs": args.epochs, "lr": args.lr, "seed": args.seed,
                   "depth": DEPTH, "hw": HW,
                   "train_n": len(train_ds), "val_n": len(val_ds)},
        "torch": {"history": th, "best_auc": t_best, "best_epoch": t_ep,
                  "auc_bootstrap_std": t_std},
        "jax": {"history": jh, "best_auc": j_best, "best_epoch": j_ep,
                "auc_bootstrap_std": j_std},
        "best_auc_gap": gap,
        "bootstrap_std_tolerance": tol,
        "within_bootstrap_std": within,
        "epoch0_loss_gap": ep0_gap,
    }
    print(f"\ntorch best val/AUC {t_best:.3f}±{t_std:.3f} @ epoch {t_ep}")
    print(f"jax   best val/AUC {j_best:.3f}±{j_std:.3f} @ epoch {j_ep}")
    print(f"gap {gap:.3f} (tolerance {tol:.3f}) -> "
          f"{'WITHIN' if within else 'OUTSIDE'} bootstrap std; "
          f"epoch-0 loss gap {ep0_gap:.4f}")
    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))
        print(f"curves -> {args.out}")
    return 0 if within else 1


if __name__ == "__main__":
    sys.exit(main())
