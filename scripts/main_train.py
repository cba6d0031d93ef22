#!/usr/bin/env python
"""Train CLI — mirrors the reference `scripts/main_train.py` surface.

    python scripts/main_train.py --dataset LIDC --model DinoV2ClassifierSlice \
        --path_root /data/LIDC --run_dir runs/

Reference hyperparameters replicated (`main_train.py:43-129`): batch_size 2,
class-balanced weighted sampling (0.5/count, :62-68), num_train_samples
<= 2000 (:78), monitor val/AUC_ROC max with EarlyStopping(patience=10)
(:97-102), top-1 + last checkpointing (:103-109), max_epochs 1000,
limit_val_batches <= 200, mixed precision (bf16 on TPU instead of fp16 AMP,
:113), run dir `{output}/{dataset}/{model}_{timestamp}`.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))
import logging
from datetime import datetime
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from mst_tpu.data.datamodule import DataModule, balanced_weights
from mst_tpu.registry import get_dataset, get_model
from mst_tpu.train.trainer import Trainer, make_optimizer

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
# basicConfig is a no-op when a plugin (e.g. the TPU runtime) configured the
# root logger at import — pin the package loggers to INFO explicitly so
# epoch/checkpoint progress lines survive any ambient config.
logging.getLogger("mst_tpu").setLevel(logging.INFO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="LIDC",
                    choices=["LIDC", "DUKE", "MRNet", "Synthetic"])
    ap.add_argument("--model", default="DinoV2ClassifierSlice")
    ap.add_argument("--path_root", default=None,
                    help="dataset root (reference hard-codes per-class paths)")
    ap.add_argument("--decode_cache", default=None, metavar="DIR",
                    help="materialise decoded volumes here on first read; "
                         "later epochs skip gzip-inflate/NIfTI-parse and read "
                         "raw arrays at page-cache speed (disk cost = decoded "
                         "dataset size, float32). Also via $MST_DECODE_CACHE")
    ap.add_argument("--run_dir", default="runs")
    ap.add_argument("--model_size", default="small")
    ap.add_argument("--slice_fusion", default="transformer")
    ap.add_argument("--rotary", default=None, choices=[None, "RoPE", "LiRE"])
    ap.add_argument("--use_registers", action="store_true")
    ap.add_argument("--patch_size", type=int, default=None,
                    help="override the encoder patch size (model default: "
                         "14 for DINOv2, 16 for DINOv3; inferred from the "
                         "state_dict when --pretrained_path is given)")
    ap.add_argument("--use_bottleneck", action="store_true")
    ap.add_argument("--use_slice_pos_emb", action="store_true")
    ap.add_argument("--freeze", action="store_true")
    ap.add_argument("--remat", action="store_true",
                    help="per-block gradient rematerialisation "
                         "(jax.checkpoint): the backward recomputes each "
                         "encoder block instead of storing its activations "
                         "— UNFROZEN ViT-L/giant2 fine-tuning fits one "
                         "chip's HBM at ~fwd/3 extra FLOPs (Dino models)")
    ap.add_argument("--int8", action="store_true",
                    help="with --freeze: run the frozen encoder forward on "
                         "the int8 (W8A8) serving kernels during training — "
                         "fusion/head learn on the exact features int8 "
                         "serving produces (checkpoints stay bf16)")
    ap.add_argument("--int8_calib", type=int, default=0,
                    help="with --int8: calibrate static activation scales "
                         "on this many training volumes (0 = dynamic "
                         "per-token scales)")
    ap.add_argument("--fold", type=int, default=0,
                    help="cross-validation fold of split.csv (recorded in "
                         "hparams so the predict CLI scores the same "
                         "fold's test split; the reference fixes fold 0 "
                         "via the dataset ctor default)")
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--max_epochs", type=int, default=1000)
    ap.add_argument("--num_train_samples", type=int, default=2000)
    ap.add_argument("--patience", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fusion_heads", type=int, default=12)
    ap.add_argument("--profile_dir", default=None,
                    help="write a jax.profiler trace of epoch 1 here")
    ap.add_argument("--lr_schedule", default=None,
                    choices=[None, "cosine", "warmup_cosine"])
    ap.add_argument("--optimizer", default="adamw",
                    choices=["adamw", "adafactor"],
                    help="adafactor: factored second moments — with "
                         "--remat, an UNFROZEN giant2 (1.1B) fine-tune "
                         "fits one 16GB chip (AdamW's full f32 moments "
                         "alone are 8.8GB there)")
    ap.add_argument("--accumulate_grad_batches", type=int, default=1,
                    help="average the grads of N micro-batches into one "
                         "optimizer update (Lightning's knob of the same "
                         "name; the reference pins it to 1 at "
                         "main_train.py:111) — the batch_size*N training "
                         "trajectory on a chip that only fits batch_size")
    ap.add_argument("--debug_nans", action="store_true",
                    help="enable jax_debug_nans (the functional analogue of "
                         "a sanitizer pass, SURVEY 5.2)")
    ap.add_argument("--resume", default=None,
                    help="resume from a run dir's last checkpoint (full "
                         "TrainState: params, optimizer moments, step, rng)")
    ap.add_argument("--pretrained_path", default=None,
                    help="torch state_dict (.pth) with pretrained encoder "
                         "weights: DINOv2 torch.hub or HuggingFace layout "
                         "for the Dino classifiers, torchvision layout for "
                         "the ResNets (the reference loads hub weights at "
                         "construction, mst/models/dino.py:59-63)")
    ap.add_argument("--lr", type=float, default=None,
                    help="override the model's default learning rate")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host run: jax.distributed.initialize() "
                         "(auto-detected topology on TPU pods), per-host "
                         "disjoint data shards, global SPMD batches; launch "
                         "the same command on every host (mst_tpu.sbatch)")
    ap.add_argument("--dist_coordinator", default=None,
                    help="coordinator address host:port (CPU clusters; "
                         "TPU pods auto-detect)")
    ap.add_argument("--dist_num_processes", type=int, default=None)
    ap.add_argument("--dist_process_id", type=int, default=None)
    ap.add_argument("--compilation_cache", default=None,
                    help="persistent XLA compile cache directory (also "
                         "honours $MST_COMPILATION_CACHE) — restarts skip "
                         "recompiling unchanged programs")
    args = ap.parse_args(argv)

    from mst_tpu.export import enable_compilation_cache

    enable_compilation_cache(args.compilation_cache)

    if args.distributed:
        import jax

        from mst_tpu.parallel.distributed import initialize

        initialize(args.dist_coordinator, args.dist_num_processes,
                   args.dist_process_id)
        print(f"distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {len(jax.devices())} global devices")
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)

    ds_kw = dict(path_root=args.path_root, fold=args.fold,
                 decode_cache=args.decode_cache)
    if args.dataset == "Synthetic":
        ds_kw = {}
    ds_train = get_dataset(args.dataset, split="train", flip=True, noise=True,
                           random_center=True, random_rotate=True, **ds_kw)
    ds_val = get_dataset(args.dataset, split="val", **ds_kw)

    shard_id, num_shards = 0, 1
    if args.distributed:
        import jax

        shard_id, num_shards = jax.process_index(), jax.process_count()

    weights = balanced_weights(ds_train.labels())
    dm = DataModule(
        ds_train=ds_train, ds_val=ds_val, batch_size=args.batch_size,
        weights=weights,
        num_train_samples=min(len(ds_train), args.num_train_samples),
        seed=args.seed, shard_id=shard_id, num_shards=num_shards,
    )

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model_kw = dict(
        model_size=args.model_size, slice_fusion=args.slice_fusion,
        rotary=args.rotary, use_bottleneck=args.use_bottleneck,
        use_slice_pos_emb=args.use_slice_pos_emb, freeze=args.freeze,
        fusion_heads=args.fusion_heads, remat=args.remat,
    )
    if args.use_registers:
        model_kw["num_register_tokens"] = 4
    if args.patch_size is not None:
        model_kw["patch_size"] = args.patch_size
    if args.model.startswith("ResNet"):
        if args.remat:
            raise SystemExit("--remat applies to the Dino ViT encoders; the "
                             "ResNet activations fit HBM without it")
        model_kw = {"freeze": args.freeze}

    pretrained_sd = None
    if args.pretrained_path:
        from mst_tpu.models.convert import (
            load_torch_state_dict,
            pos_embed_grid_from_sd,
        )

        pretrained_sd = load_torch_state_dict(args.pretrained_path)
        if not args.model.startswith("ResNet"):
            # The encoder config must match the weights: canonical pos-embed
            # grid / patch size / register-token count / FFN width come FROM
            # the state_dict, and are recorded in hparams so predict
            # reconstructs the same encoder.
            from mst_tpu.models.convert import (
                detect_encoder_layout,
                dinov3_config_from_sd,
            )

            if detect_encoder_layout(pretrained_sd) == "hf_v3":
                v3cfg = dinov3_config_from_sd(pretrained_sd)
                model_kw["patch_size"] = v3cfg["patch_size"]
                model_kw["num_register_tokens"] = v3cfg["num_register_tokens"]
                model_kw["ffn_layer"] = v3cfg["ffn_layer"]
                model_kw["ffn_hidden"] = v3cfg["ffn_hidden"]
                model_kw.setdefault("use_pos_embed", False)
                model_kw.setdefault("use_rope_2d", True)
                model_kw.setdefault("rope_normalized", True)
                model_kw.setdefault("norm_eps", 1e-5)
            else:
                model_kw["pos_embed_grid"] = pos_embed_grid_from_sd(
                    pretrained_sd)
                for reg_key in ("register_tokens",
                                "embeddings.register_tokens"):
                    if reg_key in pretrained_sd:
                        model_kw["num_register_tokens"] = int(
                            np.asarray(pretrained_sd[reg_key]).shape[1])

    model, entry = get_model(args.model, dtype=dtype, **model_kw)

    if args.resume:
        # Resume continues IN the original run dir (Lightning last.ckpt
        # semantics): the restored best/patience bookkeeping refers to the
        # best checkpoint living there — a fresh dir would strand it and
        # could early-stop with no best_checkpoint.json at all.
        run_dir = Path(args.resume)
        if not (run_dir / "best_checkpoint.json").exists():
            raise SystemExit(f"--resume: {run_dir} is not a run folder")
    else:
        stamp = datetime.now().strftime("%Y_%m_%d_%H%M%S")
        if num_shards > 1:
            # All hosts must agree on the run directory (orbax coordinates
            # the checkpoint writes across processes): broadcast process 0's
            # stamp.
            from jax.experimental import multihost_utils

            buf = np.frombuffer(stamp.encode().ljust(32), dtype=np.uint8).copy()
            stamp = bytes(
                multihost_utils.broadcast_one_to_all(buf)).decode().strip()
        run_dir = Path(args.run_dir) / args.dataset / f"{args.model}_{stamp}"
    run_dir.mkdir(parents=True, exist_ok=True)

    lr = entry.learning_rate if args.lr is None else args.lr
    tx = make_optimizer(lr, entry.weight_decay,
                        freeze_encoder=args.freeze,
                        schedule=args.lr_schedule,
                        optimizer=args.optimizer,
                        accumulate_steps=args.accumulate_grad_batches)
    trainer = Trainer(
        run_dir, max_epochs=args.max_epochs, patience=args.patience,
        limit_val_batches=min(len(ds_val), 200),
        profile_dir=args.profile_dir,
        int8=args.int8, int8_calib=args.int8_calib,
    )
    example = next(iter(dm.val_dataloader()))
    state = trainer.init_state(model, example, tx, seed=args.seed)

    if pretrained_sd is not None:
        if args.model.startswith("ResNet"):
            from mst_tpu.models.convert import convert_torch_resnet

            bb_params, bb_stats = convert_torch_resnet(
                pretrained_sd, model.variant)
            new_params = dict(state.params)
            new_params["backbone"] = bb_params
            new_bs = dict(state.batch_stats or {})
            new_bs["backbone"] = bb_stats
            state = state.replace(params=new_params, batch_stats=new_bs)
        else:
            from mst_tpu.models.convert import load_pretrained_encoder
            from mst_tpu.models.vit import _VIT_CONFIGS

            cfg = _VIT_CONFIGS[args.model_size]
            # the checkpoint's FFN family (e.g. gated-MLP DINOv3) wins over
            # the model_size default — model_kw carries it when inferred
            # from the state_dict above
            ffn_layer = model_kw.get("ffn_layer") or cfg.get("ffn_layer", "mlp")
            state = state.replace(params=load_pretrained_encoder(
                state.params, pretrained_sd, cfg["depth"], ffn_layer))
        print(f"loaded pretrained encoder from {args.pretrained_path}")

    start_epoch, resume_meta = 0, None
    if args.resume:
        from mst_tpu.utils.checkpoint import restore_train_state

        state, resume_meta = restore_train_state(args.resume, "last", state)
        start_epoch = int(resume_meta.get("epoch", -1)) + 1
        print(f"resumed full TrainState from {args.resume}/last "
              f"(step {int(state.step)}, next epoch {start_epoch})")
    hparams = {"model": args.model, "dataset": args.dataset,
               "fold": args.fold, **{
        k: (v if isinstance(v, (int, float, str, bool, type(None))) else str(v))
        for k, v in model_kw.items()}}
    state, result = trainer.fit(model, state, dm, hparams=hparams,
                                start_epoch=start_epoch,
                                resume_meta=resume_meta)
    print(f"best val/AUC_ROC={result.best_metric:.4f} @ epoch {result.best_epoch} "
          f"({result.epochs_run} epochs) -> {run_dir}")
    return run_dir, result


if __name__ == "__main__":
    main()
