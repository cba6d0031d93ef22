#!/usr/bin/env python
"""Predict/eval CLI — mirrors the reference `scripts/main_predict.py`.

    python scripts/main_predict.py --run_folder runs/LIDC/DinoV2ClassifierSlice_... \
        [--path_root /data/LIDC] [--get_attention] [--get_segmentation] [--use_tta]

Modes replicated (reference :169-381):
- plain eval   -> results.csv + roc.png + confusion_matrix.png + acc/sens/spec log
- --get_attention    -> saliency PNG overlays for positive cases (:273-306)
- --get_segmentation -> threshold saliency at the 99.9th percentile ->
  Dice/IoU/ASSD vs the >=2-rater ground truth with voxel spacing from the
  affine diagonal (:229-269) -> results_seg.csv + mean±std log (:326-337)
- --use_tta    -> 8-way flip ensemble (batched on device, :147-158)

Extras beyond the reference: --ensemble (average fold models post-softmax,
the deployment companion to tools/run_crossval.py), --save_saliency
(saliency/input/seg volumes as .nii.gz for radiology viewers), --int8,
--num_devices, --distributed, --use_rollout.

Run-folder name encodes dataset/model exactly like the reference
(`{dataset}/{Model}_{timestamp}`, :184-186).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path as _Path

sys.path.insert(0, str(_Path(__file__).resolve().parent.parent))
import logging
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pandas as pd

from mst_tpu.registry import get_dataset
from mst_tpu.train.predictor import make_predict_fn
from mst_tpu.utils.functions import overlay_cam, overlay_mask, tensor2image
from mst_tpu.utils.metrics import cm2acc, cm2x, confusion_matrix
from mst_tpu.utils.seg_metrics import (
    average_surface_distance,
    dice_score,
    iou_score,
    saliency_to_mask,
)

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
# basicConfig is a no-op when a plugin (e.g. the TPU runtime) configured the
# root logger at import — pin the CLI loggers to INFO explicitly so the
# console summary and predict.log survive any ambient config.
log = logging.getLogger("main_predict")
log.setLevel(logging.INFO)
logging.getLogger("mst_tpu").setLevel(logging.INFO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_folder", required=True)
    ap.add_argument("--path_root", default=None)
    ap.add_argument("--decode_cache", default=None, metavar="DIR",
                    help="decoded-volume disk cache shared with main_train "
                         "(see its --help); also via $MST_DECODE_CACHE")
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--get_attention", action="store_true")
    ap.add_argument("--get_segmentation", action="store_true")
    ap.add_argument("--use_tta", action="store_true")
    ap.add_argument("--use_rollout", action="store_true",
                    help="attention rollout over all ViT blocks instead of "
                         "the last-block CLS map (reference get_attention_cls "
                         "reversed matmul chain)")
    ap.add_argument("--rollout_abnar", action="store_true",
                    help="with --use_rollout: use the improved Abnar&Zuidema "
                         "rollout (identity residual + row norm) instead of "
                         "the reference chain")
    ap.add_argument("--ensemble", nargs="+", default=None, metavar="RUN_DIR",
                    help="additional run folders (same architecture, e.g. "
                         "the other fold models from tools/run_crossval.py): "
                         "softmax probabilities — and saliency maps, when a "
                         "saliency mode is active — are averaged across all "
                         "members, like the reference averages its 8 TTA "
                         "forwards post-softmax (saliency is max-normalised "
                         "per member first — attention scales are not "
                         "comparable across independently trained models). "
                         "NOTE: on datasets whose "
                         "test split rotates with the fold (LIDC/DUKE), a "
                         "cross-fold ensemble leaks — member fold k trained "
                         "on this fold's test cases; legitimate for fixed-"
                         "test datasets (MRNet) or external data. MEMORY: "
                         "all K members' param trees stay on device "
                         "simultaneously (K x params HBM; + int8 copies "
                         "with --int8) — a 5-fold giant2 ensemble exceeds "
                         "one chip")
    ap.add_argument("--save_saliency", action="store_true",
                    help="write each case's saliency volume (and, with "
                         "--get_segmentation, the thresholded mask) as "
                         "case_<uid>/saliency.nii.gz [+ seg.nii.gz + "
                         "input.nii.gz] in the transformed (crop/resize) "
                         "grid with a spacing-only affine — co-registered "
                         "with each other, loadable by any radiology "
                         "viewer (the reference emits PNGs only)")
    ap.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    ap.add_argument("--int8", action="store_true",
                    help="serve the encoder with W8A8 int8 kernels (2x MXU "
                         "rate on TPU) — plain/TTA eval, --get_attention/"
                         "--get_segmentation and both rollout variants "
                         "included (CLS-row / rollout-carry / Abnar-factor "
                         "emission rides the int8 kernels)")
    ap.add_argument("--int8_calib", type=int, default=0, metavar="N",
                    help="with --int8: calibrate STATIC activation scales "
                         "on the first N eval volumes and fold them into "
                         "the kernels (skips the per-token abs-max "
                         "reductions; 0 = dynamic per-token scales)")
    ap.add_argument("--batch_size", type=int, default=1,
                    help="volumes per device program for plain eval "
                         "(saliency/segmentation modes run per case like "
                         "the reference, bs=1)")
    ap.add_argument("--num_devices", type=int, default=1, metavar="N",
                    help="data-parallel serving over N local chips (-1 = "
                         "all): plain/TTA eval batches shard over a pure-"
                         "data mesh, each chip runs the full fused/int8 "
                         "per-volume program (make --batch_size a multiple "
                         "of N; indivisible batches fall back to one chip). "
                         "Single-process only — with --distributed each "
                         "host already scores its own shard")
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host eval: jax.distributed.initialize(); "
                         "each process scores a disjoint test shard, rank 0 "
                         "merges rows and writes the artifacts (shared FS, "
                         "same contract as the trainer's checkpoints)")
    ap.add_argument("--dist_coordinator", default=None)
    ap.add_argument("--dist_num_processes", type=int, default=None)
    ap.add_argument("--dist_process_id", type=int, default=None)
    ap.add_argument("--compilation_cache", default=None,
                    help="persistent XLA compile cache directory (also "
                         "honours $MST_COMPILATION_CACHE)")
    args = ap.parse_args(argv)

    from mst_tpu.export import enable_compilation_cache

    enable_compilation_cache(args.compilation_cache)

    if args.distributed:
        import jax

        from mst_tpu.parallel.distributed import initialize

        initialize(args.dist_coordinator, args.dist_num_processes,
                   args.dist_process_id)
        log.info("distributed eval: process %d/%d", jax.process_index(),
                 jax.process_count())

    path_run = Path(args.run_folder)
    if not (path_run / "best_checkpoint.json").exists():
        raise SystemExit(
            f"error: {path_run} is not a run folder (no best_checkpoint.json); "
            "point --run_folder at a directory produced by main_train.py"
        )
    dataset_name = path_run.parent.name
    out_dir = Path(args.output_dir) if args.output_dir else path_run / "results"
    out_dir.mkdir(parents=True, exist_ok=True)
    fh = logging.FileHandler(out_dir / "predict.log")
    log.addHandler(fh)

    # One loading contract for every consumer of a run folder (the server
    # and exporter use the same helper — the hparam whitelist lives in ONE
    # place, mst_tpu/serve.py:_HPARAM_KEYS).
    from mst_tpu.serve import load_run_model

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model, params, batch_stats = load_run_model(path_run, dtype=dtype)

    # --ensemble: (params, batch_stats) per member; members[0] is this run.
    members = [(params, batch_stats)]
    if args.ensemble:
        import jax

        from mst_tpu.utils.checkpoint import load_hparams as _load_hp

        prim_leaves = jax.tree_util.tree_leaves(params)
        prim_struct = jax.tree_util.tree_structure(params)
        prim_fold = (_load_hp(path_run) or {}).get("fold")
        for mdir in args.ensemble:
            mpath = Path(mdir)
            if not (mpath / "best_checkpoint.json").exists():
                raise SystemExit(f"--ensemble: {mpath} is not a run folder "
                                 "(no best_checkpoint.json)")
            _, mparams, mbs = load_run_model(mpath, dtype=dtype)
            mleaves = jax.tree_util.tree_leaves(mparams)
            if (jax.tree_util.tree_structure(mparams) != prim_struct
                    or any(a.shape != b.shape
                           for a, b in zip(prim_leaves, mleaves))):
                raise SystemExit(f"--ensemble: {mpath} has a different "
                                 "architecture (param tree mismatch)")
            mfold = (_load_hp(mpath) or {}).get("fold")
            if mfold is None or prim_fold is None:
                # pre---fold runs don't record a fold: defaulting both to 0
                # would silently pass two runs trained on different splits
                log.info(
                    "--ensemble: fold not recorded for %s — cannot verify "
                    "the members trained on the same split",
                    mpath if mfold is None else path_run)
            elif mfold != prim_fold:
                log.warning(
                    "--ensemble member %s trained on fold %d (this run: "
                    "fold %d) — leaks on rotating-test datasets, see --help",
                    mpath, mfold, prim_fold)
            members.append((mparams, mbs))
        log.info("ensemble of %d models", len(members))

    if dataset_name == "Synthetic":
        ds_kw = {}
    else:
        # score the SAME fold the run trained on (recorded in hparams by
        # main_train --fold; absent in older runs -> the ctor default 0)
        from mst_tpu.utils.checkpoint import load_hparams

        fold = (load_hparams(path_run) or {}).get("fold", 0)
        ds_kw = {"path_root": args.path_root, "fold": fold,
                 "decode_cache": args.decode_cache}
    ds_test = get_dataset(dataset_name, split="test", **ds_kw)

    want_sal = (args.get_attention or args.get_segmentation
                or args.save_saliency)
    plane_mode = "last"
    if args.use_rollout:
        plane_mode = "rollout_abnar" if args.rollout_abnar else "rollout"

    if args.int8:
        import jax

        from mst_tpu.models.vit_fast import fused_config_supported

        if not (fused_config_supported(model)
                and batch_stats is None
                and jax.default_backend() == "tpu"):
            raise SystemExit("--int8 needs the fused TPU serving path "
                             "(Dino transformer-fusion config, TPU backend)")
    mesh = None
    if args.num_devices != 1:
        import jax

        if jax.process_count() > 1:
            raise SystemExit(
                "--num_devices is single-process data-parallel serving; "
                "in --distributed runs each host already scores a disjoint "
                "shard on its own devices")
        devs = jax.local_devices()
        n_dev = len(devs) if args.num_devices < 0 else args.num_devices
        if n_dev > len(devs):
            raise SystemExit(f"--num_devices {n_dev}: only {len(devs)} "
                             "local devices are attached")
        if n_dev > 1:
            from mst_tpu.parallel.mesh import make_mesh

            mesh = make_mesh((("data", n_dev),), devices=devs[:n_dev])
            log.info("serving data-parallel over %d local devices", n_dev)
    predict = make_predict_fn(model, tta=args.use_tta, with_saliency=want_sal,
                              batch_stats=batch_stats, plane_mode=plane_mode,
                              mesh=mesh)
    # One predict fn per member: batch_stats is closed over (not traced), so
    # members that carry their own batch_stats (ResNet) need their own fn;
    # stats-free members share `predict` and hence its compiled executable
    # (same jit callable + same arg treedef -> one XLA program).
    predict_fns = [predict]
    for _, mbs in members[1:]:
        if mbs is None and batch_stats is None:
            predict_fns.append(predict)
        else:
            predict_fns.append(make_predict_fn(
                model, tta=args.use_tta, with_saliency=want_sal,
                batch_stats=mbs, plane_mode=plane_mode, mesh=mesh))

    from mst_tpu.data.datamodule import DataModule

    batch_size = 1 if want_sal else max(1, args.batch_size)
    import jax as _jax

    # Per-host sharding like the trainer (main_train.py): in a multi-host
    # predict each process scores its own disjoint shard; wrap-padding
    # duplicates are dropped below via eval_valid_mask so the combined
    # metrics match a single-host run.
    dm = DataModule(ds_test=ds_test, batch_size=batch_size,
                    shard_id=_jax.process_index(),
                    num_shards=_jax.process_count())
    if args.int8:
        from mst_tpu.ops.fused_int8 import quantize_mst_params_int8

        if args.int8_calib > 0:
            # Static-scale PTQ: calibrate on the first N eval volumes AS
            # SERVED (post eval-transform), then fold the activation
            # scales offline (ops/fused_int8 module docstring).
            vols = []
            seen = 0
            for batch in dm.test_dataloader():
                vols.append(np.asarray(batch["source"]))
                seen += vols[-1].shape[0]
                if seen >= args.int8_calib:
                    break
            calib_np = np.concatenate(vols, axis=0)[:args.int8_calib]
            if _jax.process_count() > 1:
                # every host draws from its own disjoint shard — gather so
                # all hosts fold IDENTICAL scales (the trainer does the
                # same for --freeze --int8, trainer.py fit calibration)
                from jax.experimental import multihost_utils

                calib_np = np.concatenate(
                    multihost_utils.process_allgather(
                        jnp.asarray(calib_np)), 0)
            calib = jnp.asarray(calib_np)
            members = [(quantize_mst_params_int8(p, model, calib), bs)
                       for p, bs in members]
            log.info("serving with int8 (W8A8) encoder kernels — STATIC "
                     "activation scales calibrated on %d volumes",
                     int(calib.shape[0]))
        else:
            members = [(quantize_mst_params_int8(p), bs)
                       for p, bs in members]
            log.info("serving with int8 (W8A8) encoder kernels (dynamic "
                     "per-token activation scales)")
        params = members[0][0]
    test_valid = dm.eval_valid_mask(len(ds_test))
    row_lo = 0
    results, results_seg = [], []
    for batch in dm.test_dataloader():
        n_in_batch = len(batch["uid"])
        bvalid = test_valid[row_lo:row_lo + n_in_batch]
        row_lo += n_in_batch
        rater_masks = batch.get("rater_masks", [None])[0]
        if args.get_segmentation and rater_masks is None:
            continue  # reference skips cases without multi-rater GT (:235-237)
        source = jnp.asarray(batch["source"])
        mask_kp = batch.get("src_key_padding_mask")
        mask_kp = None if mask_kp is None else jnp.asarray(mask_kp)
        if len(members) == 1:
            probs_b, sal = predict(params, source, mask_kp)
        else:
            # post-softmax average across members, saliency maps too — the
            # same aggregation the reference applies to its TTA forwards
            probs_acc, sal_acc = [], []
            for (mp, _), pf in zip(members, predict_fns):
                pb, s = pf(mp, source, mask_kp)
                probs_acc.append(pb)
                if s is not None:
                    # per-member, per-volume max-normalisation before the
                    # mean: softmax probabilities share a scale but
                    # CLS-attention saliency magnitudes do not — without
                    # this one member with a larger attention scale
                    # dominates the ensemble map (ADVICE r3)
                    denom = jnp.max(jnp.abs(s),
                                    axis=tuple(range(1, s.ndim)),
                                    keepdims=True)
                    sal_acc.append(s / jnp.maximum(denom, 1e-12))
            probs_b = jnp.mean(jnp.stack(probs_acc), axis=0)
            sal = (jnp.mean(jnp.stack(sal_acc), axis=0)
                   if sal_acc else None)
        probs_b = np.asarray(probs_b)
        for bi, uid in enumerate(batch["uid"]):
            if not bvalid[bi]:
                continue  # multi-host wrap-padding duplicate
            probs = probs_b[bi]
            results.append({"uid": uid, "GT": int(batch["target"][bi]),
                            "NN": int(probs.argmax()),
                            "NN_pred": float(probs[1])})
        # saliency modes run bs=1 (per-case artifacts, like the reference)
        uid = batch["uid"][0]
        target = int(batch["target"][0])
        probs = probs_b[0]
        pred_cls = int(probs.argmax())

        if sal is not None:
            sal_np = np.asarray(sal)[0]  # [D, H, W]

        if args.get_segmentation and rater_masks is not None and bvalid[0]:
            # >=2 raters agree -> GT mask (reference :243-250)
            gt = (np.asarray(rater_masks)[:, 0].sum(0) >= 2)
            seg = saliency_to_mask(sal_np, 0.999)
            if "spacing_dhw" in batch:  # dataset-provided (D,H,W) spacing
                spacing = np.asarray(batch["spacing_dhw"][0])
            else:
                affine = np.asarray(batch["affine"][0])
                spacing = np.abs(np.diag(affine)[:3])[::-1]
            results_seg.append({
                "uid": uid, "GT": target, "NN": pred_cls,
                "Dice": dice_score(seg, gt),
                "IoU": iou_score(seg, gt),
                "ASSD": average_surface_distance(seg, gt, spacing=spacing),
            })

        if args.save_saliency and sal is not None and bvalid[0]:
            from mst_tpu.utils.nifti import write_nifti

            case_dir = out_dir / f"case_{uid}"
            case_dir.mkdir(parents=True, exist_ok=True)
            # Back to NIfTI (X,Y,Z) axis order — the loaders' [C,W,H,D] →
            # [C,D,H,W] swap inverted; spacing-only affine (the crop/pad
            # grid has no meaningful origin to preserve).
            if "spacing_dhw" in batch:
                sp = np.asarray(batch["spacing_dhw"][0], dtype=float)
            elif "affine" in batch:
                sp = np.abs(np.diag(
                    np.asarray(batch["affine"][0]))[:3])[::-1]
            else:
                sp = np.ones(3)
            aff = np.diag([sp[2], sp[1], sp[0], 1.0])
            write_nifti(case_dir / "saliency.nii.gz",
                        np.transpose(sal_np, (2, 1, 0)).astype(np.float32),
                        aff)
            write_nifti(case_dir / "input.nii.gz",
                        np.transpose(np.asarray(batch["source"])[0, 0],
                                     (2, 1, 0)).astype(np.float32), aff)
            if args.get_segmentation and rater_masks is not None:
                write_nifti(case_dir / "seg.nii.gz",
                            np.transpose(seg, (2, 1, 0)).astype(np.uint8),
                            aff)

        if args.get_attention and target == 1:
            case_dir = out_dir / f"case_{uid}"
            src_np = np.asarray(batch["source"])
            tensor2image(src_np, case_dir / "input.png")
            overlay_cam(src_np, sal_np, case_dir / "attention.png")
            if "mask" in batch:
                overlay_mask(src_np, np.asarray(batch["mask"]),
                             case_dir / "ground_truth.png")

    if _jax.process_count() > 1:
        # Merge shards through the shared run dir (the same contract the
        # trainer's coordinated checkpoints rely on): every host writes its
        # rows, a barrier syncs, rank 0 concatenates and emits artifacts.
        rank = _jax.process_index()
        n_proc = _jax.process_count()
        pd.DataFrame(results).to_csv(
            out_dir / f"results.shard{rank}.csv", index=False)
        seg_file = out_dir / f"results_seg.shard{rank}.csv"
        if results_seg:
            pd.DataFrame(results_seg).to_csv(seg_file, index=False)
        elif seg_file.exists():
            seg_file.unlink()  # stale shard from an earlier seg run
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mst_predict_shards")
        if rank != 0:
            return out_dir
        # merge EXACTLY this run's process_count shards — a bare glob would
        # silently merge stale shards left by an earlier run with more
        # processes into the final metrics
        expected = [out_dir / f"results.shard{r}.csv" for r in range(n_proc)]
        missing = [f.name for f in expected if not f.exists()]
        if missing:
            raise SystemExit(f"missing result shards after barrier: {missing}")
        seg_expected = [out_dir / f"results_seg.shard{r}.csv"
                        for r in range(n_proc)]
        for f in out_dir.glob("results.shard*.csv"):
            if f not in expected:
                f.unlink()
        for f in out_dir.glob("results_seg.shard*.csv"):
            if f not in seg_expected:
                f.unlink()
        results = pd.concat([pd.read_csv(f) for f in expected],
                            ignore_index=True).to_dict("records")
        seg_shards = [f for f in seg_expected if f.exists()]
        if seg_shards:
            results_seg = pd.concat([pd.read_csv(f) for f in seg_shards],
                                    ignore_index=True).to_dict("records")

    df = pd.DataFrame(results)
    df.to_csv(out_dir / "results.csv", index=False)

    if results_seg:
        df_seg = pd.DataFrame(results_seg)
        df_seg.to_csv(out_dir / "results_seg.csv", index=False)
        for m in ("Dice", "IoU", "ASSD"):
            vals = df_seg[m].to_numpy(dtype=float)
            log.info("%s: %.4f ± %.4f", m, np.nanmean(vals), np.nanstd(vals))

    if len(df) and df["GT"].nunique() > 1:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns

        from mst_tpu.utils.roc_curve import plot_roc_curve

        # Argmax ACC/CM go to the LOG only (reference :345-353).
        cm_arg = confusion_matrix(df["NN"].to_numpy(), df["GT"].to_numpy())
        log.info("argmax ACC=%.4f  CM=%s", cm2acc(cm_arg), cm_arg.tolist())

        fig, ax = plt.subplots(figsize=(5, 5))
        *_, cm = plot_roc_curve(df["GT"].to_numpy(), df["NN_pred"].to_numpy(), ax)
        fig.savefig(out_dir / "roc.png", dpi=150, bbox_inches="tight")
        plt.close(fig)

        # The heatmapped artifact + reported ACC use the Youden working-point
        # CM returned by plot_roc_curve (reference :366-375), not argmax.
        acc = cm2acc(cm)
        ppv, npv, sens, spec = cm2x(cm)
        fig, ax = plt.subplots(figsize=(4, 4))
        sns.heatmap(cm, annot=True, fmt="d", cmap="Blues", ax=ax,
                    xticklabels=["False", "True"],
                    yticklabels=["False", "True"])
        ax.set_title(f"Confusion Matrix ACC={acc:.2f}")
        ax.set_xlabel("Prediction")
        ax.set_ylabel("True")
        fig.savefig(out_dir / "confusion_matrix.png", dpi=150, bbox_inches="tight")
        plt.close(fig)
        log.info("ACC=%.4f  Sens=%.4f Spec=%.4f PPV=%.4f NPV=%.4f",
                 acc, sens, spec, ppv, npv)
    return out_dir


if __name__ == "__main__":
    main()
