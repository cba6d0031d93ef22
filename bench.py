#!/usr/bin/env python
"""Benchmark: MST-DINOv2 (ViT-S/14) per-volume inference throughput.

North-star metric (BASELINE.json): volumes/sec/chip for LIDC-shaped
volumes [1, 32, 224, 224] through the full MST forward (per-slice ViT with
Pallas flash attention in bf16 + slice-fusion transformer + head).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "volumes/sec/chip", "vs_baseline": N}

`vs_baseline` compares against the measured PyTorch reference anchor in
BASELINE_measured.json (the reference's own DinoV2ClassifierSlice forward,
measured in-situ on this host's CPU by tools/reference_baseline.py — the
reference repo ships no GPU numbers and this environment has no GPU;
see BASELINE.md).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp


def _measure(forward, source, iters: int) -> float:
    """Seconds per call, min over 2 passes; forced host sync (see
    BASELINE.md: block_until_ready can return early through the relay)."""
    from mst_tpu.utils.benchtime import timed_min

    return timed_min(forward, source, iters=iters)


def bench(batch: int = 4, depth: int = 32, hw: int = 224,
          iters: int = 20, warmup: int = 3) -> dict:
    from mst_tpu.models.mst import dino_v2_classifier_slice

    on_tpu = jax.default_backend() == "tpu"
    model = dino_v2_classifier_slice(
        out_ch=2, model_size="small",
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_flash=on_tpu,
    )
    key = jax.random.PRNGKey(0)
    source = jax.random.normal(key, (batch, 1, depth, hw, hw), jnp.float32)
    params = model.init(key, source[:1])["params"]

    if on_tpu:
        from mst_tpu.models.vit_fast import fused_mst_logits

        @jax.jit
        def forward(source):
            return fused_mst_logits(params, source, model)
    else:
        @jax.jit
        def forward(source):
            return model.apply({"params": params}, source, deterministic=True)

    forward(source).block_until_ready()
    for _ in range(warmup):
        forward(source).block_until_ready()
    dt = _measure(forward, source, iters)
    vps = batch / dt

    # Serving batch sweep: find the throughput knee (VERDICT r2 #1) and
    # record p50/p99 per-call latency at each size (VERDICT r2 #10). The
    # headline metric is the best sustained throughput across batch sizes.
    sweep = {}
    best_batch, best_vps = batch, vps
    if on_tpu:
        # 1 and 2 are the interactive-serving latencies (one volume on the
        # chip, the reference's own predict batch); the knee search for the
        # throughput headline runs over the larger sizes.
        for b in (1, 2, 4, 8, 16, 32, 64):
            if b == batch:
                bdt = dt
                src_b = source
            else:
                src_b = jax.random.normal(key, (b, 1, depth, hw, hw),
                                          jnp.float32)
                forward(src_b).block_until_ready()
                bdt = _measure(forward, src_b, max(iters // 2, 8))
            # per-call latency distribution (each call host-synced)
            lats = []
            for _ in range(15):
                t0 = time.perf_counter()
                float(jnp.sum(forward(src_b)).astype(jnp.float32))
                lats.append(time.perf_counter() - t0)
            lats.sort()
            p50 = lats[len(lats) // 2] * 1e3
            p99 = lats[-1] * 1e3  # max of 15 ~ p93+; labelled p99 budget
            sweep[str(b)] = {"volumes_per_sec": round(b / bdt, 1),
                             "ms_per_batch": round(bdt * 1e3, 2),
                             "p50_ms": round(p50, 2),
                             "p99_ms": round(p99, 2)}
            if b / bdt > best_vps:
                best_vps, best_batch = b / bdt, b

    # Int8 (W8A8) serving: quantized encoder matmuls on the MXU's doubled
    # int8 rate (`ops/fused_int8.py`), measured at the knee batch — both
    # dynamic per-token scales and calibrated static (folded) scales.
    int8_vps = int8_static_vps = None
    if on_tpu:
        try:
            from mst_tpu.ops.fused_int8 import quantize_mst_params_int8

            qparams = quantize_mst_params_int8(params)
            src_q = jax.random.normal(key, (best_batch, 1, depth, hw, hw),
                                      jnp.float32)

            @jax.jit
            def forward_q(src):
                return fused_mst_logits(qparams, src, model)

            forward_q(src_q).block_until_ready()
            qdt = _measure(forward_q, src_q, max(iters // 2, 8))
            int8_vps = best_batch / qdt

            sparams = quantize_mst_params_int8(params, model, src_q[:2])

            @jax.jit
            def forward_s(src):
                return fused_mst_logits(sparams, src, model)

            forward_s(src_q).block_until_ready()
            sdt = _measure(forward_s, src_q, max(iters // 2, 8))
            int8_static_vps = best_batch / sdt
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"# int8 bench skipped: {type(e).__name__}: {e}",
                  flush=True)

    # Large-D single-volume serving (the 1000-slice-CT sequence-scaling
    # story, SURVEY §5.7): one 512-slice volume through the fused path.
    # Per-slice throughput should exceed the D=32 rate (deep volumes
    # amortise dispatch/fusion overhead) — tools/bench_large_d.py has the
    # full D sweep.
    d512_ms = None
    if on_tpu:
        try:
            # f32 input like every other serving leg (the fused path casts
            # on-device) so per-slice ratios vs the sweep are comparable.
            src_d = jax.random.normal(key, (1, 1, 512, hw, hw), jnp.float32)

            @jax.jit
            def forward_d(src):
                return fused_mst_logits(params, src, model)

            d512_ms = _measure(forward_d, src_d, 8) * 1e3
        except Exception as e:  # noqa: BLE001
            print(f"# large-D leg skipped: {type(e).__name__}: {e}",
                  flush=True)

    # Batched 8-way flip TTA (offline eval serving mode): all variants of
    # all B volumes in ONE device program. Runs BEFORE training — the
    # donated train step deletes the param buffers it shares.
    tta_vps = None
    if on_tpu:
        from mst_tpu.train.predictor import make_predict_fn

        predict_tta = make_predict_fn(model, tta=True, with_saliency=False)
        p, _ = predict_tta(params, source, None)
        jax.block_until_ready(p)
        t0 = time.perf_counter()
        tta_iters = max(iters // 2, 5)
        for _ in range(tta_iters):
            p, _ = predict_tta(params, source, None)
        jax.block_until_ready(p)
        tta_vps = batch / ((time.perf_counter() - t0) / tta_iters)

    # Explainability serving (--get_attention/--get_segmentation): fused
    # path with the last-block CLS-row kernel + combined saliency volume.
    sal_vps = rollout_vps = None
    if on_tpu:
        from mst_tpu.train.predictor import make_predict_fn as _mpf

        predict_sal = _mpf(model, tta=False, with_saliency=True)
        ps, sal = predict_sal(params, source, None)
        float(jnp.sum(ps).astype(jnp.float32))
        t0 = time.perf_counter()
        sal_iters = max(iters // 2, 5)
        for _ in range(sal_iters):
            ps, sal = predict_sal(params, source, None)
        float(jnp.sum(ps).astype(jnp.float32))  # forced host sync
        sal_vps = batch / ((time.perf_counter() - t0) / sal_iters)

        # --use_rollout saliency: the in-VMEM carry-row chain (previously
        # the flax path sowing 12 full attention tensors per slice)
        predict_ro = _mpf(model, tta=False, with_saliency=True,
                          plane_mode="rollout")
        ps, _ = predict_ro(params, source, None)
        float(jnp.sum(ps).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(sal_iters):
            ps, _ = predict_ro(params, source, None)
        float(jnp.sum(ps).astype(jnp.float32))
        rollout_vps = batch / ((time.perf_counter() - t0) / sal_iters)

    # Secondary: full training-step throughput (fwd + CE + bwd + AdamW in
    # one donated program).
    import optax

    from mst_tpu.train.trainer import TrainState, make_optimizer, make_train_step

    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=make_optimizer(1e-6), dropout_rng=jax.random.PRNGKey(1),
    )
    step = make_train_step(model)  # fused residual-sharing path on TPU
    target = jnp.zeros((batch,), jnp.int32)
    state, *_ = step(state, source, target, None)
    jax.block_until_ready(state.params)
    t0 = time.perf_counter()
    train_iters = max(iters // 2, 5)
    for _ in range(train_iters):
        state, loss, _ = step(state, source, target, None)
    float(loss)  # forced device->host sync (block_until_ready alone has
    # been observed returning early through the remote-dispatch relay)
    train_dt = (time.perf_counter() - t0) / train_iters
    del optax

    # Train at batch 8: amortises fusion/head/optimizer overhead (the
    # per-device batch a pod host would run).
    train8_vps = None
    if on_tpu:
        source8 = jax.random.normal(jax.random.PRNGKey(3),
                                    (8, 1, depth, hw, hw), jnp.float32)
        params8 = model.init(jax.random.PRNGKey(4), source8[:1])["params"]
        state8 = TrainState.create(
            apply_fn=model.apply, params=params8,
            tx=make_optimizer(1e-6), dropout_rng=jax.random.PRNGKey(5))
        target8 = jnp.zeros((8,), jnp.int32)
        state8, loss8, _ = step(state8, source8, target8, None)
        jax.block_until_ready(state8.params)
        t0 = time.perf_counter()
        for _ in range(train_iters):
            state8, loss8, _ = step(state8, source8, target8, None)
        float(loss8)  # forced device->host sync
        train8_vps = 8 / ((time.perf_counter() - t0) / train_iters)

    # DINOv3 training (patch16 + 4 registers + 2D rope) through the fused
    # rope train kernels (VERDICT r2 #3; previously the flax fallback).
    v3_train_vps = None
    if on_tpu:
        from mst_tpu.models.mst import dino_v3_classifier_slice

        v3 = dino_v3_classifier_slice(out_ch=2, model_size="small",
                                      dtype=jnp.bfloat16, use_flash=True)
        params3 = v3.init(jax.random.PRNGKey(6), source[:1])["params"]
        state3 = TrainState.create(
            apply_fn=v3.apply, params=params3, tx=make_optimizer(1e-6),
            dropout_rng=jax.random.PRNGKey(7))
        step3 = make_train_step(v3)
        state3, loss3, _ = step3(state3, source, target, None)
        jax.block_until_ready(state3.params)
        t0 = time.perf_counter()
        for _ in range(train_iters):
            state3, loss3, _ = step3(state3, source, target, None)
        float(loss3)
        v3_train_vps = batch / ((time.perf_counter() - t0) / train_iters)

    # ViT-giant2 (1536-e, 40-block, SwiGLU) single-chip inference — the
    # biggest encoder the reference supports (`dino.py` model_size 'g') —
    # plus the frozen-encoder TRAIN step on the int8 encoder (`--int8`).
    giant2_vps = giant2_i8_vps = giant2_i8s_vps = giant2_i8_train_vps = None
    if on_tpu:
        try:
            (giant2_vps, giant2_i8_vps, giant2_i8s_vps,
             giant2_i8_train_vps) = _bench_giant2(depth, hw)
        except Exception as e:  # noqa: BLE001 — OOM/compile limits: report n/a
            print(f"# giant2 bench skipped: {type(e).__name__}: {e}",
                  flush=True)

    # Input pipeline: host loader (native NIfTI decode pool + collate) fed
    # from ON-DISK artifacts at realistic LIDC size — proves the host side
    # can sustain the device rates above (VERDICT r3 #8).
    pipeline_vps = pipeline_cached_vps = None
    try:
        pipeline_vps, pipeline_cached_vps = _bench_input_pipeline(depth=depth)
    except Exception as e:  # noqa: BLE001
        print(f"# input pipeline bench skipped: {type(e).__name__}: {e}",
              flush=True)

    # On-device kernel parity (Mosaic-compiled, not interpret mode) embedded
    # in the bench artifact so BENCH_r{N}.json itself proves the kernels
    # (VERDICT r3 #5). Runs every leg of tools/tpu_parity_check.py
    # (14 as of round 4 — the count rides `len(legs)` so new legs land here
    # automatically).
    parity = None
    if on_tpu:
        try:
            import sys

            sys.path.insert(0, str(Path(__file__).parent / "tools"))
            from tpu_parity_check import run_checks

            legs = run_checks()
            parity = {"legs": len(legs),
                      "ok": sum(1 for _, ok in legs if ok),
                      "failed": [n for n, ok in legs if not ok]}
        except Exception as e:  # noqa: BLE001
            print(f"# parity legs skipped: {type(e).__name__}: {e}",
                  flush=True)

    headline = max(vps, best_vps)
    baseline_path = Path(__file__).parent / "BASELINE_measured.json"
    vs = None
    if baseline_path.exists():
        base = json.loads(baseline_path.read_text())
        vs = headline / base["volumes_per_sec"]

    detail = {
        "batch": best_batch, "depth": depth, "hw": hw,
        "latency_ms_per_batch": round(dt * 1e3, 2),
        "train_volumes_per_sec": round(batch / train_dt, 2),
        "train_step_ms": round(train_dt * 1e3, 2),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    if sweep:
        detail["serving_batch_sweep"] = sweep
        knee = sweep.get(str(best_batch), {})
        # keep the reported latency paired with the reported knee batch
        detail["latency_ms_per_batch"] = knee.get(
            "ms_per_batch", detail["latency_ms_per_batch"])
        detail["p50_ms"] = knee.get("p50_ms")
        detail["p99_ms"] = knee.get("p99_ms")
        # per-call latencies are host-synced per call; on this dev host the
        # axon relay adds ~25 ms RTT per sync (compare latency_ms_per_batch,
        # which pipelines) — on a directly-attached chip p50 ≈ ms_per_batch
        detail["latency_includes_relay_rtt"] = True
        detail["bs4_volumes_per_sec"] = round(vps, 2)
        # Single-volume latency, split per VERDICT r3 #7: device_p50_ms is
        # the pipelined per-batch time at bs1 (≈ the device program time —
        # relay RTT amortises out); e2e_p50_ms is the per-call host-synced
        # p50 (includes the ~25 ms relay RTT of this dev host).
        bs1 = sweep.get("1", {})
        detail["device_p50_ms"] = bs1.get("ms_per_batch")
        detail["e2e_p50_ms"] = bs1.get("p50_ms")
    if pipeline_vps is not None:
        import os

        detail["input_pipeline_volumes_per_sec"] = round(pipeline_vps, 1)
        # The cold loader is gzip-inflate-bound (~70%, tools profile) and the
        # inflate pool parallelises per file: vol/s scales with host cores.
        # This dev container has 1 core; a v5e pod host (200+ vCPU) covers
        # the serve rate with ~20 cores of inflate.
        detail["input_pipeline_host_cores"] = os.cpu_count()
    if pipeline_cached_vps is not None:
        # Warm decoded-volume disk cache (--decode_cache): epochs >= 2 skip
        # the inflate entirely and read raw arrays at page-cache speed.
        detail["input_pipeline_cached_volumes_per_sec"] = round(
            pipeline_cached_vps, 1)
    if parity is not None:
        detail["parity"] = parity
    if int8_vps is not None:
        detail["int8_volumes_per_sec"] = round(int8_vps, 2)
    if int8_static_vps is not None:
        detail["int8_static_volumes_per_sec"] = round(int8_static_vps, 2)
    if d512_ms is not None:
        # single 512-slice volume, fused bf16 serving (sequence scaling)
        detail["d512_single_volume_ms"] = round(d512_ms, 2)
    if tta_vps is not None:
        detail["tta8_volumes_per_sec"] = round(tta_vps, 2)
    if sal_vps is not None:
        detail["saliency_volumes_per_sec"] = round(sal_vps, 2)
    if rollout_vps is not None:
        detail["rollout_saliency_volumes_per_sec"] = round(rollout_vps, 2)
    if train8_vps is not None:
        detail["train_bs8_volumes_per_sec"] = round(train8_vps, 2)
    if v3_train_vps is not None:
        detail["dinov3_train_volumes_per_sec"] = round(v3_train_vps, 2)
    if giant2_vps is not None:
        detail["giant2_volumes_per_sec"] = round(giant2_vps, 3)
    if giant2_i8_vps is not None:
        detail["giant2_int8_volumes_per_sec"] = round(giant2_i8_vps, 3)
    if giant2_i8s_vps is not None:
        detail["giant2_int8_static_volumes_per_sec"] = round(giant2_i8s_vps, 3)
    if giant2_i8_train_vps is not None:
        detail["giant2_int8_train_volumes_per_sec"] = round(
            giant2_i8_train_vps, 3)
    return {
        "metric": "MST-DINOv2 ViT-S/14 LIDC inference throughput",
        "value": round(headline, 3),
        "unit": "volumes/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        # the only measurable anchor in this zero-egress environment is the
        # torch reference on THIS HOST'S CPU (BASELINE_measured.json) — a
        # hardware asymmetry, not a like-for-like kernel comparison
        "baseline_is_cpu_reference": True,
        "detail": detail,
    }


def _bench_input_pipeline(depth: int = 32, n_vols: int = 48,
                          batch: int = 8, passes: int = 2):
    """Host-loader sustained rate from ON-DISK artifacts (VERDICT r3 #8):
    writes `n_vols` realistic LIDC-style crops (256x256xD int16 nii.gz,
    ~the step4_crop_or_pad output the trainer consumes) to a temp dir,
    then drives the exact producer path the DataModule runs per chunk —
    native pthread-pool NIfTI decode (`prefetch_decode` -> libmstio),
    per-sample mask-centred random crop_or_pad(224,224,D), collate —
    and reports (cold vol/s, warm-decode-cache vol/s). Cold is the
    gzip-inflate-bound first-epoch rate; warm is every later epoch with
    `--decode_cache` set (raw-array page-cache reads, no inflate). The
    device-side augment + train step are measured separately above; on a
    real TPU host the prefetch thread overlaps this with device compute,
    so the sustained train rate is min(host rate, device rate)."""
    import shutil
    import tempfile

    import numpy as np
    import pandas as pd

    from mst_tpu.data.datamodule import _collate
    from mst_tpu.data.datasets.lidc import LIDC_Dataset3D
    from mst_tpu.utils.nifti import write_nifti

    root = Path(tempfile.mkdtemp(prefix="mst_pipe_bench_"))
    try:
        rng = np.random.default_rng(0)
        rows = []
        for i in range(n_vols):
            d = (root / "preprocessed_crop" / "data" / f"LIDC-IDRI-{i:04d}"
                 / f"study{i}" / f"series{i}")
            d.mkdir(parents=True)
            # HU-valued int16 with smooth structure + noise: compresses like
            # real CT (pure noise would overstate decode cost, constants
            # would understate it)
            base = rng.normal(-400, 250, (8, 8, depth)).astype(np.float32)
            vol = np.kron(base, np.ones((32, 32, 1), np.float32))
            vol += rng.normal(0, 60, (256, 256, depth)).astype(np.float32)
            vol = np.clip(vol, -1024, 3071).astype(np.int16)
            seg = np.zeros((256, 256, depth), np.uint8)
            seg[120:136, 120:136, depth // 2 - 3:depth // 2 + 3] = 1
            aff = np.diag([0.7, 0.7, 2.5, 1.0])
            write_nifti(d / "img_0.nii.gz", vol, aff)
            write_nifti(d / "seg_0.nii.gz", seg, aff)
            rows.append({
                "patient_id": f"LIDC-IDRI-{i:04d}",
                "study_instance_uid": f"study{i}",
                "series_instance_uid": f"series{i}",
                "nodule_idx": 0, "annotation_num": 2,
                "Malignant": i % 2, "Fold": 0, "Split": "train",
            })
        splits = root / "preprocessed" / "splits"
        splits.mkdir(parents=True)
        pd.DataFrame(rows).to_csv(splits / "split.csv", index=False)

        def run(ds) -> float:
            idx = np.arange(len(ds))
            # warm pass (page cache + thread pool spin-up + cache
            # materialisation for the decode-cache leg), then timed passes
            for lo in range(0, len(idx) - batch + 1, batch):
                chunk = [int(i) for i in idx[lo:lo + batch]]
                ds.prefetch_decode(chunk)
                _collate([ds[i] for i in chunk])
            # the cache materialises write-behind; the timed warm passes
            # must measure pure hits, not racing re-decodes
            type(ds).flush_cache_writes()
            t0 = time.perf_counter()
            count = 0
            for _ in range(passes):
                for lo in range(0, len(idx) - batch + 1, batch):
                    chunk = [int(i) for i in idx[lo:lo + batch]]
                    ds.prefetch_decode(chunk)
                    _collate([ds[i] for i in chunk])
                    count += len(chunk)
            return count / (time.perf_counter() - t0)

        cold = run(LIDC_Dataset3D(root, split="train", fold=0,
                                  image_crop=(224, 224, depth),
                                  random_center=True, flip=True, noise=True,
                                  decode_cache=False))
        warm = run(LIDC_Dataset3D(root, split="train", fold=0,
                                  image_crop=(224, 224, depth),
                                  random_center=True, flip=True, noise=True,
                                  decode_cache=root / "decode_cache"))
        return cold, warm
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _bench_giant2(depth: int, hw: int, iters: int = 5) -> tuple:
    """ViT-g2 per-volume inference throughput (batch 1, fused path):
    (bf16 vol/s, int8 vol/s | None, int8 frozen-train vol/s | None). The
    int8 legs matter most at giant scale — the quantise/dequantise VPU
    overhead amortises over E=1536 matmuls far better than at ViT-S
    width; the train leg is the reference's giant workflow (frozen
    encoder, `dino.py:69-71`) on the `--int8` trainer path."""
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.models.vit_fast import fused_mst_logits

    model = DinoSliceClassifier(out_ch=2, model_size="giant2",
                                dtype=jnp.bfloat16)
    source = jax.random.normal(jax.random.PRNGKey(2),
                               (1, 1, depth, hw, hw), jnp.float32)
    # bf16 params: inference-shaped memory (1.1B params = 2.2 GB). Init on a
    # tiny 28x28 single-slice input — param shapes are input-independent,
    # and this avoids compiling a full-size f32 init forward just to draw
    # random weights.
    params = model.init(jax.random.PRNGKey(0),
                        source[:, :, :1, :28, :28])["params"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    # params as an ARGUMENT — closing over 2.2 GB of weights bakes them into
    # the program as captured constants (huge lowering + compile).
    @jax.jit
    def forward(prm, src):
        return fused_mst_logits(prm, src, model)

    from mst_tpu.utils.benchtime import timed_min

    def _timed(fn, *a):
        return timed_min(fn, *a, iters=iters)

    bf16_vps = 1.0 / _timed(forward, params, source)

    i8_vps = i8s_vps = i8_train_vps = None
    try:
        from mst_tpu.ops.fused_int8 import quantize_mst_params_int8

        forward_q = jax.jit(lambda p, s: fused_mst_logits(p, s, model))
        # dynamic per-token scales — the historical giant2_int8 key keeps
        # its meaning; static scales get their own key below
        qdyn = quantize_mst_params_int8(params)
        i8_vps = 1.0 / _timed(forward_q, qdyn, source)
        del qdyn
        # calibrated static scales (also feeds the frozen-train leg)
        qparams = quantize_mst_params_int8(params, model, source)
        i8s_vps = 1.0 / _timed(forward_q, qparams, source)
    except Exception as e:  # noqa: BLE001
        print(f"# giant2 int8 leg skipped: {type(e).__name__}: {e}",
              flush=True)

    try:
        if i8s_vps is not None:
            # frozen-encoder TRAIN on the int8 encoder (trainer `--int8
            # --int8_calib`): stop-gradient forward on the W8A8 serving
            # kernels, backward through fusion + head only
            from mst_tpu.train.trainer import (
                TrainState,
                make_optimizer,
                make_train_step,
            )

            frozen = DinoSliceClassifier(out_ch=2, model_size="giant2",
                                         dtype=jnp.bfloat16, freeze=True)
            state = TrainState.create(
                apply_fn=frozen.apply, params=params,
                tx=make_optimizer(1e-6, freeze_encoder=True),
                dropout_rng=jax.random.PRNGKey(8))
            step_g = make_train_step(frozen,
                                     int8_encoder=qparams["encoder"])
            # batch 2 = the reference giant-workflow batch (main_train bs=2)
            src2 = jnp.concatenate([source, source], axis=0)
            tgt = jnp.zeros((2,), jnp.int32)
            state, loss_g, _ = step_g(state, src2, tgt, None)
            float(loss_g)
            t0 = time.perf_counter()
            for _ in range(iters):
                state, loss_g, _ = step_g(state, src2, tgt, None)
            float(loss_g)  # forced host sync
            i8_train_vps = 2.0 / ((time.perf_counter() - t0) / iters)
    except Exception as e:  # noqa: BLE001
        print(f"# giant2 int8 train leg skipped: {type(e).__name__}: {e}",
              flush=True)
    return bf16_vps, i8_vps, i8s_vps, i8_train_vps


if __name__ == "__main__":
    result = bench()
    print(json.dumps(result))
