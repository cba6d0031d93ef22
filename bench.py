#!/usr/bin/env python
"""Benchmark: MST-DINOv2 (ViT-S/14) per-volume inference throughput.

North-star metric (BASELINE.json): volumes/sec/chip for LIDC-shaped
volumes [1, 32, 224, 224] through the full MST forward (per-slice ViT with
Pallas flash attention in bf16 + slice-fusion transformer + head).

Output contract (VERDICT r4 #1 — the r4 record was lost to a driver
timeout that left zero parseable output):

- The result JSON line is printed PROGRESSIVELY: once right after the
  core serving sweep + train legs, then re-printed (enriched, a strict
  superset) after every optional leg group, and one final time at the
  end. Whichever line the driver parses (first or last), it gets a valid
  complete record; a timeout mid-run still leaves the latest checkpoint
  on stdout.
- A wall-clock budget (env `MST_BENCH_BUDGET_S`, default 1500 s, timed
  from process start INCLUDING backend init — the axon relay takes
  ~2 min to come up cold) gates every optional leg; legs that don't fit
  are skipped with a note and listed in `detail.env.skipped`.
- JAX's persistent compilation cache is enabled at `.xla_cache/` so the
  driver's run reuses every executable compiled by the builder's runs
  (the four giant2 legs alone compile a 1.1B-param program).

`vs_baseline` compares against the measured PyTorch reference anchor in
BASELINE_measured.json (the reference's own DinoV2ClassifierSlice forward,
measured in-situ on this host's CPU by tools/reference_baseline.py — the
reference repo ships no GPU numbers and this environment has no GPU;
see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

_T0 = time.monotonic()  # before jax import: backend init counts
_BUDGET = float(os.environ.get("MST_BENCH_BUDGET_S", "1500"))

import jax
import jax.numpy as jnp

_SKIPPED: list = []
_LEG_S: dict = {}
# estimates below are WARM-cache costs; scaled by the observed cold
# factor (first-compile duration) before gating
_COLD_FACTOR = 1.0


def _elapsed() -> float:
    return time.monotonic() - _T0


def _remaining() -> float:
    return _BUDGET - _elapsed()


def _gate(name: str, warm_est_s: float) -> bool:
    """True if leg `name` fits the remaining budget; else skip-with-note."""
    est = warm_est_s * _COLD_FACTOR
    rem = _remaining()
    if rem < est:
        print(f"# leg '{name}' skipped: {rem:.0f}s budget left < "
              f"~{est:.0f}s estimate (warm {warm_est_s:.0f}s x "
              f"cold-factor {_COLD_FACTOR:.1f})", flush=True)
        _SKIPPED.append(name)
        return False
    return True


class _timed_leg:
    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        self.t0 = time.monotonic()

    def __exit__(self, *exc):
        _LEG_S[self.name] = round(time.monotonic() - self.t0, 1)
        return False


def _measure(forward, source, iters: int) -> float:
    """Seconds per call, min over 2 passes; forced host sync (see
    BASELINE.md: block_until_ready can return early through the relay)."""
    from mst_tpu.utils.benchtime import timed_min

    return timed_min(forward, source, iters=iters)


_INIT_CACHE: dict = {}


def _jit_init(model, shape, key):
    """Draw init params via ONE jitted (persistently cacheable) program.

    Eager flax init is hundreds of sequential relay dispatches (~90 s
    measured for ViT-S on this host); jitted it is a single cache-hittable
    executable (~11 s warm). Shapes are input-independent, so a tiny
    single-slice input suffices for every model here. The jit wrapper is
    memoised per (model, shape) so a second init of the same model (the
    train_bs8 leg) is a free in-process executable hit, not a re-lower."""
    k = (id(model), shape)
    if k not in _INIT_CACHE:

        @jax.jit
        def init(rng):
            return model.init(rng, jnp.zeros(shape))["params"]

        _INIT_CACHE[k] = init
    return _INIT_CACHE[k](key)


def _measure_pf(forward, prm, src, iters: int) -> float:
    """Same, for params-as-argument forwards."""
    from mst_tpu.utils.benchtime import timed_min

    return timed_min(forward, prm, src, iters=iters)


def _env_detail() -> dict:
    env = {
        "host_cores": os.cpu_count(),
        # host contention at read time: regressions across rounds were
        # undiagnosable without it (VERDICT r4 "unexplained day-to-day
        # variance" — the r4 warm-loader leg dropped below a prior cold
        # leg on a busier host)
        "loadavg_1m": round(os.getloadavg()[0], 2),
        "budget_s": _BUDGET,
        "elapsed_s": round(_elapsed(), 1),
        "cold_factor": round(_COLD_FACTOR, 2),
        "leg_seconds": dict(_LEG_S),
        "skipped": list(_SKIPPED),
    }
    try:
        from mst_tpu.data import native_io

        env["libmstio"] = native_io.available()
        env["libdeflate"] = native_io.has_libdeflate()
    except Exception:  # noqa: BLE001 — env detail is best-effort
        pass
    return env


def bench_stream(batch: int = 4, depth: int = 32, hw: int = 224,
                 iters: int = 20, warmup: int = 3):
    """Generator: yields the result dict after each leg group (each yield
    is a valid, monotonically enriched record — see module docstring)."""
    global _COLD_FACTOR

    from mst_tpu.export import enable_compilation_cache

    cache_dir = enable_compilation_cache(
        os.environ.get("MST_COMPILATION_CACHE",
                       str(Path(__file__).parent / ".xla_cache")))
    print(f"# compilation cache: {cache_dir}", flush=True)

    from mst_tpu.models.mst import dino_v2_classifier_slice

    on_tpu = jax.default_backend() == "tpu"
    model = dino_v2_classifier_slice(
        out_ch=2, model_size="small",
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_flash=on_tpu,
    )
    key = jax.random.PRNGKey(0)
    source = jax.random.normal(key, (batch, 1, depth, hw, hw), jnp.float32)
    # init on a tiny single-slice input: param shapes (incl. the 37x37
    # pos-emb grid and the 256-entry slice table) are input-independent,
    # and this avoids compiling a full-size f32 init forward through the
    # relay (minutes) just to draw random weights — same trick as the
    # giant2 leg. JITTED: eager flax init is hundreds of relay dispatches
    # (~90 s measured); one jitted (cacheable) init program is ~11 s.
    params = _jit_init(model, (1, 1, 1, 28, 28), key)

    # params as an ARGUMENT, never a closure: closed-over trees bake
    # ~190 MB of constants into the program — compile slows down, the
    # persistent cache writes a 198 MB entry PER batch shape, and any
    # value difference between runs is a guaranteed cache miss. With
    # params parametric the executable is value-independent and the
    # driver's run cache-hits whatever this session compiled.
    if on_tpu:
        from mst_tpu.models.vit_fast import fused_mst_logits

        @jax.jit
        def forward_p(prm, src):
            return fused_mst_logits(prm, src, model)
    else:
        @jax.jit
        def forward_p(prm, src):
            return model.apply({"params": prm}, src, deterministic=True)

    def forward(src):
        return forward_p(params, src)

    # COMPILE-ONLY probe calibrates the cold factor for all later gates:
    # a persistent-cache hit is ~10 s through the relay, a cold
    # Mosaic+XLA compile of this program is 300+ s. Explicitly separated
    # from the first EXECUTION below — exec pays a once-per-process
    # device-runtime/executable-load cost (~30 s here) that is the same
    # warm or cold and was previously mis-attributed to compilation,
    # pinning the factor at max and skipping legs on fully-warm runs.
    t_c = time.monotonic()
    compiled_probe = forward_p.lower(params, source).compile()
    compile_s = time.monotonic() - t_c
    _COLD_FACTOR = min(max(compile_s / 10.0, 1.0), 12.0)
    t_c = time.monotonic()
    # first exec runs the AOT-compiled object itself (the jit wrapper
    # would re-lower and pay a duplicate ~10 s cache-hit compile here,
    # polluting the first-exec number; the wrapper's own compile lands in
    # the warmup loop below instead). Forced device->host VALUE read:
    # block_until_ready returns early through the axon relay (run 3
    # reported "11.4s" here while the real compile finished 590s later
    # INSIDE the first timed leg).
    float(jnp.sum(compiled_probe(params, source)).astype(jnp.float32))
    print(f"# first compile {compile_s:.1f}s -> cold_factor "
          f"{_COLD_FACTOR:.1f}; first exec {time.monotonic() - t_c:.1f}s; "
          f"elapsed {_elapsed():.0f}s of {_BUDGET:.0f}s", flush=True)
    for _ in range(warmup):
        forward(source).block_until_ready()
    with _timed_leg("core_bs4"):
        dt = _measure(forward, source, iters)
    vps = batch / dt

    # Serving batch sweep: find the throughput knee (VERDICT r2 #1). The
    # headline metric is the best sustained throughput across batch sizes.
    # ms_per_batch is the pipelined per-batch wall time = device program
    # time (relay RTT amortises across the window); the dedicated
    # tail-latency leg below owns per-call percentiles (VERDICT r4 #5).
    sweep = {}
    best_batch, best_vps = batch, vps
    if on_tpu:
        with _timed_leg("sweep"):
            for b in (1, 2, 4, 8, 16, 32, 64):
                if b == batch:
                    bdt = dt
                    src_b = source
                else:
                    src_b = jax.random.normal(
                        key, (b, 1, depth, hw, hw), jnp.float32)
                    forward(src_b).block_until_ready()
                    bdt = _measure(forward, src_b, max(iters // 2, 8))
                sweep[str(b)] = {"volumes_per_sec": round(b / bdt, 1),
                                 "ms_per_batch": round(bdt * 1e3, 2)}
                if b / bdt > best_vps:
                    best_vps, best_batch = b / bdt, b

    # Training throughput (fwd + CE + bwd + AdamW in one donated program),
    # at the reference batch (4) and the pod per-device batch (8).
    from mst_tpu.train.trainer import TrainState, make_optimizer, make_train_step

    # train on a COPY of the param tree: the train step donates its state,
    # and the serving legs below (int8/large-D/saliency/tta/tail-latency)
    # keep using `params` — round 5's first run deleted them mid-bench
    state = TrainState.create(
        apply_fn=model.apply, params=jax.tree.map(jnp.copy, params),
        tx=make_optimizer(1e-6), dropout_rng=jax.random.PRNGKey(1),
    )
    step = make_train_step(model)  # fused residual-sharing path on TPU
    target = jnp.zeros((batch,), jnp.int32)
    train_iters = max(iters // 2, 5)
    with _timed_leg("train_bs4"):
        state, *_ = step(state, source, target, None)
        jax.block_until_ready(state.params)
        t0 = time.perf_counter()
        for _ in range(train_iters):
            state, loss, _ = step(state, source, target, None)
        float(loss)  # forced device->host sync (block_until_ready alone
        # has been observed returning early through the relay)
        train_dt = (time.perf_counter() - t0) / train_iters

    train8_vps = None
    if on_tpu:
        with _timed_leg("train_bs8"):
            source8 = jax.random.normal(jax.random.PRNGKey(3),
                                        (8, 1, depth, hw, hw), jnp.float32)
            params8 = _jit_init(model, (1, 1, 1, 28, 28),
                                jax.random.PRNGKey(4))
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

    # ---- headline checkpoint: everything above is the core record ----
    headline = max(vps, best_vps)
    baseline_path = Path(__file__).parent / "BASELINE_measured.json"
    vs = None
    if baseline_path.exists():
        base = json.loads(baseline_path.read_text())
        vs = headline / base["volumes_per_sec"]

    detail = {
        "batch": best_batch, "depth": depth, "hw": hw,
        "train_volumes_per_sec": round(batch / train_dt, 2),
        "train_step_ms": round(train_dt * 1e3, 2),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
    }
    if sweep:
        detail["serving_batch_sweep"] = sweep
        knee = sweep.get(str(best_batch), {})
        detail["latency_ms_per_batch"] = knee.get(
            "ms_per_batch", round(dt * 1e3, 2))
        detail["bs4_volumes_per_sec"] = round(vps, 2)
        # device-program time for one volume (pipelined window / n; the
        # relay RTT amortises out) — per-call e2e percentiles live in
        # detail.tail_latency
        detail["device_p50_ms"] = sweep.get("1", {}).get("ms_per_batch")
    else:
        detail["latency_ms_per_batch"] = round(dt * 1e3, 2)
    if train8_vps is not None:
        detail["train_bs8_volumes_per_sec"] = round(train8_vps, 2)

    result = {
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

    detail["env"] = _env_detail()
    yield result

    # ---- optional legs, most valuable first; each budget-gated ----

    # Int8 (W8A8) serving: quantized encoder matmuls on the MXU's doubled
    # int8 rate (`ops/fused_int8.py`), measured at the knee batch — both
    # dynamic per-token scales and calibrated static (folded) scales.
    if on_tpu and _gate("int8", 25):
        with _timed_leg("int8"):
            try:
                from mst_tpu.ops.fused_int8 import quantize_mst_params_int8

                qparams = quantize_mst_params_int8(params)
                src_q = jax.random.normal(
                    key, (best_batch, 1, depth, hw, hw), jnp.float32)

                forward_q = jax.jit(
                    lambda prm, src: fused_mst_logits(prm, src, model))

                forward_q(qparams, src_q).block_until_ready()
                qdt = _measure_pf(forward_q, qparams, src_q,
                                  max(iters // 2, 8))
                detail["int8_volumes_per_sec"] = round(best_batch / qdt, 2)

                sparams = quantize_mst_params_int8(params, model, src_q[:2])
                forward_q(sparams, src_q).block_until_ready()
                sdt = _measure_pf(forward_q, sparams, src_q,
                                  max(iters // 2, 8))
                detail["int8_static_volumes_per_sec"] = round(
                    best_batch / sdt, 2)
            except Exception as e:  # noqa: BLE001 — report and continue
                print(f"# int8 bench skipped: {type(e).__name__}: {e}",
                      flush=True)
        detail["env"] = _env_detail()
        yield result

    # Large-D single-volume serving (the 1000-slice-CT sequence-scaling
    # story, SURVEY §5.7): one volume at D=512/1024/2048 through the fused
    # path — the reference's Embedding(256) hard cap (`dino.py:81-82`) is
    # the capability being beaten. tools/bench_large_d.py has the full
    # sweep + HBM-ceiling notes.
    if on_tpu:
        for d_big in (512, 1024, 2048):
            if not _gate(f"d{d_big}", 12):
                break
            with _timed_leg(f"d{d_big}"):
                try:
                    # f32 input like every other serving leg (the fused
                    # path casts on-device) so per-slice ratios compare
                    src_d = jax.random.normal(
                        key, (1, 1, d_big, hw, hw), jnp.float32)
                    d_ms = _measure_pf(forward_p, params, src_d, 6) * 1e3
                    detail[f"d{d_big}_single_volume_ms"] = round(d_ms, 2)
                    del src_d
                except Exception as e:  # noqa: BLE001
                    print(f"# large-D D={d_big} leg skipped: "
                          f"{type(e).__name__}: {e}", flush=True)
        detail["env"] = _env_detail()
        yield result

    # Explainability serving (--get_attention/--get_segmentation): fused
    # path with the last-block CLS-row kernel + combined saliency volume;
    # --use_rollout = the in-VMEM carry-row chain.
    if on_tpu and _gate("saliency", 30):
        with _timed_leg("saliency"):
            from mst_tpu.train.predictor import make_predict_fn as _mpf

            sal_iters = max(iters // 2, 5)
            predict_sal = _mpf(model, tta=False, with_saliency=True)
            ps, sal = predict_sal(params, source, None)
            float(jnp.sum(ps).astype(jnp.float32))
            t0 = time.perf_counter()
            for _ in range(sal_iters):
                ps, sal = predict_sal(params, source, None)
            float(jnp.sum(ps).astype(jnp.float32))  # forced host sync
            detail["saliency_volumes_per_sec"] = round(
                batch / ((time.perf_counter() - t0) / sal_iters), 2)

            predict_ro = _mpf(model, tta=False, with_saliency=True,
                              plane_mode="rollout")
            ps, _ = predict_ro(params, source, None)
            float(jnp.sum(ps).astype(jnp.float32))
            t0 = time.perf_counter()
            for _ in range(sal_iters):
                ps, _ = predict_ro(params, source, None)
            float(jnp.sum(ps).astype(jnp.float32))
            detail["rollout_saliency_volumes_per_sec"] = round(
                batch / ((time.perf_counter() - t0) / sal_iters), 2)
        detail["env"] = _env_detail()
        yield result

    # Batched 8-way flip TTA (offline eval serving mode): all variants of
    # all B volumes in ONE device program.
    if on_tpu and _gate("tta", 20):
        with _timed_leg("tta"):
            from mst_tpu.train.predictor import make_predict_fn

            predict_tta = make_predict_fn(model, tta=True,
                                          with_saliency=False)
            p, _ = predict_tta(params, source, None)
            jax.block_until_ready(p)
            t0 = time.perf_counter()
            tta_iters = max(iters // 2, 5)
            for _ in range(tta_iters):
                p, _ = predict_tta(params, source, None)
            jax.block_until_ready(p)
            detail["tta8_volumes_per_sec"] = round(
                batch / ((time.perf_counter() - t0) / tta_iters), 2)
        detail["env"] = _env_detail()
        yield result

    # DINOv3 training (patch16 + 4 registers + 2D rope) through the fused
    # rope train kernels.
    if on_tpu and _gate("v3_train", 25):
        with _timed_leg("v3_train"):
            from mst_tpu.models.mst import dino_v3_classifier_slice

            v3 = dino_v3_classifier_slice(out_ch=2, model_size="small",
                                          dtype=jnp.bfloat16, use_flash=True)
            params3 = _jit_init(v3, (1, 1, 1, 32, 32),
                                jax.random.PRNGKey(6))
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
            detail["dinov3_train_volumes_per_sec"] = round(
                batch / ((time.perf_counter() - t0) / train_iters), 2)
        detail["env"] = _env_detail()
        yield result






    # Leg order is value-per-second: every cheap headline leg (int8,
    # large-D, saliency, tta, v3_train above) plus the tail-latency and
    # host-only input-pipeline legs run BEFORE the two expensive groups
    # (parity ~650 s warm, giant2 ~120 s warm / ~320 s cold), so a tight
    # budget starves the right things.
    # True serving tail latency (VERDICT r4 #5): >=100 host-synced calls
    # at bs1 and the knee batch. e2e percentiles INCLUDE this dev host's
    # ~25 ms relay RTT (measured and reported separately as rtt_ms_est —
    # a tiny device no-op round trip); device_ms_per_call is the
    # pipelined device-program time from the sweep.
    if on_tpu and _gate("tail_latency", 30):
        with _timed_leg("tail_latency"):
            try:
                tail = {}
                # RTT estimate: host-synced round trips of a 1-element add
                tiny = jax.jit(lambda a: a + 1.0)
                one = jnp.float32(1.0)
                float(tiny(one))
                rtts = []
                for _ in range(30):
                    t0 = time.perf_counter()
                    float(tiny(one))
                    rtts.append(time.perf_counter() - t0)
                rtts.sort()
                rtt_ms = rtts[len(rtts) // 2] * 1e3
                detail["relay_rtt_ms_est"] = round(rtt_ms, 2)
                for b in {1, min(best_batch, 8)}:
                    src_b = jax.random.normal(key, (b, 1, depth, hw, hw),
                                              jnp.float32)
                    forward(src_b).block_until_ready()
                    n = 100
                    lats = []
                    for _ in range(n):
                        t0 = time.perf_counter()
                        float(jnp.sum(forward(src_b)).astype(jnp.float32))
                        lats.append(time.perf_counter() - t0)
                    lats.sort()
                    tail[str(b)] = {
                        "n": n,
                        "e2e_p50_ms": round(lats[n // 2] * 1e3, 2),
                        "e2e_p90_ms": round(lats[int(n * 0.9)] * 1e3, 2),
                        "e2e_p99_ms": round(lats[int(n * 0.99)] * 1e3, 2),
                        "device_ms_per_call": sweep.get(str(b), {}).get(
                            "ms_per_batch"),
                    }
                detail["tail_latency"] = tail
                detail["tail_latency_includes_relay_rtt"] = True
                bs1 = tail.get("1", {})
                detail["e2e_p50_ms"] = bs1.get("e2e_p50_ms")

            except Exception as e:  # noqa: BLE001 — one relay
                # hiccup must not cost the whole record
                print(f"# tail latency leg skipped: "
                      f"{type(e).__name__}: {e}", flush=True)
        detail["env"] = _env_detail()
        yield result

    # Input pipeline: host loader (native NIfTI decode pool + collate) fed
    # from ON-DISK artifacts at realistic LIDC size — proves the host side
    # can sustain the device rates above (VERDICT r3 #8), plus the decode
    # thread-scaling curve (VERDICT r4 #7). Host-side only; the cost scales
    # with this host's (1) core.
    if _gate("input_pipeline", 90):
        with _timed_leg("input_pipeline"):
            try:
                cold, warm, curve = _bench_input_pipeline(depth=depth)
                detail["input_pipeline_volumes_per_sec"] = round(cold, 1)
                detail["input_pipeline_cached_volumes_per_sec"] = round(
                    warm, 1)
                # cold decode vol/s at an explicit pool size of 1/2/4
                # threads ON THIS HOST (oversubscription curve on 1 core;
                # the per-core scaling claim rides tools/bench_pipeline.py)
                detail["input_pipeline_thread_curve"] = curve
            except Exception as e:  # noqa: BLE001
                print(f"# input pipeline bench skipped: "
                      f"{type(e).__name__}: {e}", flush=True)
        detail["env"] = _env_detail()
        yield result

    # On-device kernel parity (Mosaic-compiled, not interpret mode)
    # embedded in the bench artifact so BENCH_r{N}.json itself proves the
    # kernels (VERDICT r3 #5). Runs every leg of tools/tpu_parity_check.py.
    if on_tpu and _gate("parity", 650):
        with _timed_leg("parity"):
            try:
                import sys

                sys.path.insert(0, str(Path(__file__).parent / "tools"))
                from tpu_parity_check import run_checks

                legs = run_checks()
                detail["parity"] = {
                    "legs": len(legs),
                    "ok": sum(1 for _, ok in legs if ok),
                    "failed": [n for n, ok in legs if not ok]}
            except Exception as e:  # noqa: BLE001
                print(f"# parity legs skipped: {type(e).__name__}: {e}",
                      flush=True)
        detail["env"] = _env_detail()
        yield result

    # ViT-giant2 (1536-e, 40-block, SwiGLU) single-chip inference — the
    # biggest encoder the reference supports (`dino.py` model_size 'g') —
    # plus int8 serving and the frozen-encoder int8 TRAIN step. The most
    # compile-expensive group (1.1B-param programs): runs late, behind the
    # largest budget gate.
    if on_tpu and _gate("giant2", 120):
        with _timed_leg("giant2"):
            try:
                g_vps, g_i8, g_i8s, g_i8t = _bench_giant2(depth, hw)
                if g_vps is not None:
                    detail["giant2_volumes_per_sec"] = round(g_vps, 3)
                if g_i8 is not None:
                    detail["giant2_int8_volumes_per_sec"] = round(g_i8, 3)
                if g_i8s is not None:
                    detail["giant2_int8_static_volumes_per_sec"] = round(
                        g_i8s, 3)
                if g_i8t is not None:
                    detail["giant2_int8_train_volumes_per_sec"] = round(
                        g_i8t, 3)
            except Exception as e:  # noqa: BLE001 — OOM/compile limits
                print(f"# giant2 bench skipped: {type(e).__name__}: {e}",
                      flush=True)
        detail["env"] = _env_detail()
        yield result

    # End-to-end HTTP serving (VERDICT r4 #5): concurrent clients ->
    # dynamic batcher -> fused TPU program -> JSON responses, through
    # tools/bench_serve_http. On THIS dev host the tunneled host->device
    # link bounds e2e transfer (~1.7 vol/s, bench_pipeline.py) — the row
    # carries that caveat; the device-program bound is the sweep above.
    if on_tpu and _gate("http_serving", 45):
        with _timed_leg("http_serving"):
            try:
                import sys

                sys.path.insert(0, str(Path(__file__).parent / "tools"))
                import bench_serve_http

                detail["http_serving"] = bench_serve_http.main(
                    clients=4, seconds=8.0, batch=4, quiet=True)
            except Exception as e:  # noqa: BLE001
                print(f"# http serving leg skipped: {type(e).__name__}: {e}",
                      flush=True)
        detail["env"] = _env_detail()
        yield result

    detail["env"] = _env_detail()
    yield result


def _bench_input_pipeline(depth: int = 32, n_vols: int = 32,
                          batch: int = 8, passes: int = 2):
    """Host-loader sustained rate from ON-DISK artifacts (VERDICT r3 #8):
    writes `n_vols` realistic LIDC-style crops (256x256xD int16 nii.gz,
    ~the step4_crop_or_pad output the trainer consumes) to a temp dir,
    then drives the exact producer path the DataModule runs per chunk —
    native pthread-pool NIfTI decode (`prefetch_decode` -> libmstio),
    per-sample mask-centred random crop_or_pad(224,224,D), collate —
    and reports (cold vol/s, warm-decode-cache vol/s, thread curve).
    Cold is the gzip-inflate-bound first-epoch rate; warm is every later
    epoch with `--decode_cache` set (raw-array page-cache reads, no
    inflate). The device-side augment + train step are measured separately
    above; on a real TPU host the prefetch thread overlaps this with
    device compute, so the sustained train rate is min(host, device)."""
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

        def run(ds, num_threads=None) -> float:
            idx = np.arange(len(ds))
            # warm pass (page cache + thread pool spin-up + cache
            # materialisation for the decode-cache leg), then timed passes
            for lo in range(0, len(idx) - batch + 1, batch):
                chunk = [int(i) for i in idx[lo:lo + batch]]
                ds.prefetch_decode(chunk, num_threads=num_threads)
                _collate([ds[i] for i in chunk])
            # the cache materialises write-behind; the timed warm passes
            # must measure pure hits, not racing re-decodes
            type(ds).flush_cache_writes()
            t0 = time.perf_counter()
            count = 0
            for _ in range(passes):
                for lo in range(0, len(idx) - batch + 1, batch):
                    chunk = [int(i) for i in idx[lo:lo + batch]]
                    ds.prefetch_decode(chunk, num_threads=num_threads)
                    _collate([ds[i] for i in chunk])
                    count += len(chunk)
            return count / (time.perf_counter() - t0)

        ds_cold = LIDC_Dataset3D(root, split="train", fold=0,
                                 image_crop=(224, 224, depth),
                                 random_center=True, flip=True, noise=True,
                                 decode_cache=False)
        cold = run(ds_cold)
        # decode-pool scaling at explicit thread counts (cold path, same
        # files): on a 1-core host this is the oversubscription penalty
        # curve; on a multi-core host it shows per-core scaling
        curve = {str(t): round(run(ds_cold, num_threads=t), 1)
                 for t in (1, 2, 4)}
        warm = run(LIDC_Dataset3D(root, split="train", fold=0,
                                  image_crop=(224, 224, depth),
                                  random_center=True, flip=True, noise=True,
                                  decode_cache=root / "decode_cache"))
        return cold, warm, curve
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _bench_giant2(depth: int, hw: int, iters: int = 5) -> tuple:
    """ViT-g2 per-volume inference throughput (batch 1, fused path):
    (bf16 vol/s, int8 vol/s | None, int8-static vol/s | None, int8
    frozen-train vol/s | None). The int8 legs matter most at giant scale —
    the quantise/dequantise VPU overhead amortises over E=1536 matmuls far
    better than at ViT-S width; the train leg is the reference's giant
    workflow (frozen encoder, `dino.py:69-71`) on the `--int8` trainer
    path."""
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
    params = _jit_init(model, (1, 1, 1, 28, 28), jax.random.PRNGKey(0))
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
    qparams = None
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
        if i8s_vps is not None and _gate("giant2_int8_train", 45):
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


def bench(batch: int = 4, depth: int = 32, hw: int = 224,
          iters: int = 20, warmup: int = 3) -> dict:
    """Run all legs (budget permitting); returns the final result dict."""
    result = None
    for result in bench_stream(batch, depth, hw, iters, warmup):
        pass
    return result


if __name__ == "__main__":
    result = None
    try:
        for result in bench_stream():
            print(json.dumps(result), flush=True)
    except Exception:
        # a late-leg crash must not cost the record: re-emit the last
        # checkpoint (already on stdout, but make it the LAST line too)
        if result is not None:
            print(json.dumps(result), flush=True)
        raise
