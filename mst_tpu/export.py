"""AOT serving artifacts + persistent compilation cache.

The reference framework has no deployment story: every `main_predict.py`
invocation re-traces and re-compiles its model (torch eager has no compile
step to skip; our XLA path does — ~20-40 s for ViT-S, ~73 s for the
giant2 int8 serving program on this host). Production TPU serving wants
both halves of the fix:

- `enable_compilation_cache(dir)`: JAX's persistent compilation cache —
  every XLA executable compiled by any CLI is memoized on disk keyed by
  (program, compile options, platform), so restarting a trainer/server
  skips straight to execution. Wired to `--compilation_cache` on the
  train/predict/serve CLIs and the `MST_COMPILATION_CACHE` env var.

- `save_exported(...)` / `load_exported(...)`: a fully self-contained
  serving artifact built on `jax.export` — the jitted predict program
  (the SAME fused Pallas / int8 kernel program `make_predict_fn` serves,
  captured as StableHLO with the Mosaic custom calls embedded) serialized
  per batch bucket, plus the (optionally int8-quantized) weights. A
  deployment host `load_exported()`s it and serves without model code,
  checkpoint machinery, or tracing — only backend compilation of the
  already-lowered program remains (and that hits the compilation cache).

Artifact layout (a directory):
    meta.json          shapes/buckets/model name/jax version/platforms
    program_b{N}.bin   jax.export serialization for batch bucket N
    compiled_b{N}.bin  (optional) the XLA-COMPILED executable for the
                       exporting host's exact platform+device kind — a
                       loading host that matches skips XLA compilation
                       entirely (zero-compile startup); any other host
                       falls back to program_b{N}.bin. Pickle of
                       jax.experimental.serialize_executable output —
                       treat artifacts as trusted local files.
    params.npz         weight pytree, '/'-joined keys (bf16 as uint16
                       views — npz cannot represent ml_dtypes natively)

The exported program takes (params, source) as ARGUMENTS (weights are not
baked into the StableHLO as constants — at giant2 scale that would inflate
lowering by 2.2 GB, see bench.py:_bench_giant2), so one artifact can also
be re-pointed at refreshed weights of the same tree structure.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

__all__ = [
    "enable_compilation_cache",
    "save_exported",
    "load_exported",
    "ExportedPredictor",
]

_META_NAME = "meta.json"
_PARAMS_NAME = "params.npz"


def enable_compilation_cache(cache_dir: Optional[str] = None) -> Optional[str]:
    """Turn on JAX's persistent compilation cache at `cache_dir`.

    Falls back to `$MST_COMPILATION_CACHE` when `cache_dir` is None;
    returns the directory in use (None = left disabled). Thresholds are
    zeroed so every executable is cached — medical-volume serving has few,
    large programs, exactly the shape the cache is for.
    """
    import jax

    cache_dir = cache_dir or os.environ.get("MST_COMPILATION_CACHE")
    if not cache_dir:
        return None
    path = Path(cache_dir).expanduser()
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return str(path)


# ---------------------------------------------------------------------------
# params <-> npz (bf16 and other ml_dtypes stored as same-width uint views)


def _flatten_params(params) -> dict:
    import jax

    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = "/".join(
            k.key if hasattr(k, "key") else str(k.idx) for k in keypath)
        flat[name] = np.asarray(leaf)
    return flat


_UINT_VIEW = {1: np.uint8, 2: np.uint16, 4: np.uint32}


def _save_params_npz(path: Path, params) -> dict:
    """Returns {key: dtype_name} for leaves stored as uint views."""
    flat = _flatten_params(params)
    dtypes = {}
    arrays = {}
    for k, v in flat.items():
        if v.dtype.kind == "V" or v.dtype.name not in np.sctypeDict:
            # ml_dtypes (bfloat16, int4, ...) round-trip npz as raw void —
            # store a same-width uint view + the real dtype name
            dtypes[k] = v.dtype.name
            arrays[k] = v.view(_UINT_VIEW[v.dtype.itemsize])
        else:
            arrays[k] = v
    np.savez(path, **arrays)
    return dtypes


def _load_params_npz(path: Path, dtypes: dict) -> dict:
    import ml_dtypes  # ships with jax

    out = {}
    with np.load(path) as z:
        for k in z.files:
            v = z[k]
            if k in dtypes:
                v = v.view(np.dtype(getattr(ml_dtypes, dtypes[k])))
            out[k] = v
    tree: dict = {}
    for k, v in out.items():
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


# ---------------------------------------------------------------------------
# export / load


def _arg_specs(params, src_shape, with_mask: bool):
    import jax

    spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype), params)
    specs = [spec, jax.ShapeDtypeStruct(src_shape, np.float32)]
    if with_mask:
        # src_key_padding_mask [B, D], True = padded slice (the MRNet
        # contract, datamodule.py padding-mask derivation)
        specs.append(jax.ShapeDtypeStruct((src_shape[0], src_shape[2]),
                                          np.bool_))
    return specs


def _export_one(fn, specs, platforms):
    import jax
    from jax import export as jexport

    # Mosaic TPU kernels lower to `tpu_custom_call`; jax.export's default
    # safety policy rejects custom calls it cannot promise forward
    # compatibility for. These artifacts pair with a pinned serving image
    # (meta.json records the jax version), so the check is waived for the
    # Mosaic target only.
    checks = [jexport.DisabledSafetyCheck.custom_call("tpu_custom_call"),
              jexport.DisabledSafetyCheck.custom_call("Sharding")]
    exp = jexport.export(jax.jit(fn), platforms=platforms,
                         disabled_checks=checks)(*specs)
    return bytes(exp.serialize())


def _save_compiled(out: Path, fn, params, buckets, depth, hw,
                   with_mask: bool) -> str:
    """AOT-compile each bucket on the current backend and persist the
    executables; returns the device kind they are pinned to."""
    import pickle

    import jax
    from jax.experimental.serialize_executable import serialize

    for b in buckets:
        specs = _arg_specs(params, (b, 1, depth, hw, hw), with_mask)
        compiled = jax.jit(fn).lower(*specs).compile()
        blob = pickle.dumps(serialize(compiled))
        (out / f"compiled_b{b}.bin").write_bytes(blob)
    return jax.devices()[0].device_kind


def save_exported(out_dir, model, params, *, batch_sizes: Sequence[int],
                  depth: int = 32, hw: int = 224,
                  with_saliency: bool = False, plane_mode: str = "last",
                  tta: bool = False, batch_stats=None, with_mask: bool = False,
                  platforms: Optional[Sequence[str]] = None,
                  extra_meta: Optional[dict] = None) -> Path:
    """Export the predict program at each batch bucket + the weights.

    `params` may already be int8-quantized (`quantize_mst_params_int8`) —
    the traced program then IS the W8A8 serving program. `platforms`
    defaults to the current backend; pass ("tpu",) to cross-export from a
    CPU host (the Mosaic payload is generated at lowering time).
    `with_mask` exports programs taking a [B, D] src_key_padding_mask
    (MRNet's variable-depth contract); without it the mask is traced as
    None.
    """
    import jax

    from mst_tpu.train.predictor import make_predict_fn

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    predict = make_predict_fn(model, tta=tta, with_saliency=with_saliency,
                              batch_stats=batch_stats, plane_mode=plane_mode)

    if with_mask:
        fn = predict
    else:
        def fn(p, source):
            return predict(p, source, None)

    buckets = sorted(set(int(b) for b in batch_sizes))
    for b in buckets:
        specs = _arg_specs(params, (b, 1, depth, hw, hw), with_mask)
        data = _export_one(fn, specs, platforms)
        (out / f"program_b{b}.bin").write_bytes(data)

    # AOT-compiled leg: when exporting for the platform we are running on,
    # also ship the XLA executable itself. A matching serving host then
    # starts with ZERO compilation (the persistent compilation cache does
    # not help deserialized exported modules — their cache keys are not
    # stable across processes, measured in tools/bench_export.py).
    compiled_device = None
    if ((platforms is None or list(platforms) == [jax.default_backend()])
            and len(jax.devices()) == 1):
        # single-device hosts only: executables serialize with the
        # compiling process's device assignment baked in, and a multi-
        # device host's assignment does not round-trip to a single-chip
        # server (and vice versa)
        try:
            compiled_device = _save_compiled(out, fn, params, buckets,
                                             depth, hw, with_mask)
        except Exception as e:  # noqa: BLE001 — optional leg, never fatal
            import logging

            logging.getLogger(__name__).warning(
                "compiled leg skipped: %s: %s", type(e).__name__, e)

    dtypes = _save_params_npz(out / _PARAMS_NAME, params)
    meta = {
        "format_version": 1,
        "model": type(model).__name__,
        "batch_sizes": buckets,
        "depth": depth, "hw": hw,
        "with_saliency": bool(with_saliency),
        "plane_mode": plane_mode,
        "tta": bool(tta),
        "with_mask": bool(with_mask),
        "jax_version": jax.__version__,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "param_dtypes": dtypes,
        "compiled_platform": jax.default_backend() if compiled_device else None,
        "compiled_device_kind": compiled_device,
        **(extra_meta or {}),
    }
    (out / _META_NAME).write_text(json.dumps(meta, indent=1))
    return out


class ExportedPredictor:
    """A loaded serving artifact: `predict(volumes) -> (probs, saliency)`.

    Dispatches each call to the smallest exported batch bucket that fits,
    padding the tail by repeating row 0 (row results are batch-invariant —
    tests/test_train_e2e.py::test_predict_batched) and slicing it back off.
    """

    def __init__(self, meta: dict, programs: dict, params,
                 compiled: Optional[dict] = None,
                 path: Optional[Path] = None,
                 use_compiled: bool = False):
        self.meta = meta
        self._programs = programs  # batch -> jax.export.Exported
        self._compiled = compiled or {}  # batch -> jax.stages.Compiled
        self.params = params
        self.buckets = sorted(int(b) for b in meta["batch_sizes"])
        # Lazy loading (VERDICT r4 #8): `path` set means programs /
        # executables not in the dicts are deserialized ON FIRST USE of
        # their bucket — cold start pays for exactly one bucket, and the
        # weights upload (device_put at load_exported) overlaps the
        # executable deserialize+upload instead of serializing after it.
        self._path = Path(path) if path is not None else None
        self._use_compiled = use_compiled
        # Exported.call re-wraps the program on every invocation (a fresh
        # traced callable each time — measured 5.5 s/call on the ViT-S
        # program vs 15 ms compiled); jit it ONCE per bucket so repeat
        # calls hit XLA's executable cache, and keep a device-resident
        # copy of the weights (re-uploading ~90 MB of bf16 params per
        # call dominates otherwise).
        self._jitted: dict = {}
        self._device_params = None
        self._device_params_src = None

    def _load_compiled(self, b: int):
        import pickle

        from jax.experimental.serialize_executable import deserialize_and_load

        f = self._path / f"compiled_b{b}.bin"
        if not f.exists():
            return None
        try:
            payload, in_tree, out_tree = pickle.loads(f.read_bytes())
            return deserialize_and_load(payload, in_tree, out_tree)
        except Exception as e:  # version drift etc. — StableHLO still works
            import logging

            logging.getLogger(__name__).warning(
                "compiled leg unusable for bucket %d (%s: %s); falling back "
                "to the exported StableHLO program", b, type(e).__name__, e)
            return None

    def _call_fn(self, b: int):
        import jax
        from jax import export as jexport

        if b in self._compiled:  # pre-compiled executable: nothing to jit
            return self._compiled[b]
        if self._use_compiled and self._path is not None:
            exe = self._load_compiled(b)
            if exe is not None:
                self._compiled[b] = exe
                return exe
            self._use_compiled = False  # don't retry the broken leg per call
        if b not in self._jitted:
            if b not in self._programs:
                if self._path is None:
                    raise KeyError(f"bucket {b}: no program and no artifact "
                                   "path to lazy-load it from")
                data = (self._path / f"program_b{b}.bin").read_bytes()
                self._programs[b] = jexport.deserialize(bytearray(data))
            self._jitted[b] = jax.jit(self._programs[b].call)
        return self._jitted[b]

    def _params_on_device(self, params):
        import jax

        if params is not self._device_params_src:
            self._device_params = jax.device_put(params)
            self._device_params_src = params
        return self._device_params

    def bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if b >= n:
                return b
        raise ValueError(
            f"batch {n} exceeds the largest exported bucket "
            f"{self.buckets[-1]}; re-export with a larger --batch_sizes")

    def predict(self, source: np.ndarray, params=None, mask=None):
        """source [B, C, D, H, W] (+ optional src_key_padding_mask [B, D])
        -> (probs [B, n], saliency | None)."""
        with_mask = bool(self.meta.get("with_mask"))
        if mask is not None and not with_mask:
            raise ValueError("this artifact was exported without mask "
                             "support (mask traced as None); re-export "
                             "with with_mask=True / --with_mask")
        source = np.asarray(source, np.float32)
        n = source.shape[0]
        b = self.bucket_for(n)
        if with_mask:
            # absent mask == nothing padded (all-False == None semantics)
            mask = (np.zeros((n, source.shape[2]), bool) if mask is None
                    else np.asarray(mask, bool))
        if n < b:
            pad = np.broadcast_to(source[:1],
                                  (b - n,) + source.shape[1:])
            source = np.concatenate([source, pad], 0)
            if with_mask:
                mask = np.concatenate(
                    [mask, np.broadcast_to(mask[:1], (b - n, mask.shape[1]))],
                    0)
        p = self._params_on_device(self.params if params is None else params)
        args = (p, source, mask) if with_mask else (p, source)
        probs, sal = self._call_fn(b)(*args)
        probs = np.asarray(probs)[:n]
        if sal is not None:
            sal = np.asarray(sal)[:n]
        return probs, sal

    # BatchingPredictor-compatible signature (mst_tpu/serve.py): the
    # server always launches full buckets, so no padding happens here.
    def __call__(self, params, source, mask):
        return self.predict(source, params=params, mask=mask)


def load_exported(artifact_dir, prefetch_params: bool = True
                  ) -> ExportedPredictor:
    """Load a serving artifact. Per-bucket programs and executables are
    deserialized lazily on first use (cold start pays for ONE bucket, not
    all of them); the weights start uploading to the device immediately
    (async device_put) so the transfer overlaps the first bucket's
    executable deserialize+upload — on a relay-attached host the ~90 MB
    bf16 ViT-S tree otherwise serializes AFTER it (VERDICT r4 #8)."""
    import jax

    path = Path(artifact_dir)
    meta = json.loads((path / _META_NAME).read_text())
    params = _load_params_npz(path / _PARAMS_NAME,
                              meta.get("param_dtypes", {}))

    # Zero-compile path available? (exact platform + device-kind match;
    # the per-bucket blobs load on demand in _call_fn)
    use_compiled = (meta.get("compiled_platform") == jax.default_backend()
                    and meta.get("compiled_device_kind")
                    == jax.devices()[0].device_kind
                    and len(jax.devices()) == 1)
    pred = ExportedPredictor(meta, {}, params, {}, path=path,
                             use_compiled=use_compiled)
    if prefetch_params:
        # async: transfers complete while the first call's program loads
        pred._device_params = jax.device_put(params)
        pred._device_params_src = params
    return pred
