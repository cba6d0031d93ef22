"""Checkpointing: orbax trees + the `best_checkpoint.json` pointer contract.

Mirrors the reference's checkpoint bookkeeping
(`mst/models/base_model.py:51-81` + Lightning ModelCheckpoint usage in
`scripts/main_train.py:103-109`): a run directory holds named checkpoints
(top-1 on val/AUC_ROC plus `last`), and `best_checkpoint.json` records the
best one so `load_best_checkpoint(run_dir)` resolves it later
(`scripts/main_predict.py:215`).

Checkpoints are orbax PyTree directories; each save also records the model
hyperparameters (the `save_hyperparameters` analogue,
`base_model.py:11-14`) so checkpoints are self-describing.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import jax
import orbax.checkpoint as ocp

BEST_POINTER = "best_checkpoint.json"

_async_ckptr: Optional[ocp.AsyncCheckpointer] = None


def _is_main_process() -> bool:
    return jax.process_index() == 0


def _get_async_checkpointer() -> ocp.AsyncCheckpointer:
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def wait_for_async_saves() -> None:
    """Block until any in-flight async checkpoint write has committed
    (call before reading a just-saved checkpoint or exiting)."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def save_checkpoint(run_dir, name: str, state: Any,
                    hparams: Optional[Dict] = None,
                    use_async: bool = False) -> Path:
    """Multi-host safe: ALL processes must call this (orbax coordinates the
    write with global barriers; replicated data is written once); the JSON
    sidecars are written by process 0 only.

    use_async=True returns after the device->host copy and commits the disk
    write in the background (safe with donated train states — the copy
    happens before the next step can reuse the buffers). Call
    `wait_for_async_saves()` before reading it back.
    """
    run_dir = Path(run_dir)
    path = (run_dir / name).resolve()
    if use_async:
        ckptr = _get_async_checkpointer()
        ckptr.wait_until_finished()  # one in-flight save at a time
        ckptr.save(path, state, force=True)
    else:
        ocp.PyTreeCheckpointer().save(path, state, force=True)
    if hparams is not None and _is_main_process():
        (run_dir / f"{name}.hparams.json").write_text(json.dumps(hparams, indent=2))
    return path


def load_checkpoint(run_dir, name: str) -> Any:
    """Topology-free restore: arrays come back as host numpy, so a
    checkpoint written by an N-host pod run loads on a single chip (the
    predict CLI's normal situation). Without explicit restore_args orbax
    re-applies the saved shardings, whose device ids do not exist off the
    original topology."""
    import numpy as np

    wait_for_async_saves()
    path = (Path(run_dir) / name).resolve()
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path).item_metadata
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
    return ckptr.restore(path, restore_args=restore_args)


def load_checkpoint_sharded(run_dir, name: str, shardings: Any) -> Any:
    """Pod-scale restore: every leaf comes back as a jax.Array already laid
    out by `shardings` (a pytree of `jax.sharding.Sharding` congruent with
    the saved tree; `None` leaves restore as host numpy). Orbax reads only
    the byte ranges each host's addressable shards need, so no host ever
    materialises the full tree — restoring a giant2 TrainState (~13 GB of
    params+moments) per host would otherwise OOM pod hosts (the
    `load_checkpoint` path is for topology-free single-host predict).
    TPU-equivalent of SURVEY §5.4's resume contract at pod scale."""
    import numpy as np

    wait_for_async_saves()
    path = (Path(run_dir) / name).resolve()
    ckptr = ocp.PyTreeCheckpointer()
    restore_args = jax.tree.map(
        lambda s: (ocp.RestoreArgs(restore_type=np.ndarray) if s is None
                   else ocp.ArrayRestoreArgs(sharding=s)),
        shardings, is_leaf=lambda s: s is None or hasattr(s, "device_set"))
    return ckptr.restore(path, restore_args=restore_args)


def save_train_state(run_dir, name: str, state: Any,
                     meta: Optional[Dict] = None,
                     hparams: Optional[Dict] = None,
                     use_async: bool = False) -> Path:
    """Save the FULL TrainState (params + optimizer moments + step + rng)
    so `--resume` is a true resume, not a warm start (the Lightning
    `last.ckpt` analogue, reference `scripts/main_train.py:103-109`).

    `meta` records loop counters (epoch, best metric, patience staleness)
    in a sidecar JSON so the fit loop continues exactly where it stopped.
    """
    tree = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
        "dropout_rng": state.dropout_rng,
    }
    if state.batch_stats is not None:
        tree["batch_stats"] = state.batch_stats
    path = save_checkpoint(run_dir, name, tree, hparams=hparams,
                           use_async=use_async)
    if meta is not None and _is_main_process():
        (Path(run_dir) / f"{name}.meta.json").write_text(
            json.dumps(meta, indent=2))
    return path


def restore_train_state(run_dir, name: str, template_state: Any,
                        shardings: Any = None):
    """Restore a full TrainState saved by `save_train_state`.

    Waits for any in-flight async save first.

    `template_state` (a freshly-initialised TrainState) supplies the pytree
    structure — optax states are NamedTuples that orbax cannot reconstruct
    from the serialized dicts alone. Returns (state, meta_dict).

    `shardings`: optional pytree of `jax.sharding.Sharding` congruent with
    `template_state.params` — when given, params AND the optimizer moments
    (which mirror the param tree inside optax states) restore directly into
    sharded jax.Arrays (per-host reads, no full-tree materialisation; see
    `load_checkpoint_sharded`). Scalars/rng restore as host values."""
    tree = {
        "params": template_state.params,
        "opt_state": template_state.opt_state,
        "step": template_state.step,
        "dropout_rng": template_state.dropout_rng,
    }
    if template_state.batch_stats is not None:
        tree["batch_stats"] = template_state.batch_stats
    wait_for_async_saves()
    ckptr = ocp.PyTreeCheckpointer()
    if shardings is not None:
        import numpy as np

        flat_sh = [
            (jax.tree_util.keystr(kp), s)
            for kp, s in jax.tree_util.tree_flatten_with_path(
                shardings,
                is_leaf=lambda s: s is None or hasattr(s, "device_set"))[0]
        ]
        flat_shapes = {
            jax.tree_util.keystr(kp): getattr(v, "shape", None)
            for kp, v in jax.tree_util.tree_flatten_with_path(
                template_state.params)[0]
        }

        def _args_for(path, leaf):
            # param-shaped leaves (params + each moment tree inside
            # opt_state) share the tail of their keystr with a params entry
            ks = jax.tree_util.keystr(path)
            for pkey, sh in flat_sh:
                if (sh is not None and ks.endswith(pkey)
                        and getattr(leaf, "shape", None)
                        == flat_shapes.get(pkey)):
                    return ocp.ArrayRestoreArgs(sharding=sh)
            return ocp.RestoreArgs(restore_type=np.ndarray)

        restore_args = jax.tree_util.tree_map_with_path(_args_for, tree)
        restored = ckptr.restore((Path(run_dir) / name).resolve(), item=tree,
                                 restore_args=restore_args)
    else:
        restored = ckptr.restore((Path(run_dir) / name).resolve(), item=tree)
    state = template_state.replace(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=int(restored["step"]),
        dropout_rng=restored["dropout_rng"],
        batch_stats=restored.get("batch_stats",
                                 template_state.batch_stats),
    )
    meta_path = Path(run_dir) / f"{name}.meta.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return state, meta


def save_best_checkpoint(run_dir, name: str) -> None:
    """Write the pointer file (reference `base_model.py:51-54`)."""
    if not _is_main_process():
        return
    Path(run_dir).mkdir(parents=True, exist_ok=True)
    (Path(run_dir) / BEST_POINTER).write_text(
        json.dumps({"best_model_path": name}, indent=2)
    )


def resolve_best_checkpoint(run_dir) -> str:
    ptr = json.loads((Path(run_dir) / BEST_POINTER).read_text())
    return ptr["best_model_path"]


def load_best_checkpoint(run_dir) -> Any:
    """Reference `base_model.py:62-65`."""
    return load_checkpoint(run_dir, resolve_best_checkpoint(run_dir))


def load_hparams(run_dir, name: Optional[str] = None) -> Optional[Dict]:
    name = name or resolve_best_checkpoint(run_dir)
    p = Path(run_dir) / f"{name}.hparams.json"
    return json.loads(p.read_text()) if p.exists() else None


def filtered_weight_update(
    params: Any, loaded: Any, filter_fn: Optional[Callable[[str], bool]] = None
) -> Any:
    """Partial, key-filtered state load (reference `load_pretrained` /
    `load_weights`, `base_model.py:67-81`): leaves whose flattened path
    matches `filter_fn` (and whose shapes agree) are replaced."""
    flat_p = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(params)[0]}
    flat_l = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(loaded)[0]}
    updated = dict(flat_p)
    for key, val in flat_l.items():
        if key not in flat_p:
            continue
        if filter_fn is not None and not filter_fn(key):
            continue
        if getattr(flat_p[key], "shape", None) == getattr(val, "shape", None):
            updated[key] = val
    treedef = jax.tree_util.tree_structure(params)
    keys = [jax.tree_util.keystr(k) for k, _ in
            jax.tree_util.tree_flatten_with_path(params)[0]]
    return jax.tree_util.tree_unflatten(treedef, [updated[k] for k in keys])
