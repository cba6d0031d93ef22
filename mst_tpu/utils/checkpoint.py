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


def save_checkpoint(run_dir, name: str, state: Any,
                    hparams: Optional[Dict] = None) -> Path:
    run_dir = Path(run_dir)
    path = (run_dir / name).resolve()
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state, force=True)
    if hparams is not None:
        (run_dir / f"{name}.hparams.json").write_text(json.dumps(hparams, indent=2))
    return path


def load_checkpoint(run_dir, name: str) -> Any:
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore((Path(run_dir) / name).resolve())


def save_best_checkpoint(run_dir, name: str) -> None:
    """Write the pointer file (reference `base_model.py:51-54`)."""
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
