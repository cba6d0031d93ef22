"""Multi-host data parallelism, exercised on a REAL 2-process CPU cluster
(`jax.distributed` + gloo collectives), not a simulation:

- each host consumes a disjoint stride of the global sample stream
  (`DataModule(shard_id=process_index, num_shards=process_count)`);
- per-host local batches become global SPMD arrays
  (`jax.make_array_from_process_local_data`) and the train step runs as one
  program across processes;
- epoch metrics all-gather (`gather_across_hosts`) so both hosts agree on
  val AUC — the requirement for consistent early stopping / checkpointing.

This is the capability the reference only gestures at via `sync_dist`
logging flags (`mst/models/base_model.py:170,177`); SURVEY §2.5 DP row.
"""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r'''
import os, sys, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
pid, run_dir, port = int(sys.argv[1]), sys.argv[2], sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %r)
from scripts.main_train import main
run, result = main([
    "--dataset", "Synthetic", "--model", "DinoV2ClassifierSlice",
    "--model_size", "tiny", "--fusion_heads", "4", "--dtype", "float32",
    "--max_epochs", "1", "--batch_size", "4", "--num_train_samples", "16",
    "--run_dir", run_dir,
    "--distributed", "--dist_coordinator", "localhost:" + port,
    "--dist_num_processes", "2", "--dist_process_id", str(pid),
])
from mst_tpu.data.datamodule import DataModule, balanced_weights
from mst_tpu.registry import get_dataset
ds = get_dataset("Synthetic", split="train", flip=True, noise=True,
                 random_center=True, random_rotate=True)
dm = DataModule(ds_train=ds, batch_size=4,
                weights=balanced_weights(ds.labels()),
                num_train_samples=16, seed=0, shard_id=pid, num_shards=2)
idx = dm._train_indices().tolist()
print("RESULT " + json.dumps({
    "pid": pid, "idx": idx, "best": result.best_metric, "run": str(run),
}), flush=True)
''' % str(REPO)


@pytest.mark.slow
def test_two_process_cpu_cluster(tmp_path):
    port = "23457"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(pid), str(tmp_path), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    results = {}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-3000:]
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, out[-3000:]
        r = json.loads(line[-1][len("RESULT "):])
        results[r["pid"]] = r

    # 1. Disjoint shards that interleave to the exact global stream.
    from mst_tpu.data.datamodule import DataModule, balanced_weights
    from mst_tpu.registry import get_dataset

    ds = get_dataset("Synthetic", split="train", flip=True, noise=True,
                     random_center=True, random_rotate=True)
    dm = DataModule(ds_train=ds, batch_size=4,
                    weights=balanced_weights(ds.labels()),
                    num_train_samples=16, seed=0)
    global_stream = dm._train_indices().tolist()
    interleaved = [None] * len(global_stream)
    interleaved[0::2] = results[0]["idx"]
    interleaved[1::2] = results[1]["idx"]
    assert interleaved == global_stream

    # 2. Both hosts computed the SAME globally-gathered val metric.
    assert np.isclose(results[0]["best"], results[1]["best"])

    # 3. Same run dir, and the coordinated orbax checkpoint is loadable.
    assert results[0]["run"] == results[1]["run"]
    from mst_tpu.utils.checkpoint import load_best_checkpoint

    ck = load_best_checkpoint(results[0]["run"])
    assert "params" in ck


WORKER_SPMD = r'''
import os, sys, json
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
pid, port = int(sys.argv[1]), sys.argv[2]
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize("localhost:" + port, num_processes=2,
                           process_id=pid)
sys.path.insert(0, %r)
import jax.numpy as jnp, numpy as np, optax
from jax.sharding import NamedSharding, PartitionSpec as P
from mst_tpu.models.mst import DinoSliceClassifier
from mst_tpu.parallel.mesh import make_mesh
from mst_tpu.train.trainer import TrainState, make_train_step

model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                            fusion_heads=4, use_flash=False)
rng = np.random.default_rng(0)
full_src = rng.normal(size=(8, 1, 2, 28, 28)).astype(np.float32)
full_tgt = np.array([0, 1] * 4, np.int32)
params = model.init(jax.random.PRNGKey(1),
                    jnp.asarray(full_src[:1]))["params"]
state = TrainState.create(apply_fn=model.apply, params=params,
                          tx=optax.sgd(1e-2),
                          dropout_rng=jax.random.PRNGKey(2))
mesh = make_mesh()  # all 4 devices (2 procs x 2) on 'data'
step = make_train_step(model, mesh=mesh, spmd="shard_map")
sh = NamedSharding(mesh, P("data"))
# each process contributes its contiguous half of the global batch
lo, hi = pid * 4, (pid + 1) * 4
src = jax.make_array_from_process_local_data(sh, full_src[lo:hi])
tgt = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), full_tgt[lo:hi])
state, loss, logits = step(state, src, tgt, None)
print("RESULT " + json.dumps({"pid": pid, "loss": float(loss)}), flush=True)
''' % str(REPO)


@pytest.mark.slow
def test_shard_map_step_across_processes(tmp_path):
    """The explicit-SPMD (shard_map) train step on a PROCESS-SPANNING
    pure-data mesh — the fused-kernel pod-training configuration — runs on
    a live 2-process gloo cluster and reproduces the single-process loss."""
    port = "23461"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER_SPMD, str(pid), port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    losses = {}
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-3000:]
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, out[-3000:]
        r = json.loads(line[-1][len("RESULT "):])
        losses[r["pid"]] = r["loss"]
    assert np.isclose(losses[0], losses[1])

    # single-process reference on the same data/params
    import jax
    import jax.numpy as jnp
    import optax

    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.train.trainer import TrainState, make_train_step

    model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                                fusion_heads=4, use_flash=False)
    rng = np.random.default_rng(0)
    full_src = rng.normal(size=(8, 1, 2, 28, 28)).astype(np.float32)
    full_tgt = np.array([0, 1] * 4, np.int32)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.asarray(full_src[:1]))["params"]
    state = TrainState.create(apply_fn=model.apply, params=params,
                              tx=optax.sgd(1e-2),
                              dropout_rng=jax.random.PRNGKey(2))
    _, loss_ref, _ = make_train_step(model)(
        state, jnp.asarray(full_src), jnp.asarray(full_tgt), None)
    np.testing.assert_allclose(losses[0], float(loss_ref),
                               rtol=1e-5, atol=1e-6)


WORKER_PREDICT = r'''
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
pid, run_dir, port = int(sys.argv[1]), sys.argv[2], sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, %r)
from scripts.main_predict import main
out = main([
    "--run_folder", run_dir, "--batch_size", "2",
    "--distributed", "--dist_coordinator", "localhost:" + port,
    "--dist_num_processes", "2", "--dist_process_id", str(pid),
])
print("RESULT " + str(out), flush=True)
''' % str(REPO)


@pytest.mark.slow
def test_two_process_predict_matches_single_host(tmp_path):
    """Multi-host eval (`main_predict --distributed`): two processes score
    disjoint test shards, rank 0 merges rows through the shared run dir —
    results.csv must equal the single-host run row-for-row (wrap-padding
    duplicates dropped exactly)."""
    import pandas as pd

    from scripts.main_predict import main as predict_main
    from scripts.main_train import main as train_main

    run_dir, _ = train_main([
        "--dataset", "Synthetic", "--model", "DinoV2ClassifierSlice",
        "--model_size", "tiny", "--fusion_heads", "4", "--dtype", "float32",
        "--max_epochs", "1", "--batch_size", "4", "--num_train_samples", "8",
        "--run_dir", str(tmp_path)])

    single_out = predict_main(["--run_folder", str(run_dir),
                               "--batch_size", "2",
                               "--output_dir", str(tmp_path / "single")])
    df_single = pd.read_csv(Path(single_out) / "results.csv")

    # a stale shard from a hypothetical earlier higher-process-count run
    # must NOT leak into the merged metrics (rank 0 merges exactly
    # process_count shards and deletes the rest)
    stale = Path(run_dir) / "results" / "results.shard7.csv"
    stale.parent.mkdir(parents=True, exist_ok=True)
    pd.DataFrame([{"uid": "STALE", "GT": 0, "NN": 0,
                   "NN_pred": 0.5}]).to_csv(stale, index=False)

    port = "23461"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER_PREDICT, str(pid), str(run_dir),
             port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=REPO,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-3000:]

    df_multi = pd.read_csv(Path(run_dir) / "results" / "results.csv")
    assert "STALE" not in set(df_multi["uid"].astype(str))
    assert not stale.exists()
    # same cases exactly once, same predictions
    a = df_single.sort_values("uid").reset_index(drop=True)
    b = df_multi.sort_values("uid").reset_index(drop=True)
    assert list(a["uid"]) == list(b["uid"])
    np.testing.assert_allclose(a["NN_pred"].to_numpy(),
                               b["NN_pred"].to_numpy(), atol=1e-5)
    assert (a["GT"].to_numpy() == b["GT"].to_numpy()).all()
