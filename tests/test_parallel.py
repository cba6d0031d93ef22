"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY §4 plan item (e))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from mst_tpu.parallel.mesh import make_mesh, shard_batch
from mst_tpu.parallel.sharding import param_partition_specs, param_shardings


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape == {"data": 8}
    mesh2 = make_mesh((("data", 2), ("slice", 2), ("tensor", 2)))
    assert mesh2.shape == {"data": 2, "slice": 2, "tensor": 2}
    with pytest.raises(AssertionError):
        make_mesh((("data", 3),))


def test_shard_batch_divisible_and_remainder():
    mesh = make_mesh()
    batch = {"source": np.zeros((8, 1, 2, 4, 4), np.float32),
             "target": np.zeros((8,), np.int32),
             "uid": ["u"] * 8}
    out = shard_batch(batch, mesh)
    assert out["source"].sharding.spec == P("data", None, None, None, None)
    assert out["uid"] == ["u"] * 8
    small = {"source": np.zeros((3, 1, 2, 4, 4), np.float32)}
    out = shard_batch(small, mesh)
    assert out["source"].sharding.spec == P()  # replicated remainder


def test_param_partition_rules_megatron_layout():
    from mst_tpu.models.vit import build_vit

    vit = build_vit("tiny", patch_size=14, use_flash=False)
    x = jnp.ones((1, 28, 28, 3))
    params = vit.init(jax.random.PRNGKey(0), x)["params"]
    specs = param_partition_specs(params)
    blk = specs["blocks_0"]
    assert blk["attn"]["qkv"]["kernel"] == P(None, "tensor")
    assert blk["attn"]["qkv"]["bias"] == P("tensor")
    assert blk["attn"]["proj"]["kernel"] == P("tensor", None)
    assert blk["mlp"]["fc1"]["kernel"] == P(None, "tensor")
    assert blk["mlp"]["fc2"]["kernel"] == P("tensor", None)
    assert specs["norm"]["scale"] == P()
    assert specs["cls_token"] == P()


@pytest.mark.slow
def test_sharded_train_step_matches_single_device():
    """One train step under dp x tp sharding must equal the unsharded step."""
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.train.trainer import TrainState, make_optimizer, make_train_step

    model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                                fusion_heads=4, use_flash=False)
    src = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 2, 28, 28))
    tgt = jnp.array([0, 1, 0, 1])
    params = model.init(jax.random.PRNGKey(1), src)["params"]

    def new_state():
        return TrainState.create(
            apply_fn=model.apply, params=jax.tree.map(jnp.copy, params),
            tx=make_optimizer(1e-3), dropout_rng=jax.random.PRNGKey(2),
        )

    step = make_train_step(model)
    _, loss_ref, logits_ref = step(new_state(), src, tgt, None)

    mesh = make_mesh((("data", 4), ("tensor", 2)))
    p_sh = param_shardings(params, mesh, "tensor")
    state = new_state()
    state = state.replace(params=jax.device_put(state.params, p_sh))
    src_s = jax.device_put(src, NamedSharding(mesh, P("data")))
    tgt_s = jax.device_put(tgt, NamedSharding(mesh, P("data")))
    with mesh:
        _, loss_s, logits_s = step(state, src_s, tgt_s, None)
    np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(logits_s), np.asarray(logits_ref),
                               atol=1e-4)


def test_slice_axis_sharding_executes():
    """Depth-axis (sequence) sharding of the volume compiles and runs."""
    from mst_tpu.models.mst import DinoSliceClassifier

    model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                                fusion_heads=4, use_flash=False)
    src = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 4, 28, 28))
    params = model.init(jax.random.PRNGKey(1), src)["params"]
    mesh = make_mesh((("data", 2), ("slice", 4)))
    src_s = jax.device_put(
        src, NamedSharding(mesh, P("data", None, "slice", None, None))
    )
    with mesh:
        logits = jax.jit(
            lambda s: model.apply({"params": params}, s, deterministic=True)
        )(src_s)
    ref = model.apply({"params": params}, src)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), atol=1e-4)


def test_sharded_checkpoint_roundtrip(tmp_path):
    """TP-sharded params (giant2 multi-chip layout) save through orbax and
    restore topology-free: the restored host arrays equal the sharded
    originals, and a fresh single-device state can consume them — the
    pod-train -> single-chip-predict path (ROADMAP 'sharded checkpointing')."""
    from mst_tpu.models.vit import build_vit
    from mst_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    vit = build_vit("tiny", patch_size=14, use_flash=False)
    x = jnp.ones((1, 28, 28, 3))
    params = vit.init(jax.random.PRNGKey(0), x)["params"]
    mesh = make_mesh((("data", 2), ("slice", 2), ("tensor", 2)))
    sharded = jax.device_put(params, param_shardings(params, mesh))
    # sanity: the qkv kernel really is distributed over the tensor axis
    qkv = sharded["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P(None, "tensor")
    assert not qkv.sharding.is_fully_replicated

    save_checkpoint(tmp_path, "sharded", {"params": sharded},
                    hparams={"model_size": "tiny"})
    restored = load_checkpoint(tmp_path, "sharded")["params"]
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(restored)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        assert isinstance(vb, np.ndarray)  # topology-free host arrays
        np.testing.assert_array_equal(np.asarray(va), vb)
    # restored tree is directly consumable by an unsharded apply
    out_ref = vit.apply({"params": params}, x)
    out_restored = vit.apply({"params": restored}, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                                rtol=1e-6),
        out_ref, out_restored)


@pytest.mark.slow
def test_shard_map_train_step_matches_jit():
    """The explicit-SPMD (shard_map) train step — the multi-chip path for
    the fused Pallas kernels, which XLA's automatic partitioner cannot
    split — must produce the same loss/params as the auto-partitioned jit
    step on a pure-data mesh."""
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.train.trainer import (
        TrainState,
        make_optimizer,
        make_train_step,
    )

    model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                                fusion_heads=4, use_flash=False)
    src = jax.random.normal(jax.random.PRNGKey(0), (8, 1, 2, 28, 28))
    tgt = jnp.array([0, 1] * 4, jnp.int32)
    params = model.init(jax.random.PRNGKey(1), src[:1])["params"]

    import optax

    def fresh_state():
        # SGD, not AdamW: the parity check compares post-update params, and
        # Adam's sign(g)*lr first step turns ~1e-8 grad reassociation
        # differences (per-shard sum + pmean vs full-batch mean) into full
        # +-lr flips on near-zero grads. SGD keeps deltas linear in grads.
        return TrainState.create(
            apply_fn=model.apply, params=jax.tree.map(jnp.copy, params),
            tx=optax.sgd(1e-2), dropout_rng=jax.random.PRNGKey(2))

    mesh = make_mesh()  # 8 virtual CPU devices on 'data'
    step_ref = make_train_step(model)  # plain jit, single-program
    step_spmd = make_train_step(model, mesh=mesh, spmd="shard_map")

    s_ref, loss_ref, logits_ref = step_ref(fresh_state(), src, tgt, None)
    sharded = shard_batch({"source": np.asarray(src),
                           "target": np.asarray(tgt)}, mesh)
    s_spmd, loss_spmd, logits_spmd = step_spmd(
        fresh_state(), sharded["source"], sharded["target"], None)

    np.testing.assert_allclose(float(loss_spmd), float(loss_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(logits_spmd),
                               np.asarray(logits_ref), rtol=1e-4, atol=1e-5)
    for (pa, va), (pb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(s_ref.params),
            jax.tree_util.tree_leaves_with_path(s_spmd.params)):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(vb), np.asarray(va),
                                   rtol=1e-4, atol=1e-6, err_msg=str(pa))

    # masked variant exercises the mask in_spec
    mask = jnp.zeros((8, 2), bool).at[:, 1].set(True)
    s2, loss2, _ = step_spmd(fresh_state(), sharded["source"],
                             sharded["target"],
                             jax.device_put(mask, NamedSharding(mesh, P("data"))))
    s2r, loss2r, _ = step_ref(fresh_state(), src, tgt, mask)
    np.testing.assert_allclose(float(loss2), float(loss2r),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_fused_kernels_inside_shard_map(monkeypatch):
    """The fused Pallas train path under shard_map (the real multi-chip
    configuration; interpret-mode kernels on the CPU mesh) must match the
    flax jit step — proves the pallas_call/custom-VJP plumbing composes
    with manual SPMD end to end."""
    import optax

    import mst_tpu.train.trainer as trainer_mod
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.train.trainer import TrainState, make_train_step

    model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                                fusion_heads=4, use_flash=False)
    src = jax.random.normal(jax.random.PRNGKey(0), (8, 1, 2, 28, 28))
    tgt = jnp.array([0, 1] * 4, jnp.int32)
    params = model.init(jax.random.PRNGKey(1), src[:1])["params"]

    def fresh_state():
        return TrainState.create(
            apply_fn=model.apply, params=jax.tree.map(jnp.copy, params),
            tx=optax.sgd(1e-2), dropout_rng=jax.random.PRNGKey(2))

    step_ref = make_train_step(model)  # flax path (CPU gate)
    s_ref, loss_ref, _ = step_ref(fresh_state(), src, tgt, None)

    monkeypatch.setattr(trainer_mod, "should_use_fused_train",
                        lambda *a, **k: True)
    mesh = make_mesh()
    step_fused_spmd = make_train_step(model, mesh=mesh, spmd="shard_map")
    sharded = shard_batch({"source": np.asarray(src),
                           "target": np.asarray(tgt)}, mesh)
    s_f, loss_f, _ = step_fused_spmd(
        fresh_state(), sharded["source"], sharded["target"], None)

    np.testing.assert_allclose(float(loss_f), float(loss_ref),
                               rtol=1e-5, atol=1e-6)
    for (pa, va), (pb, vb) in zip(
            jax.tree_util.tree_leaves_with_path(s_ref.params),
            jax.tree_util.tree_leaves_with_path(s_f.params)):
        np.testing.assert_allclose(np.asarray(vb), np.asarray(va),
                                   rtol=1e-4, atol=2e-6, err_msg=str(pa))


def test_sharded_pod_restore_no_full_materialisation(tmp_path):
    """VERDICT r2 #7: restoring `last` on a pod must NOT materialise the
    full tree per host — `restore_train_state(shardings=...)` restores
    params AND optimizer moments directly into mesh-sharded jax.Arrays
    (orbax per-shard reads), with scalars/rng as host values."""
    import optax

    from mst_tpu.models.vit import build_vit
    from mst_tpu.train.trainer import TrainState, make_optimizer
    from mst_tpu.utils.checkpoint import (
        restore_train_state,
        save_train_state,
    )

    vit = build_vit("tiny", patch_size=14, use_flash=False)
    x = jnp.ones((1, 28, 28, 3))
    params = vit.init(jax.random.PRNGKey(0), x)["params"]
    state = TrainState.create(
        apply_fn=vit.apply, params=params, tx=make_optimizer(1e-4),
        dropout_rng=jax.random.PRNGKey(1))
    # one opt step so the moments are nonzero (worth checking)
    grads = jax.tree.map(jnp.ones_like, params)
    state = state.apply_gradients(grads=grads)
    save_train_state(tmp_path, "last", state, meta={"epoch": 3})

    mesh = make_mesh((("data", 2), ("slice", 2), ("tensor", 2)))
    shardings = param_shardings(params, mesh)
    template = TrainState.create(
        apply_fn=vit.apply, params=jax.tree.map(jnp.zeros_like, params),
        tx=make_optimizer(1e-4), dropout_rng=jax.random.PRNGKey(1))
    restored, meta = restore_train_state(tmp_path, "last", template,
                                         shardings=shardings)
    assert meta["epoch"] == 3

    qkv = restored.params["blocks_0"]["attn"]["qkv"]["kernel"]
    assert isinstance(qkv, jax.Array)
    assert qkv.sharding.spec == P(None, "tensor")
    assert not qkv.sharding.is_fully_replicated
    # each addressable shard holds only its slice of the tensor axis
    full = np.asarray(state.params["blocks_0"]["attn"]["qkv"]["kernel"])
    for shard in qkv.addressable_shards:
        assert shard.data.shape == (full.shape[0], full.shape[1] // 2)
    np.testing.assert_array_equal(np.asarray(qkv), full)

    # optimizer moments mirror the param sharding (adam mu for qkv)
    mus = [s.mu for s in jax.tree_util.tree_leaves(
        restored.opt_state,
        is_leaf=lambda s: hasattr(s, "mu")) if hasattr(s, "mu")]
    assert mus, "no adam state found in restored opt_state"
    mu_qkv = mus[0]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert mu_qkv.sharding.spec == P(None, "tensor")
    ref_mu = [s.mu for s in jax.tree_util.tree_leaves(
        state.opt_state, is_leaf=lambda s: hasattr(s, "mu"))
        if hasattr(s, "mu")][0]
    np.testing.assert_allclose(
        np.asarray(mu_qkv),
        np.asarray(ref_mu["blocks_0"]["attn"]["qkv"]["kernel"]))
    assert int(restored.step) == 1


def test_predict_fn_mesh_matches_single_device():
    """Data-parallel serving (`make_predict_fn(mesh=...)`): the batch axis
    shards over a pure-data mesh via shard_map (the fused/int8 Pallas
    serving kernels are opaque to the auto-partitioner on real TPU meshes),
    probs AND the saliency volume equal the single-device program, and
    indivisible batches fall back in-trace to the one-program path."""
    from mst_tpu.models.mst import DinoSliceClassifier
    from mst_tpu.train.predictor import make_predict_fn

    model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                                fusion_heads=4, use_flash=False)
    src = jax.random.normal(jax.random.PRNGKey(0), (4, 1, 2, 28, 28))
    params = model.init(jax.random.PRNGKey(1), src)["params"]

    ref = make_predict_fn(model, with_saliency=True)
    probs_ref, sal_ref = ref(params, src, None)

    mesh = make_mesh((("data", 4),), devices=jax.devices()[:4])
    pred = make_predict_fn(model, with_saliency=True, mesh=mesh)
    probs, sal = pred(params, src, None)
    assert probs.sharding.spec == P("data")
    np.testing.assert_allclose(np.asarray(probs), np.asarray(probs_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(sal), np.asarray(sal_ref),
                               atol=1e-5)

    # indivisible batch: single-program fallback inside the same callable
    probs3, _ = pred(params, src[:3], None)
    np.testing.assert_allclose(np.asarray(probs3),
                               np.asarray(probs_ref)[:3], atol=1e-5)

    # TTA / probs-only mode (None saliency leaf) + key-padding mask shard
    mask = jnp.zeros((4, src.shape[2]), bool)
    pred_tta = make_predict_fn(model, tta=True, with_saliency=False,
                               mesh=mesh)
    ref_tta = make_predict_fn(model, tta=True, with_saliency=False)
    probs_t, sal_none = pred_tta(params, src, mask)
    probs_tr, _ = ref_tta(params, src, mask)
    assert sal_none is None
    np.testing.assert_allclose(np.asarray(probs_t), np.asarray(probs_tr),
                               atol=1e-5)

    with pytest.raises(ValueError):
        make_predict_fn(model, mesh=make_mesh((("data", 2), ("tensor", 4))))


@pytest.mark.slow
def test_large_d_slice_sharded_forward():
    """The 1000-slice-CT story (VERDICT r3 #6): a D=512 volume — twice the
    slice-pos-emb vocabulary — shards over the `slice` mesh axis with a
    key-padding mask and matches the unsharded forward. Exercises the
    interpolated pos-emb (mst.py) under SPMD: the interpolation reads the
    replicated table, the add re-shards onto the depth axis."""
    from mst_tpu.models.mst import MAX_SLICES, DinoSliceClassifier

    model = DinoSliceClassifier(out_ch=2, model_size="tiny", patch_size=14,
                                fusion_heads=4, use_flash=False,
                                use_slice_pos_emb=True)
    D = 2 * MAX_SLICES  # 512
    src = jax.random.normal(jax.random.PRNGKey(0), (2, 1, D, 14, 14))
    mask = jnp.arange(D)[None] >= 490  # pad the tail
    mask = jnp.broadcast_to(mask, (2, D))
    params = model.init(jax.random.PRNGKey(1), src[:, :, :4], mask[:, :4])
    ref = model.apply({"params": params["params"]}, src, mask)

    mesh = make_mesh((("data", 2), ("slice", 4)))
    src_s = jax.device_put(
        src, NamedSharding(mesh, P("data", None, "slice", None, None)))
    mask_s = jax.device_put(mask, NamedSharding(mesh, P("data", "slice")))
    with mesh:
        logits = jax.jit(
            lambda s, m: model.apply({"params": params["params"]}, s, m)
        )(src_s, mask_s)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), atol=1e-4)
