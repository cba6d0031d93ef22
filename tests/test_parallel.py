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
