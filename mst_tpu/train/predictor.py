"""Inference: probabilities + 3D saliency, with batched flip-TTA.

Capability twin of `scripts/main_predict.py:55-164` (`_pred_trans`,
`run_pred`, the `--use_tta` 8-way flip ensemble):

- the model forward runs with `return_weights="last"`; fusion and ViT
  attention probabilities come back as flax intermediates (no hooks);
- saliency = slice-attention x plane-attention outer product, trilinear-
  upsampled to the volume grid (`main_predict.py:103-106,161-162`);
- TTA enumerates all subsets of the three spatial axes (`itertools` over
  {2,3,4}, reference `main_predict.py:147-158`), but batches ALL 2^3
  variants into ONE device program: the flip stack becomes a leading
  batch axis, predictions average after softmax, saliency maps are
  flipped back before averaging.
"""

from __future__ import annotations

import functools
import itertools
from typing import Optional

import jax
import jax.numpy as jnp

from mst_tpu.ops.gradcam import argmax_logit_gradcam, grad_cam_map
from mst_tpu.ops.saliency import (
    attention_cls_rollout,
    attention_rollout,
    combined_saliency,
    plane_attention,
    slice_attention,
    upsample_saliency,
)

FLIP_SUBSETS = [
    s for n in range(4) for s in itertools.combinations((1, 2, 3), n)
]  # spatial axes of [C, D, H, W] per-sample layout; 8 subsets incl. ()


def _find_sowed(tree, name):
    """Collect all sowed `name` entries (tuples) in module order."""
    found = []

    def rec(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == name:
                    found.extend(v)
                else:
                    rec(v)

    rec(tree)
    return found


def _has_int8(params) -> bool:
    """True when the encoder carries int8-quantized blocks
    (`ops/fused_int8.quantize_encoder_int8`) — those trees only run on the
    fused serving path."""
    enc = params.get("encoder", {})
    return any("q8" in blk.get("attn", {}).get("qkv", {})
               for name, blk in enc.items() if name.startswith("blocks_"))


def _forward_with_saliency(model, variables, source, mask,
                           plane_mode: str = "last",
                           force_flax: bool = False,
                           force_fused: bool = False):
    """Dino path: source [B,C,D,H,W] -> (probs, saliency [B,D,H,W]).

    plane_mode="last": CLS->patch row of the last ViT block (the
    reference's default map, `dino.py:189-195`); "rollout": the reference's
    `get_attention_cls` reversed matmul chain over all blocks
    (`dino.py:204-212`), CLS row consumed like the last-block map;
    "rollout_abnar": improved Abnar & Zuidema rollout (opt-in, not
    reference behavior).
    """
    B, C, D, H, W = source.shape
    from mst_tpu.models.vit_fast import (
        fused_config_supported,
        fused_seq_len_ok,
    )

    if (not force_flax
            and plane_mode in ("last", "rollout", "rollout_abnar")
            and fused_config_supported(model)
            and fused_seq_len_ok(model, H, W)
            and "batch_stats" not in variables
            and (jax.default_backend() == "tpu" or force_fused)):
        # Fused explainability serving: "last" — the last encoder block's
        # kernel emits the CLS attention row in-VMEM; "rollout" — the
        # reference chain's CLS row is threaded through every block's
        # kernel; "rollout_abnar" — per-block head-meaned factors emitted
        # in-kernel, chained in XLA. No [B*D, heads, T, T] probabilities
        # are sown (the flax rollout paths materialise 12 of them:
        # ~1.2 GB f32 for one 32-slice LIDC volume).
        from mst_tpu.models.vit_fast import fused_mst_saliency

        return fused_mst_saliency(variables["params"], source, model,
                                  src_key_padding_mask=mask,
                                  dtype=model.dtype, plane_mode=plane_mode)
    if _has_int8(variables["params"]):
        raise ValueError(
            "int8-quantized params need the fused TPU serving path; this "
            "saliency mode/config falls back to the flax composition "
            "(oversized slice tokens stay bf16)")
    logits, aux = model.apply(
        variables, source, mask,
        deterministic=True,
        return_weights="all" if plane_mode.startswith("rollout") else "last",
        mutable=["intermediates"],
    )
    inter = aux["intermediates"]
    fusion_all = _find_sowed(
        {k: v for k, v in inter.items() if k.startswith("fusion")}, "attn_probs"
    )
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if not fusion_all:  # linear/average fusion: uniform slice weights
        sw = jnp.full((B, D), 1.0 / D, jnp.float32)
    else:
        sw = slice_attention(fusion_all[-1])
    n_prefix = 1 + model.num_register_tokens
    patch = model.patch_size
    gh, gw = H // patch, W // patch
    vit_probs_all = _find_sowed(inter["encoder"], "attn_probs")
    if plane_mode == "rollout":
        # Reference get_attention_cls chain, then the CLS row consumed with
        # the same per-head normalise -> head-mean as the last-block map.
        chain = attention_cls_rollout(vit_probs_all)
        pw = plane_attention(chain, n_prefix, (gh, gw))
    elif plane_mode == "rollout_abnar":
        pw = attention_rollout(vit_probs_all, n_prefix).reshape(-1, gh, gw)
    else:
        pw = plane_attention(vit_probs_all[-1], n_prefix, (gh, gw))
    sal = combined_saliency(sw, pw)
    sal = upsample_saliency(sal, (D, H, W))
    return probs, sal


def _resnet3d_saliency(model, variables, source, mask):
    """Grad-CAM++ on the 3D ResNet baseline (reference `resnet.py:56-122`,
    `main_predict.py:_pred_resnet`)."""
    del mask
    B, C, D, H, W = source.shape

    def feats_fn(x):
        return model.apply(variables, x, method="features")

    def classify_fn(a):
        return model.apply(variables, a, method="classify")

    logits, cam = argmax_logit_gradcam(feats_fn, classify_fn, source)
    sal = upsample_saliency(cam[:, 0], (D, H, W))
    return jax.nn.softmax(logits.astype(jnp.float32), -1), sal


def _resnet_slice_saliency(model, variables, source, mask):
    """MST-ResNet: slice attention x per-slice Grad-CAM++
    (reference `resnet.py:200-216`)."""
    B, C, D, H, W = source.shape
    feats = model.apply(variables, source, method="slice_features")

    def scalar_from_feats(a):
        emb = model.apply(variables, a, method="slice_embed")
        emb = emb.reshape(B, D, -1)
        (logits, aux) = model.apply(
            variables, emb, mask, method="fuse",
            return_weights=True, mutable=["intermediates"],
        )
        idx = jnp.argmax(jax.lax.stop_gradient(logits), axis=1)
        score = jnp.sum(jnp.take_along_axis(logits, idx[:, None], axis=1))
        return score, (logits, aux)

    grads, (logits, aux) = jax.grad(scalar_from_feats, has_aux=True)(feats)
    cam = grad_cam_map(feats, grads)  # [B*D, 1, H', W']
    fusion_probs = _find_sowed(aux["intermediates"], "attn_probs")[-1]
    sw = slice_attention(fusion_probs)  # [B, D]
    cam = cam[:, 0].reshape(B, D, *cam.shape[2:])
    sal = upsample_saliency(sw[:, :, None, None] * cam, (D, H, W))
    return jax.nn.softmax(logits.astype(jnp.float32), -1), sal


def _saliency_fn_for(model):
    name = type(model).__name__
    if name == "ResNet3DClassifier":
        return _resnet3d_saliency
    if name == "ResNetSliceTrans":
        return _resnet_slice_saliency
    return _forward_with_saliency


def make_predict_fn(model, tta: bool = False, with_saliency: bool = True,
                    batch_stats=None, plane_mode: str = "last", mesh=None,
                    force_fused: bool = False):
    """Returns jitted fn(params, source [B,C,D,H,W], mask) ->
    (probs [B,n], saliency [B,D,H,W] | None).

    plane_mode applies to the Dino saliency path ("last" | "rollout").

    mesh: an optional pure-data `jax.sharding.Mesh` for multi-chip
    data-parallel serving (e.g. all 8 chips of a v5e-8 host). The batch
    axis shards over `data` and every shard runs the full per-volume
    program — including the fused Pallas / int8 kernels, which are opaque
    Mosaic custom calls to XLA's auto-partitioner and therefore run under
    `shard_map` (the same explicit-SPMD recipe as the fused train step,
    trainer.make_train_step). Serving is embarrassingly parallel over
    volumes: params replicate, no collectives are needed, outputs come
    back batch-sharded. Batches not divisible by the mesh's `data` size
    fall back to the single-program path at trace time (one compile per
    distinct batch shape, as before). The reference has no analogue — its
    predict loop is single-GPU bs=1 (`main_predict.py:204-223`).

    force_fused: engage the fused-kernel path off-TPU (kernels run
    interpreted) — used by the virtual-mesh dryrun and tests to exercise
    the int8/fused serving program under shard_map on CPU."""
    saliency_fn = _saliency_fn_for(model)
    if saliency_fn is _forward_with_saliency and (plane_mode != "last"
                                                  or force_fused):
        saliency_fn = functools.partial(_forward_with_saliency,
                                        plane_mode=plane_mode,
                                        force_fused=force_fused)

    def variables_of(params):
        v = {"params": params}
        if batch_stats is not None:
            v["batch_stats"] = batch_stats
        return v

    def plain_logits(variables, source, mask):
        # Serving fast path: fused Pallas sub-layer kernels for the Dino
        # classifier when no attention maps are requested.
        from mst_tpu.models.vit_fast import (
            fused_config_supported,
            fused_seq_len_ok,
        )

        if (fused_config_supported(model)
                and fused_seq_len_ok(model, *source.shape[-2:])
                and batch_stats is None
                and (jax.default_backend() == "tpu" or force_fused)):
            # (on CPU the fused kernels run interpreted — slower than XLA)
            from mst_tpu.models.vit_fast import fused_mst_logits

            return fused_mst_logits(variables["params"], source, model,
                                    src_key_padding_mask=mask,
                                    dtype=model.dtype)
        if _has_int8(variables["params"]):
            # int8-quantized params only exist for the fused path; a clear
            # error beats a flax missing-'kernel' crash mid-jit (e.g. a
            # slice resolution above FUSED_MAX_TOKENS)
            raise ValueError(
                "int8-quantized params need the fused TPU serving path; "
                "this input/config falls back to the flax composition "
                "(slice tokens must be <= vit_fast.FUSED_MAX_TOKENS)")
        return model.apply(variables, source, mask, deterministic=True)

    def fn(params, source, mask):
        variables = variables_of(params)
        if not tta:
            if with_saliency:
                return saliency_fn(model, variables, source, mask)
            logits = plain_logits(variables, source, mask)
            return jax.nn.softmax(logits.astype(jnp.float32), -1), None

        # Batched TTA: stack the 8 flip variants along the batch axis.
        B = source.shape[0]
        variants = [
            jnp.flip(source, axis=[a + 1 for a in s]) if s else source
            for s in FLIP_SUBSETS
        ]
        stacked = jnp.concatenate(variants, axis=0)  # [8B, C, D, H, W]
        m = None
        if mask is not None:
            # Variants that flip the slice (D) axis must flip the key
            # padding mask too. (The reference keeps the unflipped mask for
            # all variants, main_predict.py:148-149 — a bug not replicated.)
            m = jnp.concatenate([
                jnp.flip(mask, axis=1) if 1 in s_ else mask
                for s_ in FLIP_SUBSETS
            ], 0)
        if with_saliency:
            probs, sal = saliency_fn(model, variables, stacked, m)
        else:
            logits = plain_logits(variables, stacked, m)
            probs, sal = jax.nn.softmax(logits.astype(jnp.float32), -1), None
        probs = probs.reshape(len(FLIP_SUBSETS), B, -1).mean(0)
        if sal is not None:
            sal = sal.reshape(len(FLIP_SUBSETS), B, *sal.shape[1:])
            unflipped = [
                jnp.flip(sal[i], axis=[a for a in s]) if s else sal[i]
                for i, s in enumerate(FLIP_SUBSETS)
            ]
            sal = jnp.stack(unflipped).mean(0)
        return probs, sal

    n_data = 0
    if mesh is not None:
        sizes = dict(mesh.shape)
        n_data = int(sizes.get("data", 1))
        extra = {k: v for k, v in sizes.items() if k != "data" and v > 1}
        if extra:
            raise ValueError(
                f"make_predict_fn(mesh=...) is data-parallel serving only; "
                f"non-trivial axes {extra} are not supported (TP serving "
                f"routes through the flax path + param_shardings instead)")
    if n_data <= 1:
        return jax.jit(fn)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def dispatch(params, source, mask):
        if source.shape[0] % n_data != 0:
            # indivisible batch (e.g. the loader's last partial batch):
            # single-program fallback, identical to the mesh-less path
            return fn(params, source, mask)
        in_specs = (P(), P("data"), P() if mask is None else P("data"))
        # out_specs is a one-spec prefix: every output leaf (probs and,
        # when present, the saliency volume) is batch-sharded
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=P("data"), check_vma=False)(
                             params, source, mask)

    return jax.jit(dispatch)
