"""Grad-CAM / Grad-CAM++ as pure functions over (activation, gradient).

Functional port of the reference's backward-inside-forward hook dance
(`mst/models/resnet.py:56-122`): the reference registers hooks on every
ReLU, backprops the argmax logit inside `forward`, and uses the LAST
feature map (`get_attention_maps` returns `attention_maps[-1]`,
`resnet.py:76-77`). Here the model exposes `features()` / `classify()`
and the gradient of the argmax logit w.r.t. the final feature map comes
from one `jax.vjp` — same math, one fused XLA program, no hooks.

`grad_cam_weights` implements eq. 19 of Grad-CAM++ (arXiv:1710.11063),
matching reference `resnet.py:105-122`; `grad_cam_map` adds the ReLU +
per-map min/max normalisation of `resnet.py:93-103`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grad_cam_weights(grads: jax.Array, act: jax.Array,
                     mode: str = "gradcam++") -> jax.Array:
    """grads/act: [B, C, *spatial] -> weights [B, C, 1...]."""
    spatial = tuple(range(2, grads.ndim))
    if mode == "gradcam":
        return jnp.mean(grads, axis=spatial, keepdims=True)
    if mode != "gradcam++":
        raise ValueError(f"unknown CAM mode {mode!r}")
    g2 = grads**2
    g3 = g2 * grads
    sum_act = jnp.sum(act, axis=spatial, keepdims=True)
    denom = 2.0 * g2 + sum_act * g3 + 1e-6
    denom = jnp.where(denom != 0.0, denom, 1.0)
    aij = g2 / denom
    weights = jax.nn.relu(grads) * aij
    return jnp.sum(weights, axis=spatial, keepdims=True)


def grad_cam_map(act: jax.Array, grads: jax.Array,
                 mode: str = "gradcam++") -> jax.Array:
    """-> normalised CAM [B, 1, *spatial]."""
    w = grad_cam_weights(grads, act, mode)
    cam = jax.nn.relu(jnp.sum(w * act, axis=1, keepdims=True))
    flat = cam.reshape(cam.shape[0], -1)
    mn = flat.min(-1).reshape(-1, *[1] * (cam.ndim - 1))
    mx = flat.max(-1).reshape(-1, *[1] * (cam.ndim - 1))
    return (cam - mn) / jnp.maximum(mx - mn, 1e-12)


def argmax_logit_gradcam(features_fn, classify_fn, x,
                         mode: str = "gradcam++"):
    """Full Grad-CAM pipeline: returns (logits, cam).

    features_fn: x -> activation [B, C, *spatial] (the final ReLU map);
    classify_fn: activation -> logits [B, n_cls].
    The backprop target is the argmax logit summed over the batch
    (reference `resnet.py:66-69`).
    """
    act = features_fn(x)

    def scalar_from_act(a):
        logits = classify_fn(a)
        idx = jnp.argmax(jax.lax.stop_gradient(logits), axis=1)
        return jnp.sum(jnp.take_along_axis(logits, idx[:, None], axis=1)), logits

    grads, logits = jax.grad(scalar_from_act, has_aux=True)(act)
    return logits, grad_cam_map(act, grads, mode)
