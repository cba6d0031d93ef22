"""ResNet family: N-D backbone, 3D baseline classifier, MST-ResNet.

Capability twin of `mst/models/resnet.py`:
- `ResNetBackbone` generalises torchvision/MONAI ResNet topology over
  spatial_dims in {2, 3}: conv7 stride-2 stem -> BN/ReLU -> maxpool ->
  4 stages of Basic/Bottleneck blocks. The final ReLU feature map is the
  Grad-CAM target (the reference hooks every ReLU but consumes only the
  last one, `resnet.py:76-91`).
- `ResNet3DClassifier` = the 3D baseline (`ResNet`, reference :25-122):
  backbone + global average pool + linear; `features`/`classify` methods
  feed `mst_tpu.ops.gradcam.argmax_logit_gradcam` for saliency.
- `ResNetSliceTrans` = MST-ResNet (reference :127-244): 2D ResNet34 per
  slice (gray->RGB repeat :180, slice-to-batch rearrange :181), 1-layer
  slice TransformerEncoder (d=512, nhead=16, ff=1x, pre-norm, final
  LayerNorm, :155-167), learnable CLS (:168), linear head. Saliency =
  slice attention x per-slice Grad-CAM (:200-216).

TPU notes: BatchNorm statistics live in the `batch_stats` collection
(rng-free, jit-friendly); convs are NDHWC/NHWC so XLA lowers them onto the
MXU directly.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mst_tpu.models.slice_fusion import TransformerEncoderLayer

Dtype = jnp.dtype


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dims = x.ndim - 2
        k3 = (3,) * dims
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, dtype=self.dtype, name=name
        )
        residual = x
        y = nn.Conv(self.features, k3, strides=(self.stride,) * dims,
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.features, k3, padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1,) * dims,
                               strides=(self.stride,) * dims, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dims = x.ndim - 2
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, dtype=self.dtype, name=name
        )
        residual = x
        y = nn.Conv(self.features, (1,) * dims, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.features, (3,) * dims, strides=(self.stride,) * dims,
                    padding=1, use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(4 * self.features, (1,) * dims, use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(4 * self.features, (1,) * dims,
                               strides=(self.stride,) * dims, use_bias=False,
                               dtype=self.dtype, name="downsample_conv")(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


_RESNET_LAYERS = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


def resnet_out_channels(variant: int) -> int:
    block, _ = _RESNET_LAYERS[variant]
    return 512 if block is BasicBlock else 2048


class ResNetBackbone(nn.Module):
    """Channels-last backbone -> final ReLU feature map [B, *spatial, C]."""

    variant: int = 34
    stem_width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dims = x.ndim - 2
        block_cls, counts = _RESNET_LAYERS[self.variant]
        y = nn.Conv(self.stem_width, (7,) * dims, strides=(2,) * dims,
                    padding=3, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(nn.BatchNorm(use_running_average=not train,
                                 dtype=self.dtype, name="bn1")(y))
        y = nn.max_pool(y, (3,) * dims, strides=(2,) * dims, padding=((1, 1),) * dims)
        widths = (64, 128, 256, 512)
        for stage, (w, n) in enumerate(zip(widths, counts)):
            for i in range(n):
                stride = 2 if (i == 0 and stage > 0) else 1
                y = block_cls(w, stride=stride, dtype=self.dtype,
                              name=f"layer{stage + 1}_{i}")(y, train=train)
        return y


class ResNet3DClassifier(nn.Module):
    """3D ResNet baseline (reference `ResNet`, spatial_dims=3, from-scratch
    MONAI-style topology, `resnet.py:51-53`)."""

    out_ch: int = 2
    variant: int = 50
    in_ch: int = 1
    dtype: Dtype = jnp.float32
    # parity with the DINO classifier signature (unused)
    freeze: bool = False

    def setup(self):
        self.backbone = ResNetBackbone(self.variant, dtype=self.dtype,
                                       name="backbone")
        self.fc = nn.Dense(self.out_ch, name="fc")

    def features(self, source: jax.Array, *, train: bool = False) -> jax.Array:
        """[B, C, D, H, W] -> final ReLU map [B, C', D', H', W']."""
        x = jnp.moveaxis(source, 1, -1).astype(self.dtype)  # NDHWC
        y = self.backbone(x, train=train)
        return jnp.moveaxis(y, -1, 1).astype(jnp.float32)

    def classify(self, feats: jax.Array) -> jax.Array:
        pooled = jnp.mean(feats, axis=tuple(range(2, feats.ndim)))
        return self.fc(pooled)

    def __call__(self, source, src_key_padding_mask=None, *,
                 deterministic: bool = True, return_weights: str = "none"):
        del src_key_padding_mask, return_weights
        return self.classify(self.features(source, train=not deterministic))


class ResNetSliceTrans(nn.Module):
    """MST-ResNet (reference `ResNetSliceTrans`, `resnet.py:127-244`)."""

    out_ch: int = 2
    variant: int = 34
    fusion_heads: int = 16
    fusion_layers: int = 1
    rotary: Optional[str] = None
    dtype: Dtype = jnp.float32
    freeze: bool = False

    def setup(self):
        self.backbone = ResNetBackbone(self.variant, dtype=self.dtype,
                                       name="backbone")
        self.emb_ch = resnet_out_channels(self.variant)
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(1.0), (1, 1, self.emb_ch)
        )
        self.fusion = [
            TransformerEncoderLayer(
                d_model=self.emb_ch, nhead=self.fusion_heads,
                dim_feedforward=self.emb_ch, norm_first=True,
                rotary=self.rotary, dtype=self.dtype, name=f"fusion_{i}",
            )
            for i in range(self.fusion_layers)
        ]
        # torch nn.LayerNorm eps (1e-5), not flax's 1e-6 default — the
        # reference's TransformerEncoder final norm (`resnet.py:163`)
        self.fusion_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                        name="fusion_norm")
        self.linear = nn.Dense(self.out_ch, name="linear")

    def slice_features(self, source: jax.Array, *, train: bool = False):
        """[B, C, D, H, W] -> per-slice final ReLU maps [B*D, C', H', W']."""
        B, C, D, H, W = source.shape
        x = jnp.transpose(source, (0, 2, 3, 4, 1)).reshape(B * D, H, W, C)
        if C == 1:  # gray -> RGB (reference :180)
            x = jnp.repeat(x, 3, axis=-1)
        y = self.backbone(x.astype(self.dtype), train=train)
        return jnp.moveaxis(y, -1, 1).astype(jnp.float32)  # [B*D, C', H', W']

    def slice_embed(self, feats: jax.Array) -> jax.Array:
        return jnp.mean(feats, axis=(2, 3))  # [B*D, emb]

    def fuse(self, feats_bde: jax.Array, src_key_padding_mask=None, *,
             deterministic: bool = True, return_weights: bool = False):
        B = feats_bde.shape[0]
        cls = jnp.broadcast_to(self.cls_token.astype(feats_bde.dtype),
                               (B, 1, self.emb_ch))
        h = jnp.concatenate([cls, feats_bde], axis=1)
        mask = None
        if src_key_padding_mask is not None:
            mask = jnp.concatenate(
                [jnp.zeros((B, 1), bool), src_key_padding_mask], axis=1
            )
        for layer in self.fusion:
            h = layer(h, key_padding_mask=mask, return_weights=return_weights,
                      deterministic=deterministic)
        h = self.fusion_norm(h)
        return self.linear(h[:, 0].astype(jnp.float32))

    def __call__(self, source, src_key_padding_mask=None, *,
                 deterministic: bool = True, return_weights: str = "none"):
        B, C, D, H, W = source.shape
        feats = self.slice_features(source, train=not deterministic)
        emb = self.slice_embed(feats).reshape(B, D, self.emb_ch)
        return self.fuse(
            emb, src_key_padding_mask, deterministic=deterministic,
            return_weights=return_weights != "none",
        )
