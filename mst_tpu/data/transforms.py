"""Volume transforms: host geometry + fused on-device augmentation.

Capability twin of the reference's torchio pipelines
(`mst/data/datasets/dataset_3d_{lidc,duke,mrnet}.py` +
`augmentations/augmentations_3d.py`), split TPU-first:

1. **Host geometry** (`crop_or_pad`): ragged input volumes are cropped /
   padded to the static target shape in numpy — a pure memory op on ragged
   shapes that would force XLA recompilation per shape. Implements torchio
   `CropOrPad` semantics including mask-centred crops, `padding_mode=
   'minimum'`, and the reference's `random_center` extension
   (`augmentations_3d.py:144-195`).
2. **Device pipeline** (`DeviceAugment`): everything after the crop has a
   static `[C, D, H, W]` shape, so intensity normalisation + augmentation
   compile into ONE fused XLA program, batched over the volume batch and
   rng-keyed per sample (replacing 24 torchio CPU worker processes,
   reference `main_train.py:77`): clamp, rescale-intensity, percentile
   ZNorm (reference `augmentations_3d.py:40-86`), trilinear resize,
   z-axis random rotation, per-axis random flips, random intensity
   inversion, Gaussian noise.

Layout convention: volumes are `[C, D, H, W]` (the reference's post-
`ImageOrSubjectToTensor` layout, `augmentations_3d.py:13-29`); crop targets
are given as `(D, H, W)`.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Host geometry
# ---------------------------------------------------------------------------


def _split_amount(n: int, random_center: bool, rng: Optional[np.random.Generator]):
    """torchio bound split: ini=ceil(n/2), or uniform in [0, n] with
    random_center (reference `augmentations_3d.py:166-189`)."""
    if random_center and rng is not None:
        ini = int(rng.integers(0, n + 1))
    else:
        ini = int(np.ceil(n / 2))
    return ini, n - ini


def crop_or_pad(
    vol: np.ndarray,  # [C, D, H, W]
    target_dhw: Tuple[int, int, int],
    mask: Optional[np.ndarray] = None,  # [1, D, H, W] crop centred on its bbox
    random_center: bool = False,
    rng: Optional[np.random.Generator] = None,
    pad_value: Optional[float] = None,  # None => 'minimum'
    extra: Sequence[np.ndarray] = (),
) -> Tuple[np.ndarray, ...]:
    """Crop/pad spatial axes to `target_dhw`. Returns (vol, mask?, *extra)
    all windowed identically. Mask-centred when `mask` is given (torchio
    `CropOrPad(mask_name=...)` semantics: the window centres on the mask
    bounding-box centre, clamped to stay inside the padded volume)."""
    C, D, H, W = vol.shape
    tgt = tuple(int(t) for t in target_dhw)
    pads = [max(t - s, 0) for t, s in zip(tgt, (D, H, W))]
    pad_widths = [(0, 0)]
    for n in pads:
        pad_widths.append(_split_amount(n, random_center, rng))

    def _pad(x, value):
        return np.pad(x, pad_widths, constant_values=value) if any(p for pw in pad_widths for p in pw) else x

    needs_pad = any(p for pw in pad_widths for p in pw)
    # fill = min is a full volume scan (~25 ms on a strided 256^2x32 f32
    # view) — only pay it when padding actually happens (LIDC's fixed-size
    # step4 crops never pad: the no-pad path is the training hot loop)
    if pad_value is not None:
        fill = float(pad_value)
    elif needs_pad:
        fill = float(vol.min())
    else:
        fill = 0.0
    vol_p = _pad(vol, fill)
    outs = [vol_p]
    if mask is not None:
        outs.append(_pad(mask, 0))
    for e in extra:
        outs.append(_pad(e, 0))

    shape_p = vol_p.shape[1:]
    # bbox centre from axis projections: np.nonzero materialises index
    # arrays from a full volume scan (~7.5 ms/vol in the loader hot path);
    # two boolean any-reductions + tiny flatnonzeros do the same bbox
    nz_axes = None
    if mask is not None:
        m = mask[0] != 0
        proj_dh = m.any(axis=2)  # [D, H]
        if proj_dh.any():
            nz_axes = [np.flatnonzero(proj_dh.any(axis=1)),
                       np.flatnonzero(proj_dh.any(axis=0)),
                       np.flatnonzero(m.any(axis=(0, 1)))]
    if nz_axes is not None:
        center = [int((a[0] + a[-1] + 1) // 2) + pw[0]
                  for a, pw in zip(nz_axes, pad_widths[1:])]
    else:
        center = [s // 2 for s in shape_p]

    starts = []
    for ax, (t, s, c) in enumerate(zip(tgt, shape_p, center)):
        excess = s - t
        if random_center and rng is not None and mask is None:
            start = int(rng.integers(0, excess + 1)) if excess > 0 else 0
        else:
            start = int(np.clip(c - int(np.ceil(t / 2)), 0, excess))
        starts.append(start)

    sl = (slice(None),) + tuple(slice(st, st + t) for st, t in zip(starts, tgt))
    return tuple(np.ascontiguousarray(o[sl]) for o in outs)


def ensure_shape_multiple(
    vol: np.ndarray, multiple, method: str = "pad",
    pad_value: Optional[float] = None, extra: Sequence[np.ndarray] = (),
):
    """Pad (or crop) spatial axes to the next multiple (torchio
    `EnsureShapeMultiple` with the reference's `padding_mode` extension,
    `augmentations_3d.py:128-142`). `multiple` is scalar or per-axis
    (D, H, W)."""
    mult = np.broadcast_to(np.asarray(multiple, np.int64), (3,))
    fn = np.floor if method == "crop" else np.ceil
    src = np.asarray(vol.shape[1:], np.int64)
    target = np.maximum((fn(src / mult) * mult).astype(np.int64), 1)
    return crop_or_pad(vol, tuple(int(t) for t in target),
                       pad_value=pad_value, extra=extra)


# ---------------------------------------------------------------------------
# Device ops (jittable, [C, D, H, W])
# ---------------------------------------------------------------------------


def clamp(vol, lo, hi):
    return jnp.clip(vol, lo, hi)


def rescale_intensity(vol, out_range=(-1.0, 1.0), in_min_max=(-1000.0, 1000.0)):
    """Linear map `in_min_max` -> `out_range`, clipped (torchio
    `RescaleIntensity(in_min_max=...)`, reference LIDC pipeline)."""
    in_lo, in_hi = in_min_max
    out_lo, out_hi = out_range
    x = jnp.clip(vol, in_lo, in_hi)
    return (x - in_lo) / (in_hi - in_lo) * (out_hi - out_lo) + out_lo


def znorm_percentile(
    vol, percentiles=(0.5, 99.5), exclude_extremes: bool = True, eps=1e-8
):
    """Percentile-clipped z-normalisation per channel (reference
    `augmentations_3d.py:40-86` with
    `masking_method=lambda x: (x > x.min()) & (x < x.max())`)."""

    def _one(ch):  # [D, H, W]
        if exclude_extremes:
            m = (ch > ch.min()) & (ch < ch.max())
            # constant channel (e.g. an all-air padded crop): the
            # extremes mask is empty and every nan-stat below would be
            # NaN, poisoning the whole volume — fall back to all voxels
            # (std 0 -> eps floor -> output 0; torchio raises here)
            m = m | ~m.any()
        else:
            m = jnp.ones_like(ch, dtype=bool)
        masked = jnp.where(m, ch, jnp.nan)
        lo = jnp.nanpercentile(masked, percentiles[0])
        hi = jnp.nanpercentile(masked, percentiles[1])
        ch = jnp.clip(ch, lo, hi)
        masked = jnp.where(m, ch, jnp.nan)
        mean = jnp.nanmean(masked)
        std = jnp.nanstd(masked)
        return (ch - mean) / jnp.maximum(std, eps)

    return jax.vmap(_one)(vol)


def resize_trilinear(vol, target_dhw):
    """[C, D, H, W] -> [C, *target_dhw] (torchio `Resize`)."""
    C = vol.shape[0]
    return jax.image.resize(vol, (C, *target_dhw), method="trilinear")


def rotate_z(vol, angle_rad, fill=None, order_mask: bool = False):
    """Rotate the in-plane (H, W) axes by `angle_rad` about the slice centre
    (torchio `RandomAffine(degrees=(0,0,0,0,0,90))` — rotation about the
    anatomical z == our slice axis). Bilinear for images, nearest for masks.
    """
    C, D, H, W = vol.shape
    fill_val = jnp.min(vol) if fill is None else fill
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy = jnp.arange(H, dtype=jnp.float32)[:, None] - cy
    xx = jnp.arange(W, dtype=jnp.float32)[None, :] - cx
    cos, sin = jnp.cos(angle_rad), jnp.sin(angle_rad)
    src_y = cos * yy - sin * xx + cy
    src_x = sin * yy + cos * xx + cx
    coords = jnp.stack(
        [jnp.broadcast_to(src_y, (H, W)), jnp.broadcast_to(src_x, (H, W))]
    )

    def _plane(p):  # [H, W]
        out = jax.scipy.ndimage.map_coordinates(
            p, [coords[0], coords[1]], order=0 if order_mask else 1,
            mode="constant", cval=fill_val,
        )
        return out

    flat = vol.reshape(C * D, H, W)
    return jax.vmap(_plane)(flat).reshape(C, D, H, W)


def random_flips(key, flags_axes=(0, 1, 2)):
    """Sample per-axis flip booleans (p=0.5 each, torchio `RandomFlip`)."""
    return jax.random.bernoulli(key, 0.5, (len(flags_axes),))


def apply_flips(vol, flip_flags, axes=(1, 2, 3)):
    for i, ax in enumerate(axes):
        vol = jnp.where(flip_flags[i], jnp.flip(vol, axis=ax), vol)
    return vol


# ---------------------------------------------------------------------------
# Fused device pipeline
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AugmentConfig:
    """Static config of the fused device augmentation program."""

    # intensity normalisation (exactly one of these active, or neither)
    clamp_range: Optional[Tuple[float, float]] = None  # LIDC (-1000, 1000)
    rescale: Optional[Tuple[Tuple[float, float], Tuple[float, float]]] = None
    # ((out_lo, out_hi), (in_lo, in_hi)) — LIDC ((-1, 1), (-1000, 1000))
    znorm_percentiles: Optional[Tuple[float, float]] = None  # DUKE/MRNet
    resize_to: Optional[Tuple[int, int, int]] = None  # MRNet (32, 224, 224)
    # train-time randomness
    random_rotate: bool = False  # z-rot, uniform(0, 90) degrees
    flip: bool = False
    invert: bool = False  # random intensity inversion (reference `noise` flag)
    noise_std: float = 0.0  # sigma ~ U(0, noise_std)
    has_mask: bool = False  # a mask rides along through the geometry ops


def _augment_one(cfg: AugmentConfig, train: bool, vol, mask, key):
    """vol [C, D, H, W] (any float dtype — upcast to f32 on device; callers
    may ship float16 over the host link to halve transfer bytes);
    mask [1, D, H, W] or zeros; key: PRNGKey."""
    vol = vol.astype(jnp.float32)
    k_rot, k_flip, k_inv, k_sig, k_noise = jax.random.split(key, 5)

    if cfg.clamp_range is not None:
        vol = clamp(vol, *cfg.clamp_range)
    if cfg.rescale is not None:
        out_range, in_min_max = cfg.rescale
        vol = rescale_intensity(vol, out_range, in_min_max)
    # Resize BEFORE percentile znorm: the reference MRNet chain is
    # CropOrPad -> Resize(224) -> ZNormalization (dataset_3d_mrnet.py:39-42),
    # i.e. the normalisation statistics and the (min<x<max) extremes mask are
    # computed on the 224-resolution volume after interpolation. The order
    # only matters when both are configured (exactly the MRNet config).
    if cfg.resize_to is not None:
        vol = resize_trilinear(vol, cfg.resize_to)
        if cfg.has_mask:
            mask = (resize_trilinear(mask.astype(jnp.float32), cfg.resize_to) > 0.5)
    if cfg.znorm_percentiles is not None:
        vol = znorm_percentile(vol, cfg.znorm_percentiles)

    if train and cfg.random_rotate:
        ang = jax.random.uniform(k_rot, (), minval=0.0, maxval=jnp.pi / 2)
        vol = rotate_z(vol, ang)
        if cfg.has_mask:
            mask = rotate_z(mask.astype(jnp.float32), ang, fill=0.0,
                            order_mask=True) > 0.5
    if train and cfg.flip:
        flags = random_flips(k_flip)
        vol = apply_flips(vol, flags)
        if cfg.has_mask:
            mask = apply_flips(mask, flags)
    if train and cfg.invert:
        vol = jnp.where(jax.random.bernoulli(k_inv), -vol, vol)
    if train and cfg.noise_std > 0.0:
        sigma = jax.random.uniform(k_sig, (), maxval=cfg.noise_std)
        vol = vol + sigma * jax.random.normal(k_noise, vol.shape)
    return vol, mask


class DeviceAugment:
    """Jit-compiled, vmapped augmentation stage: [B, C, D, H, W] in one call."""

    def __init__(self, cfg: AugmentConfig, train: bool):
        self.cfg = cfg
        self.train = train
        self._fn = jax.jit(
            jax.vmap(functools.partial(_augment_one, cfg, train))
        )

    def __call__(self, volumes, masks, keys):
        return self._fn(volumes, masks, keys)
