"""Image/CAM helpers (capability twin of `mst/models/utils/functions.py`).

- `one_hot` channels-first one-hot encoding (reference :6-21)
- `minmax_norm` per-batch-per-channel min/max normalisation (reference :25-39)
- `tensor2image` 5D volume -> slice-grid image (reference :42-64)
- `overlay_mask` segmentation overlay (reference `tensor_mask2image` :67-93,
  without the torchvision dependency)
- `overlay_cam` jet-colormap alpha overlay (reference `tensor_cam2image`
  :96-116)

These are host-side artifact producers (numpy + matplotlib), used by the
predict CLI to dump PNGs.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def _mpl():
    """Lazy matplotlib (Agg): importing mst_tpu must not pay the pyplot
    setup cost, and headless installs without matplotlib can still use
    everything but the PNG writers."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.cm as mpl_cm
    import matplotlib.pyplot as plt

    return mpl_cm, plt


def one_hot(index: np.ndarray, num_classes: int) -> np.ndarray:
    """[B, 1, ...] int -> [B, num_classes, ...] one-hot (channels first)."""
    index = np.asarray(index).astype(np.int64)
    if index.ndim >= 2 and index.shape[1] == 1:
        index = index[:, 0]
    out = np.zeros((index.shape[0], num_classes, *index.shape[1:]), np.float32)
    for c in range(num_classes):
        out[:, c] = index == c
    return out


def minmax_norm(x: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """Normalise each (batch, channel) slab to [0, 1]."""
    x = np.asarray(x, dtype=np.float32)
    flat = x.reshape(x.shape[0], x.shape[1], -1)
    mn = flat.min(-1).reshape(*x.shape[:2], *([1] * (x.ndim - 2)))
    mx = flat.max(-1).reshape(*x.shape[:2], *([1] * (x.ndim - 2)))
    return (x - mn) / np.maximum(mx - mn, eps)


def _slice_grid(volume: np.ndarray, max_cols: int = 8) -> np.ndarray:
    """[D, H, W] -> tiled 2D grid."""
    d, h, w = volume.shape
    cols = min(max_cols, d)
    rows = (d + cols - 1) // cols
    grid = np.zeros((rows * h, cols * w), volume.dtype)
    for i in range(d):
        r, c = divmod(i, cols)
        grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = volume[i]
    return grid


def tensor2image(volume: np.ndarray, path, max_cols: int = 8):
    """Save [B, C, D, H, W] (first batch/channel) as a slice-grid PNG."""
    vol = minmax_norm(np.asarray(volume, np.float32))[0, 0]
    grid = _slice_grid(vol, max_cols)
    _save_gray(grid, path)


def overlay_mask(volume: np.ndarray, mask: np.ndarray, path,
                 color=(0.0, 1.0, 0.0), alpha: float = 0.4, max_cols: int = 8):
    """Save volume with a binary mask overlay ([B,C,D,H,W] + [B,1,D,H,W])."""
    vol = minmax_norm(np.asarray(volume, np.float32))[0, 0]
    m = np.asarray(mask).astype(bool)[0, 0]
    g = _slice_grid(vol, max_cols)
    gm = _slice_grid(m.astype(np.float32), max_cols) > 0.5
    rgb = np.stack([g, g, g], -1)
    for c in range(3):
        rgb[..., c] = np.where(gm, (1 - alpha) * rgb[..., c] + alpha * color[c], rgb[..., c])
    _save_rgb(rgb, path)


def overlay_cam(volume: np.ndarray, cam: np.ndarray, path,
                alpha: float = 0.5, clip_quantiles: Optional[tuple] = (0.995, 0.999),
                max_cols: int = 8):
    """Jet-colormap CAM overlay; CAM window-clipped to the given quantiles
    (reference `main_predict.py:296` clips to [q0.995, q0.999])."""
    vol = minmax_norm(np.asarray(volume, np.float32))[0, 0]
    c = np.asarray(cam, np.float32)
    c = c[0, 0] if c.ndim == 5 else (c[0] if c.ndim == 4 else c)
    if clip_quantiles is not None:
        lo, hi = np.quantile(c, clip_quantiles[0]), np.quantile(c, clip_quantiles[1])
        c = np.clip(c, lo, hi)
    c = (c - c.min()) / max(c.max() - c.min(), 1e-8)
    g = _slice_grid(vol, max_cols)
    gc = _slice_grid(c, max_cols)
    mpl_cm, _ = _mpl()
    heat = mpl_cm.jet(gc)[..., :3]
    rgb = (1 - alpha) * np.stack([g, g, g], -1) + alpha * heat
    _save_rgb(rgb, path)


def _save_gray(img: np.ndarray, path):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    _, plt = _mpl()
    plt.imsave(str(path), np.clip(img, 0, 1), cmap="gray")


def _save_rgb(img: np.ndarray, path):
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    _, plt = _mpl()
    plt.imsave(str(path), np.clip(img, 0, 1))
