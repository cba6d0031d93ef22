"""Native N4-style MRI bias-field correction (no ITK dependency).

The reference wraps SimpleITK's `N4BiasFieldCorrectionImageFilter`
(`scripts/preprocessing/pigs/bias_field_correction.py:29-33` — ITK C++),
the one native capability round 1 left as a dep-gated wrapper. This module
implements the N4 algorithm (Tustison et al. 2010, itself N3 of Sled et
al. 1998 with a B-spline field model) from scratch:

1. work in the log domain: v = log(I) on a foreground mask (Otsu);
2. per iteration, SHARPEN the log-intensity histogram by Wiener
   deconvolution with a Gaussian blur kernel (the modelled effect of a
   smooth multiplicative field on the intensity distribution), giving the
   expected true intensity E[u | v] per observed voxel;
3. the residual v - E[u | v] is a pointwise bias estimate; fit a SMOOTH
   field to it (masked normalized-convolution Gaussian smoothing, in a
   multi-resolution schedule standing in for ITK's B-spline levels);
4. subtract, accumulate, repeat until the field update's std < tol.

Output matches the contract of the ITK filter: corrected = I / exp(field).

Pure numpy + scipy.ndimage — runs anywhere the ETL runs.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from scipy import ndimage


def otsu_threshold(vol: np.ndarray, nbins: int = 200) -> float:
    """Otsu's method on the intensity histogram (ITK `OtsuThreshold`
    analogue used to build the N4 foreground mask)."""
    v = np.asarray(vol, np.float64).ravel()
    v = v[np.isfinite(v)]
    hist, edges = np.histogram(v, bins=nbins)
    centers = 0.5 * (edges[:-1] + edges[1:])
    w = hist.astype(np.float64)
    p = w / max(w.sum(), 1e-12)
    omega = np.cumsum(p)
    mu = np.cumsum(p * centers)
    mu_t = mu[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = (mu_t * omega - mu) ** 2 / (omega * (1.0 - omega))
    sigma_b[~np.isfinite(sigma_b)] = -1.0
    return float(centers[int(np.argmax(sigma_b))])


def _sharpen_expectation(v: np.ndarray, fwhm: float = 0.15,
                         wiener_noise: float = 0.01,
                         nbins: int = 200) -> np.ndarray:
    """N4 histogram sharpening: deconvolve the log-intensity histogram with
    a Gaussian (Wiener filter), then return E[true | observed] per voxel.

    Mirrors ITK's `SharpenImage` (BiasFieldCorrectionImageFilter): the
    smooth field acts as a Gaussian blur on the log-intensity histogram; the
    deconvolved histogram is the estimated distribution of true intensities
    u, and E[u|v] comes from the convolution of that estimate with the same
    kernel, weighted by intensity.
    """
    lo, hi = float(v.min()), float(v.max())
    if hi - lo < 1e-9:
        return v
    scale = (nbins - 1) / (hi - lo)
    idx_f = (v - lo) * scale
    idx = np.floor(idx_f).astype(np.int64)
    frac = idx_f - idx
    # linear-interpolated histogram (ITK does the same sub-bin split)
    h = np.zeros(nbins, np.float64)
    np.add.at(h, idx, 1.0 - frac)
    np.add.at(h, np.minimum(idx + 1, nbins - 1), frac)

    # Gaussian kernel in histogram-bin units from the bias FWHM (log units)
    sigma_bins = (fwhm / np.sqrt(8.0 * np.log(2.0))) * scale
    n_pad = int(2 ** np.ceil(np.log2(2 * nbins)))
    freq = np.fft.fftfreq(n_pad)
    # FT of a unit Gaussian with std sigma_bins (bins)
    F = np.exp(-2.0 * (np.pi * freq * sigma_bins) ** 2)
    H = np.fft.fft(h, n_pad)
    # Wiener deconvolution: estimate of the TRUE intensity histogram
    G = np.conj(F) / (np.abs(F) ** 2 + wiener_noise)
    u_hist = np.maximum(np.real(np.fft.ifft(H * G)), 0.0)[:nbins]

    centers = lo + np.arange(nbins) / scale
    num = np.real(np.fft.ifft(np.fft.fft(u_hist * centers, n_pad) * F))[:nbins]
    den = np.real(np.fft.ifft(np.fft.fft(u_hist, n_pad) * F))[:nbins]
    expect = np.where(den > 1e-12, num / np.maximum(den, 1e-12), centers)
    # E[u|v] looked up at the observed intensities (linear interp)
    return np.interp(v, centers, expect)


def _smooth_field(residual: np.ndarray, mask: np.ndarray,
                  sigma: float) -> np.ndarray:
    """Masked smooth-field fit via normalized convolution (the B-spline
    stand-in): Gaussian-smooth mask*residual / Gaussian-smooth mask, which
    extrapolates smoothly outside the mask."""
    m = mask.astype(np.float64)
    num = ndimage.gaussian_filter(residual * m, sigma, mode="nearest")
    den = ndimage.gaussian_filter(m, sigma, mode="nearest")
    return num / np.maximum(den, 1e-6)


def n4_bias_correct(
    vol: np.ndarray,
    mask: Optional[np.ndarray] = None,
    iterations: int = 20,
    levels: int = 4,
    fwhm: float = 0.15,
    convergence_tol: float = 1e-3,
    initial_sigma: Optional[float] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (corrected volume, multiplicative bias field exp(f)).

    `iterations` x `levels` mirrors the reference configuration
    (`SetMaximumNumberOfIterations([20] * 4)`); each level halves the
    smoothing sigma (ITK halves the B-spline control-point spacing).
    """
    vol = np.asarray(vol, np.float64)
    if mask is None:
        mask = vol > otsu_threshold(vol)
    mask = mask & (vol > 0) & np.isfinite(vol)
    if not mask.any():
        return vol.astype(np.float32), np.ones_like(vol, np.float32)

    log_img = np.where(mask, np.log(np.maximum(vol, 1e-12)), 0.0)
    v = log_img[mask]
    total_field = np.zeros_like(vol)
    if initial_sigma is None:
        initial_sigma = max(vol.shape) / 4.0

    for level in range(levels):
        sigma = max(initial_sigma / (2 ** level), 2.0)
        for _ in range(iterations):
            expect = _sharpen_expectation(v, fwhm=fwhm)
            residual = np.zeros_like(vol)
            residual[mask] = v - expect
            field = _smooth_field(residual, mask, sigma)
            v = v - field[mask]
            total_field += field
            if float(field[mask].std()) < convergence_tol:
                break

    bias = np.exp(total_field)
    corrected = vol / np.maximum(bias, 1e-6)
    return corrected.astype(np.float32), bias.astype(np.float32)
