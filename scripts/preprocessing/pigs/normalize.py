#!/usr/bin/env python
"""Mean/std normalisation (port of `scripts/preprocessing/pigs/normalize.py`)."""

from __future__ import annotations

import numpy as np


def normalize_mean_std(volume: np.ndarray):
    mean = float(np.mean(volume))
    std = float(np.std(volume))
    return (volume - mean) / (std + 1e-6), mean, std
