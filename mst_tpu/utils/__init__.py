"""Metrics, artifacts, checkpoint bookkeeping, NIfTI I/O."""

from mst_tpu.utils import checkpoint, delong, functions, metrics, nifti, roc_curve, seg_metrics  # noqa: F401
