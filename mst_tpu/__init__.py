"""mst_tpu — TPU-native Medical Slice Transformer framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the
`gabrielfnayres/new-vit` (Medical Slice Transformer, MST) reference:
3D medical-volume classification via per-slice 2D ViT/ResNet encoders +
a slice-fusion transformer, with attention-based 3D saliency maps and
AUC / Dice evaluation — built TPU-first:

- compute path: jit-compiled XLA programs, Pallas flash-attention kernels,
  bf16 on the MXU, whole volumes encoded in one fused program;
- scaling path: `jax.sharding.Mesh` + NamedSharding (data / slice / tensor
  axes) with XLA collectives, not process-level DDP;
- explainability: functional "return aux" attention (no hooks) and
  Grad-CAM++ via `jax.vjp`.

Layer map (mirrors SURVEY.md §7.1):
  ops/       Pallas kernels + pure-function numerics (attention, rotary,
             resampling, on-device augmentation)
  models/    flax.linen modules: DINOv2-style ViT, ResNets, slice fusion,
             MST classifiers
  parallel/  mesh construction, sharding rules, collective helpers
  data/      dataset catalog (LIDC/DUKE/MRNet/synthetic) + host loader
  train/     train state, loops, early stopping, checkpoint policy
  utils/     metrics (AUROC/Accuracy/Dice/IoU/ASSD), ROC plots, DeLong,
             checkpoint pointer files, image dumping
"""

__version__ = "0.1.0"

from mst_tpu import ops, models, data, parallel, train, utils  # noqa: F401
