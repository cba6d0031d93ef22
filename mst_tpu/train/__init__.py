"""Train loop, optimizer construction, state."""

from mst_tpu.train.predictor import make_predict_fn  # noqa: F401
from mst_tpu.train.trainer import (  # noqa: F401
    FitResult,
    Trainer,
    TrainState,
    cross_entropy_loss,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
