"""Training / evaluation: losses, metrics, steps, checkpointing."""

from stofnet_tpu.train.metrics import toa_rmse
from stofnet_tpu.train.loss import heatmap_loss, regression_loss, first_valid_toa
from stofnet_tpu.train.threshold import find_threshold

__all__ = [
    "toa_rmse",
    "heatmap_loss",
    "regression_loss",
    "first_valid_toa",
    "find_threshold",
]
