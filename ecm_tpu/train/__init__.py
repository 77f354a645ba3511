"""Training stack: loss, metrics, TrainState, jitted steps, loop, checkpoints
(reference components T1/T2 training internals — SURVEY.md 2.3, 3.1)."""

from ecm_tpu.train.loss import STAGE_WEIGHTS, masked_smooth_l1, stereo_loss
from ecm_tpu.train.metrics import disparity_metrics
from ecm_tpu.train.state import TrainState, create_train_state

__all__ = [
    "STAGE_WEIGHTS",
    "TrainState",
    "create_train_state",
    "disparity_metrics",
    "masked_smooth_l1",
    "stereo_loss",
]
