"""Training layer: optimizer groups, schedules, EMA, train state, trainers."""

from ayolov2_tpu.train.optimizer import build_optimizer, lr_schedule
from ayolov2_tpu.train.train_state import EMA, TrainState, make_train_step

__all__ = ["build_optimizer", "lr_schedule", "TrainState", "EMA", "make_train_step"]
