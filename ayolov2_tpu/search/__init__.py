"""Hyperparameter search: a lightweight Optuna-equivalent study engine."""

from ayolov2_tpu.search.study import Study, Trial, create_study

__all__ = ["Study", "Trial", "create_study"]
