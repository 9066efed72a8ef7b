"""Evaluation: the full validation loop (YoloValidator parity)."""

from ayolov2_tpu.eval.validator import YoloValidator

__all__ = ["YoloValidator"]
