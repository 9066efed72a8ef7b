"""Loss layer: YOLOv5 detection loss + representation-learning losses."""

from ayolov2_tpu.loss.yolo_loss import ComputeLoss, pad_targets

__all__ = ["ComputeLoss", "pad_targets"]
