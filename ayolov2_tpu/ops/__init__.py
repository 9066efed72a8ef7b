"""Compute ops: fixed-shape NMS, fused decode+NMS serving path, TTA."""

from ayolov2_tpu.ops.nms import batched_nms, non_max_suppression_np

__all__ = ["batched_nms", "non_max_suppression_np"]
