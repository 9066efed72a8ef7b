"""Model layer: YAML-declared YOLOv5-family networks as flax.linen modules.

This package re-creates the external `kindle` model library used by the
reference (SURVEY.md §2.2) TPU-first: NHWC layouts, bf16 compute, static
shapes, and a param-transform BN fusion instead of in-place module surgery.
"""

from ayolov2_tpu.models.builder import (
    YOLOModel,
    build_model,
    count_params,
    fuse_params,
    init_model,
)

__all__ = ["YOLOModel", "build_model", "count_params", "fuse_params", "init_model"]
