"""AYolov2-TPU: a TPU-native (JAX/XLA/Pallas/pjit) object-detection framework.

A from-scratch rebuild of the capabilities of j-marple-dev/AYolov2 (YOLOv5-family
detection: YAML-declared models, training with mosaic/HSV/perspective augmentation,
CIoU loss with anchor-ratio target assignment, EMA, SWA, batched NMS, COCO mAP
evaluation, tensor decomposition, TTA, hyperparameter search, and AOT export) —
redesigned TPU-first: NHWC layouts, bf16 compute on the MXU, fixed static shapes
everywhere, and `jax.sharding.Mesh` + pjit data parallelism for
the post-processing hot path.

Reference behavior citations throughout point into /root/reference (file:line).
"""

__version__ = "0.1.0"
