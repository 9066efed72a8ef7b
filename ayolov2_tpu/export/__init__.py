"""Export: AOT serving artifacts (StableHLO via jax.export) + sidecar configs."""

from ayolov2_tpu.export.exporter import export_serving, load_exported, make_serving_fn

__all__ = ["export_serving", "load_exported", "make_serving_fn"]
