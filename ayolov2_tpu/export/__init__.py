"""Export: AOT serving artifacts (StableHLO via jax.export) + sidecar configs."""

from ayolov2_tpu.export.exporter import (
    device_letterbox,
    export_serving,
    letterbox_geometry,
    load_exported,
    make_raw_serving_fn,
    make_serving_fn,
)

__all__ = [
    "device_letterbox",
    "export_serving",
    "letterbox_geometry",
    "load_exported",
    "make_raw_serving_fn",
    "make_serving_fn",
]
