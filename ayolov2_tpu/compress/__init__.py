"""Model compression: Tucker tensor decomposition with EVBMF rank estimation."""

from ayolov2_tpu.compress.decomposition import (
    EVBMF,
    decompose_model,
    estimate_ranks,
    tucker2,
)

__all__ = ["EVBMF", "decompose_model", "estimate_ranks", "tucker2"]
