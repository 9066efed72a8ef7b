"""Host-side input pipeline: datasets, augmentation, batching, device feed.

The reference's data layer (scripts/data_loader/, scripts/augmentation/;
SURVEY.md C13/C14/C16) re-built around fixed-shape batches for XLA: labels
are padded to capacity, rect-batch shapes are quantized to a small set of
compiled shapes, and batches land on device via jax.device_put (sharded per
host under a mesh).
"""

from ayolov2_tpu.data.datasets import DetectionDataset, ImageFolderDataset
from ayolov2_tpu.data.loader import DataLoader

__all__ = ["DetectionDataset", "ImageFolderDataset", "DataLoader"]
