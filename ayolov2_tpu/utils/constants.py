"""Dataset label tables and global defaults (parity: scripts/utils/constants.py:17-122).

COCO-80 and VOC-20 class name tables are the standard public orderings.
"""

from __future__ import annotations

from typing import Dict, List

COCO_LABELS: List[str] = [
    "person", "bicycle", "car", "motorcycle", "airplane", "bus", "train", "truck",
    "boat", "traffic light", "fire hydrant", "stop sign", "parking meter", "bench",
    "bird", "cat", "dog", "horse", "sheep", "cow", "elephant", "bear", "zebra",
    "giraffe", "backpack", "umbrella", "handbag", "tie", "suitcase", "frisbee",
    "skis", "snowboard", "sports ball", "kite", "baseball bat", "baseball glove",
    "skateboard", "surfboard", "tennis racket", "bottle", "wine glass", "cup",
    "fork", "knife", "spoon", "bowl", "banana", "apple", "sandwich", "orange",
    "broccoli", "carrot", "hot dog", "pizza", "donut", "cake", "chair", "couch",
    "potted plant", "bed", "dining table", "toilet", "tv", "laptop", "mouse",
    "remote", "keyboard", "cell phone", "microwave", "oven", "toaster", "sink",
    "refrigerator", "book", "clock", "vase", "scissors", "teddy bear",
    "hair drier", "toothbrush",
]

VOC_LABELS: List[str] = [
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor",
]

LABELS: Dict[str, List[str]] = {"COCO": COCO_LABELS, "VOC": VOC_LABELS}

# COCO annotation category ids are 1..90 with gaps; YOLO class index i maps to
# COCO_CATEGORY_IDS[i] (parity: the label_fixer table in
# scripts/utils/multi_queue.py:78-159 / metrics.py COCOmAPEvaluator id fixmap).
COCO_CATEGORY_IDS: List[int] = [
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22,
    23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44,
    46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61, 62, 63, 64,
    65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79, 80, 81, 82, 84, 85, 86, 87, 88,
    89, 90,
]

# Default serving/NMS parameters (parity: val.py:122-138, val2.py:78-82,
# scripts/utils/metrics.py:293,327-328, export.py:55-66).
DEFAULT_CONF_THRESHOLD = 0.001
DEFAULT_IOU_THRESHOLD = 0.65
DEFAULT_TOP_K = 512
DEFAULT_KEEP_TOP_K = 100
DEFAULT_MAX_DET = 300
DEFAULT_NMS_BOX = 1000
DEFAULT_MAX_NMS = 30000

IMG_EXTS = (".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".dng", ".webp")


# Deterministic per-class plot palette (constants.py PLOT_COLOR parity) —
# 20 visually distinct BGR colors, cycled by class index.
PLOT_COLORS = [
    (56, 56, 255), (151, 157, 255), (31, 112, 255), (29, 178, 255),
    (49, 210, 207), (10, 249, 72), (23, 204, 146), (134, 219, 61),
    (52, 147, 26), (187, 212, 0), (168, 153, 44), (255, 194, 0),
    (147, 69, 52), (255, 115, 100), (236, 24, 0), (255, 56, 132),
    (133, 0, 82), (255, 56, 203), (200, 149, 255), (199, 55, 255),
]
