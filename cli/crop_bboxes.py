"""Pre-crop GT boxes to images for representation learning.

Parity target: /root/reference/scripts/representation_learning/crop_bboxes.py.

Usage:
    python cli/crop_bboxes.py --img-dir data/coco/images/train2017 --save-dir data/crops
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
if str(ROOT) not in sys.path:
    sys.path.insert(0, str(ROOT))

from ayolov2_tpu.data.datasets_repr import crop_and_save_bboxes

if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Crop GT boxes to images.")
    parser.add_argument("--img-dir", type=str, required=True)
    parser.add_argument("--save-dir", type=str, required=True)
    parser.add_argument("--min-size", type=int, default=32)
    args = parser.parse_args()
    crop_and_save_bboxes(args.img_dir, args.save_dir, args.min_size)
