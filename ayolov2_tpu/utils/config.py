"""YAML config trio loader + run-dir snapshotting.

The framework keeps the reference's config contract (SURVEY §5):
  - model YAML (kindle schema: res/configs/model/*.yaml)
  - data YAML (train_path/val_path/nc/dataset/names: res/configs/data/coco.yaml)
  - train cfg YAML (train / hyper_params / yolo_augmentation / augmentation
    sections: res/configs/cfg/train_config.yaml)
CLI argparse overlays are merged on top, and the fully merged config plus
copies of the three input files are snapshotted into the run log dir
(parity: scripts/train/train_model_builder.py:60-73).
"""

from __future__ import annotations

import datetime
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Union

import yaml

from ayolov2_tpu.utils.general import increment_path


def load_yaml(path: Union[str, Path]) -> Dict[str, Any]:
    with open(path, encoding="utf-8") as f:
        return yaml.safe_load(f)


def save_yaml(obj: Dict[str, Any], path: Union[str, Path]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        yaml.safe_dump(obj, f, sort_keys=False)


def make_run_dir(root: Union[str, Path], mode: str = "train") -> Path:
    """Create an auto-incremented run dir ``{root}/{mode}/{DATE}_runs{N}``.

    Parity: scripts/utils/general.py:361-391 + train_utils.py:95-100.
    """
    date = datetime.datetime.now().strftime("%Y_%m%d")
    base = Path(root) / mode / f"{date}_runs"
    path = Path(increment_path(base))
    path.mkdir(parents=True, exist_ok=True)
    return path


def snapshot_configs(
    run_dir: Union[str, Path],
    merged: Dict[str, Any],
    files: Optional[Dict[str, Union[str, Path]]] = None,
) -> None:
    """Write merged config + copies of input YAMLs into the run dir."""
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    save_yaml(merged, run_dir / "args.yaml")
    for name, src in (files or {}).items():
        src = Path(src)
        if src.exists():
            shutil.copy(src, run_dir / f"{name}{src.suffix}")


def merge_configs(*cfgs: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively merge dicts left-to-right (later wins)."""
    out: Dict[str, Any] = {}
    for cfg in cfgs:
        for k, v in (cfg or {}).items():
            if k in out and isinstance(out[k], dict) and isinstance(v, dict):
                out[k] = merge_configs(out[k], v)
            else:
                out[k] = v
    return out
