"""W&B integration — gated on the optional wandb package.

Parity target: /root/reference/scripts/utils/wandb_utils.py:18-120
(``load_model_from_wandb`` downloads a run's best checkpoint,
``get_ckpt_path`` resolves wandb-path-or-local-path, ``summary`` logging).
wandb is not in this image; every function degrades gracefully so the rest
of the framework never hard-depends on it.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

from ayolov2_tpu.utils.logger import get_logger

LOGGER = get_logger(__name__)

WANDB_ARTIFACT_PREFIX = "wandb://"


def wandb_available() -> bool:
    try:
        import wandb  # noqa: F401

        return True
    except ImportError:
        return False


def is_wandb_path(path: str) -> bool:
    """A run path like 'entity/project/run_id' (no file on disk, 2 slashes)."""
    return (
        path.startswith(WANDB_ARTIFACT_PREFIX)
        or (not Path(path).exists() and path.count("/") == 2 and not path.endswith(".ckpt"))
    )


def download_from_wandb(run_path: str, weight_name: str = "best.ckpt",
                        out_dir: str = "wandb_ckpt") -> Optional[str]:
    """Download a checkpoint file from a wandb run (wandb_utils.py:95-120)."""
    if not wandb_available():
        LOGGER.warning("wandb not installed; cannot download %s", run_path)
        return None
    import wandb

    run_path = run_path.removeprefix(WANDB_ARTIFACT_PREFIX)
    api = wandb.Api()
    run = api.run(run_path)
    dest = Path(out_dir) / run_path.replace("/", "_")
    dest.mkdir(parents=True, exist_ok=True)
    for f in run.files():
        if f.name.endswith(weight_name):
            f.download(root=str(dest), replace=True)
            return str(dest / f.name)
    LOGGER.warning("no %s in run %s", weight_name, run_path)
    return None


def get_ckpt_path(path: str) -> str:
    """Local path passthrough, wandb run path -> downloaded file
    (wandb_utils.py get_ckpt_path semantics)."""
    if Path(path).exists():
        return path
    if is_wandb_path(path):
        downloaded = download_from_wandb(path)
        if downloaded:
            return downloaded
    return path


def init_run(project: str = "ayolov2_tpu", name: Optional[str] = None,
             config: Optional[Dict[str, Any]] = None):
    """wandb.init when available, else None."""
    if not wandb_available():
        return None
    import wandb

    return wandb.init(project=project, name=name, config=config)
