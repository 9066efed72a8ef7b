"""Root entry point — thin forwarder to cli/train.py (the reference exposes
train.py at the repo root; the implementation lives in cli/train.py)."""

import runpy
from pathlib import Path

if __name__ == "__main__":
    runpy.run_path(str(Path(__file__).resolve().parent / "cli" / "train.py"), run_name="__main__")
