"""Root entry point — thin forwarder to cli/train_repr.py (the reference exposes
train_repr.py at the repo root; the implementation lives in cli/train_repr.py)."""

import runpy
from pathlib import Path

if __name__ == "__main__":
    runpy.run_path(str(Path(__file__).resolve().parent / "cli" / "train_repr.py"), run_name="__main__")
