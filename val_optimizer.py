"""Root entry point — thin forwarder to cli/val_optimizer.py (the reference exposes
val_optimizer.py at the repo root; the implementation lives in cli/val_optimizer.py)."""

import runpy
from pathlib import Path

if __name__ == "__main__":
    runpy.run_path(str(Path(__file__).resolve().parent / "cli" / "val_optimizer.py"), run_name="__main__")
