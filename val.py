"""Root entry point — thin forwarder to cli/val.py (the reference exposes
val.py at the repo root; the implementation lives in cli/val.py)."""

import runpy
from pathlib import Path

if __name__ == "__main__":
    runpy.run_path(str(Path(__file__).resolve().parent / "cli" / "val.py"), run_name="__main__")
