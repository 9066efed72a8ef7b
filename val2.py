"""Root entry point — thin forwarder to cli/val2.py (the reference exposes
val2.py at the repo root; the implementation lives in cli/val2.py)."""

import runpy
from pathlib import Path

if __name__ == "__main__":
    runpy.run_path(str(Path(__file__).resolve().parent / "cli" / "val2.py"), run_name="__main__")
