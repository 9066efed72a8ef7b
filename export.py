"""Root entry point — thin forwarder to cli/export.py (the reference exposes
export.py at the repo root; the implementation lives in cli/export.py)."""

import runpy
from pathlib import Path

if __name__ == "__main__":
    runpy.run_path(str(Path(__file__).resolve().parent / "cli" / "export.py"), run_name="__main__")
