"""Root entry point — thin forwarder to cli/decompose_model.py (the reference exposes
decompose_model.py at the repo root; the implementation lives in cli/decompose_model.py)."""

import runpy
from pathlib import Path

if __name__ == "__main__":
    runpy.run_path(str(Path(__file__).resolve().parent / "cli" / "decompose_model.py"), run_name="__main__")
