"""Root entry point — thin forwarder to cli/distillation.py (the reference exposes
distillation.py at the repo root; the implementation lives in cli/distillation.py)."""

import runpy
from pathlib import Path

if __name__ == "__main__":
    runpy.run_path(str(Path(__file__).resolve().parent / "cli" / "distillation.py"), run_name="__main__")
