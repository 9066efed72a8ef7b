"""ANSI-colored, rank-gated logging (parity: scripts/utils/logger.py:19-118).

On multi-host TPU pods, only process 0 logs at INFO; other hosts are gated to
WARNING — the analogue of the reference's RANK in {-1, 0} gating.
"""

from __future__ import annotations

import logging
import os
import sys
from typing import Any

_COLORS = {
    "black": "\033[30m",
    "red": "\033[31m",
    "green": "\033[32m",
    "yellow": "\033[33m",
    "blue": "\033[34m",
    "magenta": "\033[35m",
    "cyan": "\033[36m",
    "white": "\033[37m",
    "bright_black": "\033[90m",
    "bright_red": "\033[91m",
    "bright_green": "\033[92m",
    "bright_yellow": "\033[93m",
    "bright_blue": "\033[94m",
    "bright_magenta": "\033[95m",
    "bright_cyan": "\033[96m",
    "bright_white": "\033[97m",
    "bold": "\033[1m",
    "underline": "\033[4m",
    "end": "\033[0m",
}


def colorstr(*inputs: Any) -> str:
    """colorstr('blue', 'bold', 'hello') -> ANSI-wrapped string."""
    *args, string = inputs if len(inputs) > 1 else ("blue", "bold", inputs[0])
    return "".join(_COLORS[x] for x in args) + str(string) + _COLORS["end"]


def _process_index() -> int:
    """Best-effort process index without forcing JAX backend init."""
    for key in ("JAX_PROCESS_INDEX", "RANK"):
        if key in os.environ:
            try:
                return int(os.environ[key])
            except ValueError:
                pass
    return 0


def get_logger(name: str, log_level: int = logging.INFO) -> logging.Logger:
    """Create a logger whose level is gated to WARNING off the lead host."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter(
                colorstr("bright_black", "%(asctime)s ") + "%(levelname)s %(name)s: %(message)s",
                datefmt="%H:%M:%S",
            )
        )
        logger.addHandler(handler)
        logger.propagate = False
    logger.setLevel(log_level if _process_index() in (-1, 0) else logging.WARNING)
    return logger
