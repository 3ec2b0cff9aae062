"""Logging setup (reference: glog/absl logging init in main.cc:46-91).

Module code uses ``log = get_logger(__name__)`` and standard severity
methods; applications call ``setup_logging`` once (the CLI does). Default
is WARNING to keep library use quiet, like the reference's glog defaults.
"""

from __future__ import annotations

import logging
import sys


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(name)


def setup_logging(level: str = "INFO", log_file: str | None = None) -> None:
    """Install handlers on the package root logger."""
    root = logging.getLogger("gnss_sdr_tpu")
    root.setLevel(getattr(logging, level.upper(), logging.INFO))
    fmt = logging.Formatter(
        "%(asctime)s.%(msecs)03d %(levelname).1s %(name)s] %(message)s",
        datefmt="%H:%M:%S",
    )
    handler: logging.Handler
    if log_file:
        handler = logging.FileHandler(log_file)
    else:
        handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(fmt)
    root.handlers.clear()
    root.addHandler(handler)
