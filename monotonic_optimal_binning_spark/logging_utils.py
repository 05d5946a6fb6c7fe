"""Progress / verbosity utilities.

Mirrors the reference's observability surface
(/root/reference/src/MOBPY/logging_utils.py:12-113: ``get_logger``,
``set_verbosity``, ``BinningProgressLogger``) for users migrating from it.
Driver-side only — executors never log through this (Spark's own log4j
handles the JVM side); handlers write to stderr so stdout stays clean for
job output (e.g. bench JSON lines).
"""

from __future__ import annotations

import logging
import sys
import time
from typing import Optional

_ROOT = "mob_spark"


def get_logger(name: str = _ROOT, level: Optional[int] = None) -> logging.Logger:
    """Package logger with a one-time stderr handler (no duplicates)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(
            logging.Formatter(
                "%(asctime)s %(name)s %(levelname)s %(message)s",
                datefmt="%Y-%m-%d %H:%M:%S",
            )
        )
        logger.addHandler(handler)
    if level is not None:
        logger.setLevel(level)
    elif logger.level == logging.NOTSET:
        # default quiet; never clobber a level someone already set
        logger.setLevel(logging.WARNING)
    return logger


def set_verbosity(level: str) -> None:
    """Set the level for every logger under the package root.

    Accepts 'DEBUG' | 'INFO' | 'WARNING' | 'ERROR' | 'CRITICAL'.
    """
    numeric = getattr(logging, level.upper(), None)
    if not isinstance(numeric, int):
        raise ValueError(f"Invalid log level: {level}")
    get_logger().setLevel(numeric)
    for name in list(logging.Logger.manager.loggerDict):
        if name.startswith(_ROOT):
            logging.getLogger(name).setLevel(numeric)


class BinningProgressLogger:
    """Context manager logging stage start/finish/failure with step counts
    and wall time (reference logging_utils.py:77-113 analog).

    >>> with BinningProgressLogger("fit") as progress:
    ...     progress.update("collected sufficient statistics")
    ...     progress.update("solved PAVA + merge")
    """

    def __init__(self, stage: str, logger: Optional[logging.Logger] = None):
        self.stage = stage
        self.logger = logger or get_logger(f"{_ROOT}.progress")
        self.steps_completed = 0
        self._t0: Optional[float] = None

    def __enter__(self) -> "BinningProgressLogger":
        self._t0 = time.time()
        self.logger.info("starting %s", self.stage)
        return self

    def __exit__(self, exc_type, exc_val, exc_tb) -> bool:
        elapsed = time.time() - (self._t0 or time.time())
        if exc_type is None:
            self.logger.info(
                "completed %s (%d steps, %.3fs)",
                self.stage,
                self.steps_completed,
                elapsed,
            )
        else:
            self.logger.error("failed in %s: %s", self.stage, exc_val)
        return False  # never swallow exceptions

    def update(self, message: str) -> None:
        self.steps_completed += 1
        self.logger.debug("[%s] %s", self.stage, message)
