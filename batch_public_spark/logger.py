"""Rotating-file logging (reference logger.py:13-15: 10 MB × 5 backups,
console echo, configure-once-per-logger).

The logs directory is ``$BPS_LOG_DIR`` or ``./logs`` — NOT next to the
package like the reference (a site-packages install must never write into
itself). Spark's own JVM logging (log4j2) is separate by design; this
covers the driver-side orchestration path (submit/poll/download, ledger,
CLI), which is exactly where the reference logs.
"""

from __future__ import annotations

import logging
import os
from logging.handlers import RotatingFileHandler

LOG_FILE_NAME = "batch.log"

_FMT = "%(asctime)s [%(levelname)s] %(name)s: %(message)s"


def _logs_dir() -> str:
    return os.environ.get("BPS_LOG_DIR", os.path.join(os.getcwd(), "logs"))


def _build_handler(logs_dir: str) -> RotatingFileHandler:
    """Rotating file handler — 10 MB × 5 (reference logger.py:13-15)."""
    handler = RotatingFileHandler(
        os.path.join(logs_dir, LOG_FILE_NAME),
        maxBytes=10 * 1024 * 1024,
        backupCount=5,
        encoding="utf-8",
    )
    handler.setFormatter(logging.Formatter(_FMT))
    return handler


def get_logger(name: str) -> logging.Logger:
    """Module logger with a rotating file handler + console echo.

    Idempotent per logger name: a logger that already has handlers is
    returned untouched (reference logger.py: "never add duplicate
    handlers"). ``propagate=False`` keeps records out of any root logger
    configured elsewhere (e.g. pytest's caplog root handler)."""
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger

    logger.setLevel(logging.INFO)

    logs_dir = _logs_dir()
    os.makedirs(logs_dir, exist_ok=True)
    logger.addHandler(_build_handler(logs_dir))

    console = logging.StreamHandler()
    console.setFormatter(logging.Formatter(_FMT))
    logger.addHandler(console)

    logger.propagate = False
    return logger
