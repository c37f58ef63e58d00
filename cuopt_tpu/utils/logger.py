"""Logging, mirroring the reference rapids_logger usage.

Reference: cpp/include/cuopt/logger.hpp (CUOPT_LOG_* macros, per-solve log
files + console toggles in every settings object).

Provides a package logger plus a helper to attach a per-solve file sink and
console toggle, like pdlp solver_settings.hpp:200-202 (log_file / log_to_console).
"""

from __future__ import annotations

import logging
import os
import sys
from contextlib import contextmanager

LOGGER_NAME = "cuopt_tpu"

_LEVELS = {
    "trace": logging.DEBUG,
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warn": logging.WARNING,
    "warning": logging.WARNING,
    "error": logging.ERROR,
    "critical": logging.CRITICAL,
    "off": logging.CRITICAL + 10,
}


def get_logger() -> logging.Logger:
    logger = logging.getLogger(LOGGER_NAME)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(handler)
        level = os.environ.get("CUOPT_LOG_LEVEL", "info").lower()
        logger.setLevel(_LEVELS.get(level, logging.INFO))
        # CUOPT_DEBUG_LOG_FILE parity (reference utilities/logger_helper.cpp:26)
        debug_file = os.environ.get("CUOPT_DEBUG_LOG_FILE")
        if debug_file:
            fh = logging.FileHandler(debug_file)
            fh.setFormatter(
                logging.Formatter("%(asctime)s %(levelname)s %(message)s")
            )
            logger.addHandler(fh)
    return logger


@contextmanager
def solve_log_context(log_file: str | None = None, log_to_console: bool = True):
    """Per-solve logging: optional file sink, optional console muting."""
    logger = get_logger()
    file_handler = None
    muted_handlers: list[logging.Handler] = []
    if log_file:
        file_handler = logging.FileHandler(log_file)
        file_handler.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(file_handler)
    if not log_to_console:
        for h in list(logger.handlers):
            if isinstance(h, logging.StreamHandler) and not isinstance(
                h, logging.FileHandler
            ):
                muted_handlers.append(h)
                logger.removeHandler(h)
    try:
        yield logger
    finally:
        if file_handler is not None:
            logger.removeHandler(file_handler)
            file_handler.close()
        for h in muted_handlers:
            logger.addHandler(h)
