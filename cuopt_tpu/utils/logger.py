"""Logging, mirroring the reference rapids_logger usage.

Reference: cpp/include/cuopt/logger.hpp (CUOPT_LOG_* macros, per-solve log
files + console toggles in every settings object).

Provides a package logger plus a helper to attach a per-solve file sink and
console toggle, like pdlp solver_settings.hpp:200-202 (log_file /
log_to_console).
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

_MUTED = logging.CRITICAL + 10


def get_logger() -> logging.Logger:
    logger = logging.getLogger(LOGGER_NAME)
    if not getattr(logger, "_cuopt_initialized", False):
        logger._cuopt_initialized = True
        logger.propagate = False  # root may have its own handlers (jax)
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(logging.Formatter("%(message)s"))
        handler._cuopt_console = True
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
    """Per-solve logging: optional file sink, optional console muting.

    Muting raises the console handler's level (never removes handlers, so
    nested solves and concurrent get_logger() calls stay consistent)."""
    logger = get_logger()
    file_handler = None
    saved_levels: list[tuple[logging.Handler, int]] = []
    if log_file:
        file_handler = logging.FileHandler(log_file)
        file_handler.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(file_handler)
    if not log_to_console:
        for h in logger.handlers:
            if getattr(h, "_cuopt_console", False):
                saved_levels.append((h, h.level))
                h.setLevel(_MUTED)
    try:
        yield logger
    finally:
        if file_handler is not None:
            logger.removeHandler(file_handler)
            file_handler.close()
        for h, lvl in saved_levels:
            h.setLevel(lvl)
