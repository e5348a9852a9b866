"""Centralized logging setup — parity with the reference's logger
module (reference ``src/logger.py:16-71``: file + console handlers,
directory auto-creation, duplicate-handler guard, consistent format).

Differences, deliberately: the file handler rotates (a long-running
Spark driver would otherwise grow one unbounded file — the reference's
single-shot CLI never hits that), and configuration is an injectable
dataclass instead of module-level constants so tests and embedded
callers don't fight over global state.
"""

from __future__ import annotations

import logging
import sys
from dataclasses import dataclass
from logging.handlers import RotatingFileHandler
from pathlib import Path

__all__ = ["LoggingConfig", "setup_logger"]

LOG_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
LOG_DATE_FORMAT = "%Y-%m-%d %H:%M:%S"


@dataclass(frozen=True)
class LoggingConfig:
    log_dir: str = "logs"
    filename: str = "etl_pipeline.log"
    level: str = "INFO"
    fmt: str = LOG_FORMAT
    datefmt: str = LOG_DATE_FORMAT
    max_bytes: int = 10 * 1024 * 1024
    backup_count: int = 3
    console: bool = True


def setup_logger(
    name: str, config: LoggingConfig | None = None
) -> logging.Logger:
    """Get-or-configure a logger writing to a rotating file and stdout.

    Idempotent per logger name: a logger that already has handlers is
    returned untouched (reference ``src/logger.py:40-41``), so module-
    level ``setup_logger(__name__)`` calls never stack duplicates.
    """
    cfg = config or LoggingConfig()
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger

    level = getattr(logging, cfg.level.upper(), logging.INFO)
    logger.setLevel(level)
    formatter = logging.Formatter(fmt=cfg.fmt, datefmt=cfg.datefmt)

    log_dir = Path(cfg.log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    file_handler = RotatingFileHandler(
        log_dir / cfg.filename,
        maxBytes=cfg.max_bytes,
        backupCount=cfg.backup_count,
        encoding="utf-8",
    )
    file_handler.setLevel(level)
    file_handler.setFormatter(formatter)
    logger.addHandler(file_handler)

    if cfg.console:
        console = logging.StreamHandler(sys.stdout)
        console.setLevel(level)
        console.setFormatter(formatter)
        logger.addHandler(console)

    # keep engine messages out of the root logger (Spark configures it)
    logger.propagate = False
    return logger
