"""logging_setup parity contract (reference src/logger.py:16-71):
file + console handlers, directory auto-creation, idempotent
configuration, level plumbed from config, package-child propagation."""

from __future__ import annotations

import logging

from local_etl_csv_to_postgresql_spark.logging_setup import (
    LoggingConfig,
    setup_logger,
)


def _fresh(name):
    lg = logging.getLogger(name)
    for h in list(lg.handlers):
        lg.removeHandler(h)
    return lg


def test_creates_dir_writes_file_and_console(tmp_path, capsys):
    name = "lst.basic"
    _fresh(name)
    cfg = LoggingConfig(log_dir=str(tmp_path / "logs"), level="INFO")
    lg = setup_logger(name, cfg)
    lg.info("hello from the pipeline")
    for h in lg.handlers:
        h.flush()
    logfile = tmp_path / "logs" / "etl_pipeline.log"
    assert logfile.exists()
    text = logfile.read_text()
    assert "hello from the pipeline" in text
    assert "INFO" in text and "lst.basic" in text  # reference format
    assert "hello from the pipeline" in capsys.readouterr().out


def test_idempotent_no_duplicate_handlers(tmp_path):
    name = "lst.idem"
    _fresh(name)
    cfg = LoggingConfig(log_dir=str(tmp_path))
    a = setup_logger(name, cfg)
    b = setup_logger(name, cfg)
    assert a is b
    assert len(a.handlers) == 2  # file + console, once


def test_level_filtering_and_debug_config(tmp_path):
    name = "lst.level"
    _fresh(name)
    lg = setup_logger(
        name, LoggingConfig(log_dir=str(tmp_path), level="WARNING", console=False)
    )
    lg.info("invisible")
    lg.warning("visible")
    for h in lg.handlers:
        h.flush()
    text = (tmp_path / "etl_pipeline.log").read_text()
    assert "invisible" not in text and "visible" in text


def test_package_children_propagate_into_root_handlers(tmp_path):
    root = "lst.pkg"
    _fresh(root)
    setup_logger(root, LoggingConfig(log_dir=str(tmp_path), console=False))
    child = logging.getLogger(f"{root}.pipeline")
    child.info("from a module logger")
    for h in logging.getLogger(root).handlers:
        h.flush()
    assert "from a module logger" in (tmp_path / "etl_pipeline.log").read_text()
