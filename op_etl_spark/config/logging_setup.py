"""Config-driven logging for the pipeline runner.

Mirrors the reference's logging surface (reference etl/logging_config.py:
11-85; wired in run.py:259-260): a `logging:` config section with `level`,
`console_level`, `format`, `summary_file`, `debug_file`,
`max_file_size_mb`, `backup_count`. Semantics preserved, implementation
Spark-era: the summary file carries the configured level, the debug file
always carries DEBUG, rotation kicks in when a size is configured, and
re-running setup never duplicates handlers. Spark's own JVM log4j output
is untouched — this governs the Python driver/pipeline loggers only.
"""

from __future__ import annotations

import logging
import logging.handlers
import os
from typing import Any, Mapping

DEFAULT_FORMAT = "%(asctime)s - %(levelname)s - [%(name)s] %(message)s"

_LEVELS = {
    "CRITICAL": logging.CRITICAL,
    "ERROR": logging.ERROR,
    "WARNING": logging.WARNING,
    "INFO": logging.INFO,
    "DEBUG": logging.DEBUG,
}


def _level(value: Any, default: int = logging.INFO) -> int:
    if isinstance(value, int):
        return value
    return _LEVELS.get(str(value).upper(), default)


def _file_handler(path: str, max_mb: float, backups: int) -> logging.Handler:
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    if max_mb and max_mb > 0:
        return logging.handlers.RotatingFileHandler(
            path,
            maxBytes=int(max_mb * 1024 * 1024),
            backupCount=backups,
            encoding="utf-8",
        )
    return logging.FileHandler(path, encoding="utf-8")


def setup_logging(cfg: Mapping[str, Any] | None) -> None:
    """Idempotent root-logger configuration from the config's `logging`
    section. Safe to call with None/{} (console INFO only)."""
    cfg = dict(cfg or {})
    level = _level(cfg.get("level", "INFO"))
    console_level = _level(cfg.get("console_level", level), default=level)
    fmt = logging.Formatter(cfg.get("format", DEFAULT_FORMAT))
    summary_file = cfg.get("summary_file")
    debug_file = cfg.get("debug_file")
    max_mb = cfg.get("max_file_size_mb", 0) or 0
    backups = int(cfg.get("backup_count", 5))

    root = logging.getLogger()
    # the root must pass every record any handler wants to see
    wanted = [console_level, level] + ([logging.DEBUG] if debug_file else [])
    root.setLevel(min(wanted))
    for old in list(root.handlers):
        root.removeHandler(old)
        try:
            old.close()
        except Exception:
            pass

    console = logging.StreamHandler()
    console.setLevel(console_level)
    console.setFormatter(fmt)
    root.addHandler(console)

    if summary_file:
        fh = _file_handler(str(summary_file), max_mb, backups)
        fh.setLevel(level)
        fh.setFormatter(fmt)
        root.addHandler(fh)
    if debug_file:
        dh = _file_handler(str(debug_file), max_mb, backups)
        dh.setLevel(logging.DEBUG)
        dh.setFormatter(fmt)
        root.addHandler(dh)
