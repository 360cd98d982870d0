"""Structured logging.

The reference logs by bare ``print`` (SURVEY §5: "Metrics / logging:
prints only"); this provides leveled, optionally-JSON structured logging for
the pipeline and servers without changing the default console output.

Env:
  AICG_LOG_LEVEL  debug|info|warning|error   (default info)
  AICG_LOG_JSON   1 -> one JSON object per line (machine-ingestable)
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any


class _JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        entry = {
            "ts": round(time.time(), 3),
            "level": record.levelname.lower(),
            "logger": record.name,
            "msg": record.getMessage(),
        }
        extra = getattr(record, "aicg", None)
        if extra:
            entry.update(extra)
        return json.dumps(entry)


_configured = False


def get_logger(name: str = "aicovergen") -> logging.Logger:
    global _configured
    logger = logging.getLogger(name)
    if not _configured:
        root = logging.getLogger("aicovergen")
        root.setLevel(os.environ.get("AICG_LOG_LEVEL", "info").upper())
        handler = logging.StreamHandler(sys.stderr)
        if os.environ.get("AICG_LOG_JSON", "0") == "1":
            handler.setFormatter(_JsonFormatter())
        else:
            handler.setFormatter(
                logging.Formatter("%(asctime)s %(levelname).1s %(name)s: %(message)s",
                                  datefmt="%H:%M:%S")
            )
        root.addHandler(handler)
        root.propagate = False
        _configured = True
    return logger


def log_event(logger: logging.Logger, msg: str, /, level: int = logging.INFO, **fields: Any):
    """Structured event: fields ride along in JSON mode, appended in text."""
    if fields and os.environ.get("AICG_LOG_JSON", "0") != "1":
        msg = f"{msg}  {json.dumps(fields, default=str)}"
    logger.log(level, msg, extra={"aicg": fields})
