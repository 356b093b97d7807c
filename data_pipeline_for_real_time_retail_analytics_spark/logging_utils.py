"""Structured JSON logging with bound context.

Mirrors the reference's logging surface (reference: tests/unit/
test_logging.py:16-113 — JSON log shape, contextual fields carried on
every record). Driver-side only: executor-side logging goes through
Spark's log4j; this module is for the control plane (orchestrator, CDC
probes, validation reports).
"""

from __future__ import annotations

import json
import logging
import sys
from datetime import datetime, timezone
from typing import Any


class JsonFormatter(logging.Formatter):
    """One JSON object per line: timestamp, level, logger, message, plus
    any ``extra={"context": {...}}`` fields flattened in."""

    def format(self, record: logging.LogRecord) -> str:
        payload: dict[str, Any] = {
            "timestamp": datetime.fromtimestamp(
                record.created, tz=timezone.utc
            ).isoformat(),
            "level": record.levelname,
            "logger": record.name,
            "message": record.getMessage(),
        }
        context = getattr(record, "context", None)
        if context:
            payload.update(context)
        if record.exc_info and record.exc_info[0] is not None:
            payload["exception"] = self.formatException(record.exc_info)
        return json.dumps(payload, default=str)


class ContextLogger(logging.LoggerAdapter):
    """Logger with bound key-value context attached to every record
    (e.g. source_id, table, pipeline). ``bind`` returns a child adapter
    with merged context."""

    def process(self, msg: str, kwargs: dict[str, Any]):
        extra = kwargs.get("extra") or {}
        merged = {**self.extra, **extra.get("context", {})}
        kwargs["extra"] = {"context": merged}
        return msg, kwargs

    def bind(self, **context: Any) -> "ContextLogger":
        return ContextLogger(self.logger, {**self.extra, **context})


def get_logger(
    name: str, level: int = logging.INFO, stream: Any = None, **context: Any
) -> ContextLogger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(stream or sys.stderr)
        handler.setFormatter(JsonFormatter())
        logger.addHandler(handler)
        logger.setLevel(level)
        logger.propagate = False
    return ContextLogger(logger, context)
