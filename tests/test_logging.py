"""JSON logging tests (reference semantics: tests/unit/test_logging.py —
record shape, bound context, exception capture)."""

import io
import json
import logging
import uuid

from data_pipeline_for_real_time_retail_analytics_spark.logging_utils import get_logger


def _fresh_logger(stream, **ctx):
    return get_logger(f"t_{uuid.uuid4().hex[:8]}", stream=stream, **ctx)


def test_json_record_shape():
    buf = io.StringIO()
    log = _fresh_logger(buf)
    log.info("hello %s", "world")
    rec = json.loads(buf.getvalue())
    assert rec["message"] == "hello world"
    assert rec["level"] == "INFO"
    assert "timestamp" in rec and rec["timestamp"].endswith("+00:00")


def test_bound_context_carries():
    buf = io.StringIO()
    log = _fresh_logger(buf, source_id="db1").bind(table="orders")
    log.warning("late rows", extra={"context": {"n": 3}})
    rec = json.loads(buf.getvalue())
    assert (rec["source_id"], rec["table"], rec["n"]) == ("db1", "orders", 3)
    assert rec["level"] == "WARNING"


def test_exception_captured():
    buf = io.StringIO()
    log = _fresh_logger(buf)
    try:
        raise ValueError("boom")
    except ValueError:
        log.error("failed", exc_info=True)
    rec = json.loads(buf.getvalue())
    assert "ValueError: boom" in rec["exception"]


def test_levels_filtered():
    buf = io.StringIO()
    log = _fresh_logger(buf)
    log.logger.setLevel(logging.WARNING)
    log.info("dropped")
    assert buf.getvalue() == ""
