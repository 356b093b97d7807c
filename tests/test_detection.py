"""Tests for change-detection strategies and multi-source fan-out
(SURVEY.md §2.2 C3/C6-C9; mirrors reference test_change_detection.py
semantics: detect → watermark advance, polling gate, per-source health)."""

import datetime as dt

from data_pipeline_for_real_time_retail_analytics_spark.operators.cdc import (
    ChangeType,
    WatermarkStore,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.detection import (
    LogChangeDetector,
    MultiSourceChangeDetector,
    PollingChangeDetector,
    TimestampChangeDetector,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, v long")


def test_timestamp_detector_advances_watermark(spark, tmp_path):
    store = WatermarkStore(str(tmp_path))
    det = TimestampChangeDetector(store, ts_col="ts")
    df = _events(
        spark,
        [
            (dt.datetime(2024, 1, 1, 10, 0), 1),
            (dt.datetime(2024, 1, 1, 11, 0), 2),
        ],
    )
    events = det.detect("s1", "t1", df)
    assert len(events) == 1
    assert events[0].affected_rows == 2
    assert events[0].change_type is ChangeType.UPDATE
    assert store.get("s1", "t1") == dt.datetime(2024, 1, 1, 11, 0)
    # second pass: nothing strictly after the new watermark
    assert det.detect("s1", "t1", df) == []


def test_log_detector_groups_by_op(spark, tmp_path):
    store = WatermarkStore(str(tmp_path))
    det = LogChangeDetector(store)
    changelog = spark.createDataFrame(
        [
            ("I", dt.datetime(2024, 1, 1, 10, 0)),
            ("I", dt.datetime(2024, 1, 1, 10, 5)),
            ("D", dt.datetime(2024, 1, 1, 10, 2)),
        ],
        "operation string, change_timestamp timestamp",
    )
    events = det.detect("s1", "t1", changelog)
    by_type = {e.change_type: e for e in events}
    assert by_type[ChangeType.INSERT].affected_rows == 2
    assert by_type[ChangeType.DELETE].affected_rows == 1
    assert store.get("s1", "t1") == dt.datetime(2024, 1, 1, 10, 5)


def test_polling_detector_respects_interval():
    clock = {"t": 0.0}
    polls = {"n": 0}

    def poll(_since):
        polls["n"] += 1
        return 3

    det = PollingChangeDetector(poll, poll_interval=300, clock=lambda: clock["t"])
    assert len(det.detect("s1", "t1")) == 1  # first poll fires
    clock["t"] = 100.0
    assert det.detect("s1", "t1") == []  # gated: too soon
    clock["t"] = 301.0
    assert len(det.detect("s1", "t1")) == 1
    assert polls["n"] == 2


def test_polling_detector_empty_response_no_event():
    det = PollingChangeDetector(lambda _since: 0, poll_interval=0, clock=lambda: 0.0)
    assert det.detect("s1", "t1") == []


def test_multi_source_fanout_and_health(spark, tmp_path):
    store = WatermarkStore(str(tmp_path))
    ts_det = TimestampChangeDetector(store)
    df = _events(spark, [(dt.datetime(2024, 1, 1, 10, 0), 1)])

    multi = MultiSourceChangeDetector()
    multi.register_source("good", lambda: ts_det.detect("good", "t", df))

    def broken():
        raise ConnectionError("db down")

    multi.register_source("bad", broken)

    out = multi.detect_all_changes()
    assert len(out["good"]) == 1
    assert out["bad"] == []  # swallow-and-continue like the reference
    status = multi.get_source_status()
    assert status["good"]["healthy"] is True
    assert status["bad"]["healthy"] is False
    assert "db down" in status["bad"]["last_error"]
    assert multi.healthy() is False
