"""Time-window aggregations: tumbling, sliding, session.

The reference has no windowed aggregation at all — its only time
machinery is fixed polling intervals and a 60-minute dedup window
(SURVEY.md §2.10; reference: config/pipelines/sample_pipeline.yaml:30,48,
src/ingestion/change_detection.py:96). Windowed aggs are the natural
Spark-idiomatic extension and the batch twins of the streaming path in
streaming/ingest.py — `F.window` / `F.session_window` compile to plain
grouped aggregation: partial aggregates map-side, one shuffle on
(window, keys). A sliding window with slide = width/k duplicates each
row into exactly k windows *after* partial aggregation at the source
granularity would be cheaper, but Spark's built-in expansion is still a
single shuffle and AQE coalesces the tiny post-agg partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame, ts_col: str, width: str, aggs: list[Column], keys: list[str] = []
) -> DataFrame:
    w = F.window(F.col(ts_col), width)
    return df.groupBy(w.alias("w"), *keys).agg(*aggs).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *[c for c in _agg_names(aggs)],
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    width: str,
    slide: str,
    aggs: list[Column],
    keys: list[str] = [],
) -> DataFrame:
    """Overlapping windows of ``width`` every ``slide`` (epoch-aligned,
    matching Spark's default 1970-01-01 origin)."""
    w = F.window(F.col(ts_col), width, slide)
    return df.groupBy(w.alias("w"), *keys).agg(*aggs).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *keys,
        *[c for c in _agg_names(aggs)],
    )


def session_window_agg(
    df: DataFrame, ts_col: str, gap: str, aggs: list[Column], keys: list[str] = []
) -> DataFrame:
    """Sessionization: rows closer than ``gap`` merge into one session;
    session end = last event + gap (Spark `session_window` semantics —
    a new session starts when ts - prev_ts >= gap)."""
    w = F.session_window(F.col(ts_col), gap)
    return df.groupBy(w.alias("w"), *keys).agg(*aggs).select(
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *keys,
        *[c for c in _agg_names(aggs)],
    )


def _agg_names(aggs: list[Column]) -> list[str]:
    # Column metadata isn't exposed pre-analysis; require aliased aggs.
    names = []
    for c in aggs:
        jc = c._jc.toString()
        if " AS " not in jc:
            raise ValueError(f"aggregate must be aliased: {jc}")
        names.append(jc.rsplit(" AS ", 1)[1].strip("`"))
    return names
