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


def _select_windowed(
    agged: DataFrame, keys: list[str], start_name: str, end_name: str
) -> DataFrame:
    """Flatten the window struct and keep the analyzer-assigned aggregate
    column names. Names are read from the analyzed plan (``.columns``),
    not parsed out of ``Column._jc`` strings — the string form breaks
    under Spark Connect (no ``_jc``) and misparses expressions containing
    a literal ' AS '."""
    agg_names = agged.columns[1 + len(keys):]
    return agged.select(
        F.col("w.start").alias(start_name),
        F.col("w.end").alias(end_name),
        *keys,
        *agg_names,
    )


def tumbling_window_agg(
    df: DataFrame, ts_col: str, width: str, aggs: list[Column], keys: list[str] = []
) -> DataFrame:
    w = F.window(F.col(ts_col), width)
    agged = df.groupBy(w.alias("w"), *keys).agg(*aggs)
    return _select_windowed(agged, keys, "window_start", "window_end")


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
    agged = df.groupBy(w.alias("w"), *keys).agg(*aggs)
    return _select_windowed(agged, keys, "window_start", "window_end")


def session_window_agg(
    df: DataFrame, ts_col: str, gap: str, aggs: list[Column], keys: list[str] = []
) -> DataFrame:
    """Sessionization: rows closer than ``gap`` merge into one session;
    session end = last event + gap (Spark `session_window` semantics —
    a new session starts when ts - prev_ts >= gap)."""
    w = F.session_window(F.col(ts_col), gap)
    agged = df.groupBy(w.alias("w"), *keys).agg(*aggs)
    return _select_windowed(agged, keys, "session_start", "session_end")
