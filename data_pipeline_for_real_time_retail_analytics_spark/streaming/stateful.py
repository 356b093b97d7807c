"""Custom stateful streaming operators via ``applyInPandasWithState``.

Two operators the built-in state machinery can't express directly:

1. **TTL-suppression dedup** — the reference's ``ChangeEventDeduplicator``
   (src/ingestion/change_detection.py:93-134): the FIRST event per key is
   emitted and opens a suppression window; every later event with the
   same key inside ``ttl`` is dropped; after the window expires the next
   event is emitted again and re-opens it. This is *not*
   ``dropDuplicatesWithinWatermark`` (whose per-key state lives exactly
   one watermark delay); the reference's window restarts from the last
   *emitted* event, which needs explicit state.
2. **Running per-key totals** — monotonically increasing lifetime
   aggregates (count / sum) per key emitted every micro-batch, the
   streaming form of a slowly-updated dimension stat.

State is one tiny tuple per key in the state store (RocksDB/HDFS-backed
per shuffle partition at scale); expired keys are garbage-collected with
event-time timeouts — the Spark-native version of the reference's lazy
``_cleanup_expired_keys`` sweep (change_detection.py:119-134).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_EPOCH_US = "last_emit_us"


def ttl_dedup_stream(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    ttl_minutes: float = 60.0,
    watermark_delay: str = "60 minutes",
) -> DataFrame:
    """Emit the first event per key, suppress same-key events within
    ``ttl_minutes`` of the last *emitted* one (reference semantics:
    change_detection.py:100-117). Output schema == input schema.
    """
    out_schema = df.schema
    state_schema = T.StructType([T.StructField(_EPOCH_US, T.LongType())])
    ttl_us = int(ttl_minutes * 60 * 1_000_000)
    ts_field = ts_col
    cols = df.columns

    def _dedup(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # GC: suppression window long expired
            return
        last_us = state.get[0] if state.exists else None
        out = []
        batch = pd.concat(list(pdfs)).sort_values(ts_field, kind="stable")
        for _, row in batch.iterrows():
            ts_us = int(pd.Timestamp(row[ts_field]).value // 1_000)
            if last_us is None or ts_us - last_us >= ttl_us:
                out.append(row)
                last_us = ts_us
        if last_us is not None:
            state.update((last_us,))
            # drop the key's state once its window can no longer matter
            state.setTimeoutTimestamp((last_us + ttl_us) // 1_000)
        if out:
            yield pd.DataFrame(out)[cols]

    return (
        df.withWatermark(ts_col, watermark_delay)
        .groupBy(*key_cols)
        .applyInPandasWithState(
            _dedup,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def running_totals_stream(
    df: DataFrame,
    key_cols: list[str],
    value_col: str = "value",
    ts_col: str = "ts",
    watermark_delay: str = "60 minutes",
) -> DataFrame:
    """Per-key lifetime (count, sum) updated every micro-batch — custom
    state because built-in streaming aggregation cannot emit a running
    total per batch in append mode without window bounds."""
    out_schema = T.StructType(
        [
            *[df.schema[c] for c in key_cols],
            T.StructField("lifetime_events", T.LongType()),
            T.StructField("lifetime_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )

    def _totals(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame([[*key, n, round(total, 2)]], columns=[*key_cols, "lifetime_events", "lifetime_value"])

    return (
        df.withWatermark(ts_col, watermark_delay)
        .groupBy(*key_cols)
        .applyInPandasWithState(
            _totals,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API)
# ---------------------------------------------------------------------------


def lifetime_totals_tws(
    df: DataFrame,
    key_cols: list[str],
    value_col: str = "value",
    state_ttl_minutes: float | None = None,
) -> DataFrame:
    """Per-key lifetime (count, sum) via ``transformWithStateInPandas`` —
    the Spark-4 successor to ``applyInPandasWithState`` with NAMED,
    individually-TTL'd state variables instead of one opaque tuple.
    Functionally the twin of ``running_totals_stream``; kept alongside
    it so both stateful APIs stay exercised. Differences that matter at
    scale: state variables are typed and queryable by name (the state
    data source can read them offline), per-variable TTL replaces
    hand-rolled timeout bookkeeping, and the operator REQUIRES the
    RocksDB state-store provider (the scale-grade store; the default
    HDFS-backed provider keeps every key on-heap).

    ``state_ttl_minutes`` drops a key's totals after that long without
    updates (processing-time TTL) — bounded state for unbounded key
    spaces.

    ENVIRONMENT GATE: the transformWithState Python worker speaks a
    protobuf protocol to the JVM state server; without the
    ``protobuf`` package the worker crashes opaquely at query start
    ("driver worker exited unexpectedly"), so this raises an
    actionable error up front. This build container has no protobuf
    and forbids installation — the operator is plumbing-complete and
    the test suite skips it with that reason
    (tests/test_stateful.py::test_lifetime_totals_transformwithstate);
    ``running_totals_stream`` is the executable twin.
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise EnvironmentError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(its Python worker speaks protobuf to the JVM state "
            "server); install protobuf or use running_totals_stream, "
            "the applyInPandasWithState twin"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = T.StructType(
        [
            *[df.schema[c] for c in key_cols],
            T.StructField("lifetime_events", T.LongType()),
            T.StructField("lifetime_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    if state_ttl_minutes is not None and state_ttl_minutes <= 0:
        raise ValueError("state_ttl_minutes must be positive when given")
    ttl_ms = (
        int(state_ttl_minutes * 60_000) if state_ttl_minutes is not None else None
    )

    class _TotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", state_schema, ttl_ms)

        def handleInputRows(self, key, rows, timerValues):
            prev = self._totals.get()
            n, total = prev if prev is not None else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                [[*key, n, round(total, 2)]],
                columns=[*key_cols, "lifetime_events", "lifetime_value"],
            )

        def close(self) -> None:
            pass

    # state TTL is only legal under processing-time semantics — Spark
    # raises STATEFUL_PROCESSOR_INCORRECT_TIME_MODE_TO_ASSIGN_TTL if a
    # TTL'd state variable is created in TimeMode.None
    return df.groupBy(*key_cols).transformWithStateInPandas(
        statefulProcessor=_TotalsProcessor(),
        outputStructType=out_schema,
        outputMode="update",
        timeMode="processingTime" if ttl_ms is not None else "None",
    )
