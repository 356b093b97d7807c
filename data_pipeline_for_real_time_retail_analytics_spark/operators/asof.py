"""Backward as-of join — a temporal operator Spark lacks natively.

Beyond-reference scope (the reference has no join operators at all;
SURVEY.md §2.7). Implemented as the *merge* formulation: tag both
sides, union them, and carry the latest right-side payload forward with
a running ``last(..., ignorenulls)`` window — one shuffle on the join
keys, no range-explosion crossJoin, no per-key collect. This is the
formulation that scales: at 100 TB both sides hash-partition on the key
and each partition is a single ordered sweep; contrast a range-join
(`l.ts BETWEEN r.ts AND r.ts + delta`) which Spark executes as a
broadcast-nested-loop unless one side is tiny.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"
_RTS = "__asof_rts"


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    right_value_cols: list[str],
    allow_exact_matches: bool = True,
    tolerance_seconds: float | None = None,
    matched_ts_col: str | None = None,
) -> DataFrame:
    """For every left row, attach ``right_value_cols`` from the most
    recent right row with the same keys and ``right.ts <= left.ts``
    (``<`` when ``allow_exact_matches=False``). Left rows with no prior
    right row get NULLs (left-outer semantics, like pandas ``merge_asof``
    / DuckDB ``ASOF LEFT JOIN``).

    ``tolerance_seconds`` (pandas ``merge_asof(tolerance=...)``): a
    match older than the bound is discarded (NULL payload). The compare
    is exact integer microsecond arithmetic (``unix_micros``), never a
    float timestamp difference — DuckDB's ``epoch_us`` mirrors it
    bit-for-bit. ``matched_ts_col`` additionally surfaces the matched
    right row's timestamp under that name (NULL when no match
    survives), so callers can report the gap.

    The right payload travels as ONE struct so all carried columns come
    from the same matched row even if some of its fields are NULL.

    Column contract (guarded loudly, the rangejoin.py discipline):
    ``right_value_cols`` and ``matched_ts_col`` must not collide with
    the left frame's columns, with each other, or repeat within
    ``right_value_cols`` (withColumn would silently clobber them),
    and the working names (``__asof_side``/``__asof_payload``/
    ``__asof_rts``) are reserved on both inputs.
    """
    reserved = {_SIDE, _PAYLOAD, _RTS} & (
        set(left.columns) | set(right.columns) | set(right_value_cols)
    )
    if reserved:
        raise ValueError(f"reserved working names present: {sorted(reserved)}")
    clobber = (set(right_value_cols) | ({matched_ts_col} - {None})) & set(
        left.columns
    )
    if clobber:
        raise ValueError(
            "right_value_cols/matched_ts_col would overwrite left columns; "
            f"rename these first: {sorted(clobber)}"
        )
    # ... and not with each other: the value-col unpack loop runs after
    # matched_ts_col is written, so an overlap (or a duplicate value
    # col) would silently overwrite the matched-timestamp column — the
    # same silent-clobber class the guard above exists for.
    if matched_ts_col is not None and matched_ts_col in right_value_cols:
        raise ValueError(
            f"matched_ts_col {matched_ts_col!r} also listed in "
            "right_value_cols; give the matched timestamp its own name"
        )
    if len(set(right_value_cols)) != len(right_value_cols):
        dupes = sorted(
            c for c in set(right_value_cols) if right_value_cols.count(c) > 1
        )
        raise ValueError(f"duplicate right_value_cols: {dupes}")
    payload = F.struct(
        F.col(ts_col).alias(_RTS),
        *[F.col(c) for c in right_value_cols],
    )
    r = right.select(
        *key_cols,
        F.col(ts_col),
        payload.alias(_PAYLOAD),
        F.lit(0).alias(_SIDE),
    )
    left_extra = [c for c in left.columns if c not in set(key_cols) | {ts_col}]
    l = left.select(
        *key_cols,
        F.col(ts_col),
        *left_extra,
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        F.lit(1).alias(_SIDE),
    )
    for c in left_extra:
        r = r.withColumn(c, F.lit(None).cast(l.schema[c].dataType))

    u = l.unionByName(r.select(*l.columns))
    # At equal ts the right row must sort first iff exact matches count.
    side_order: Column = F.col(_SIDE) if allow_exact_matches else -F.col(_SIDE)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(F.col(_PAYLOAD), ignorenulls=True).over(w)
    out = (
        u.withColumn(_PAYLOAD, carried)
        .where(F.col(_SIDE) == 1)
        .drop(_SIDE)
    )
    if tolerance_seconds is not None:
        # timestamp subtraction yields an exact day-time interval
        # (microsecond integer under the hood) and works for both
        # TIMESTAMP and TIMESTAMP_NTZ columns with no session-timezone
        # dependence — unlike unix_* conversions
        in_tol = (
            F.col(ts_col) - F.col(_PAYLOAD)[_RTS]
        ) <= F.make_dt_interval(secs=F.lit(float(tolerance_seconds)))
        out = out.withColumn(_PAYLOAD, F.when(in_tol, F.col(_PAYLOAD)))
    if matched_ts_col is not None:
        out = out.withColumn(matched_ts_col, F.col(_PAYLOAD)[_RTS])
    for c in right_value_cols:
        out = out.withColumn(c, F.col(_PAYLOAD)[c])
    return out.drop(_PAYLOAD)
