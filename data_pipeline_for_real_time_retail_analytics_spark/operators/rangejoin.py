"""Batch interval (range) join via bin bucketing — the equi-join plan
for ``l.ts <= r.ts <= l.ts + gap`` predicates Spark would otherwise
execute as a broadcast-nested-loop (or refuse outright once neither
side broadcasts).

Beyond-reference scope (the reference has no join operators at all;
SURVEY.md §2.7): this is the batch twin of the streaming stream-stream
interval join (streaming/ingest.interval_join) and the ALL-matches
complement of the single-match as-of join (operators/asof.py, whose
docstring promises exactly this operator for the range case).

Shape: with bin width W equal to the window length (microseconds, so
all arithmetic is exact integers — ``unix_micros`` ↔ DuckDB
``epoch_us``), every right row lands in exactly one bin and every left
row's window [t, t+W] spans exactly the two bins floor(t/W) and
floor(t/W)+1. Exploding the left side into those two bins turns the
range predicate into an equi-join on (keys…, bin) followed by an exact
bound filter:

* no cartesian, no nested loop — one hash/sort-merge exchange keyed on
  (keys…, bin), the join both engines' optimizers handle at any scale;
* candidate volume is Σ per-(key, bin) |L|·|R| — bounded by temporal
  co-occurrence density, which is also a lower bound on the answer's
  own size for windows near W (the candidates ARE near-matches);
* each (left, right) pair is produced at most once (the right row's
  bin is unique), so no distinct pass is needed;
* a hot key stays bounded by its own bin occupancy: the skew lever is
  the bin width, exactly like the block key in operators/fuzzy.py.

This is the manual form of the bin-bucketed range-join optimization
production SQL engines apply (Databricks ``RANGE_JOIN`` hint); vanilla
Spark has no native equivalent, which is why it lives here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_L_US = "__rj_l_us"
_R_US = "__rj_r_us"
_BIN = "__rj_bin"


def _epoch_us(df: DataFrame, ts_col: str) -> Column:
    """Exact integer microseconds since epoch for TIMESTAMP and
    TIMESTAMP_NTZ alike. NTZ goes through ``timestampdiff`` against an
    NTZ epoch anchor — session-timezone-independent, unlike a cast to
    TIMESTAMP (the operators/asof.py discipline); DuckDB's
    ``epoch_us`` on its naive timestamps mirrors both bit-for-bit."""
    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        return F.expr(
            "timestampdiff(MICROSECOND, "
            f"TIMESTAMP_NTZ'1970-01-01 00:00:00', {ts_col})"
        ).cast("long")
    return F.unix_micros(F.col(ts_col))


def interval_join_binned(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    max_gap_seconds: float,
    gap_col: str | None = None,
) -> DataFrame:
    """All (left, right) row pairs with equal ``key_cols`` and
    ``left.left_ts <= right.right_ts <= left.left_ts + max_gap_seconds``
    (inclusive bounds on both ends, exact microsecond arithmetic).

    Column contract: the two frames' non-key column sets must be
    disjoint (pre-select/alias on the caller's side); ``key_cols``
    appear once in the output. ``gap_col`` optionally adds the exact
    ``right_ts - left_ts`` gap in microseconds (BIGINT).

    Rows with a NULL key or NULL timestamp on either side never match
    (equi-join / comparison semantics — identical in DuckDB).
    """
    w_us = int(round(max_gap_seconds * 1_000_000))
    # guard the DERIVED width, not just the input: a sub-microsecond gap
    # rounds to w_us = 0, and pmod(ts, 0)/div 0 yield NULL bins — every
    # row would silently drop instead of erroring
    if w_us <= 0:
        raise ValueError(
            f"max_gap_seconds must be at least 1 microsecond: {max_gap_seconds}"
        )
    overlap = (set(left.columns) & set(right.columns)) - set(key_cols)
    if overlap:
        raise ValueError(
            "left/right non-key columns must be disjoint; rename these on "
            f"one side first: {sorted(overlap)}"
        )
    reserved = {_L_US, _R_US, _BIN} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(f"reserved working names present: {sorted(reserved)}")
    if gap_col is not None and gap_col in (
        set(left.columns) | set(right.columns)
    ):
        # same silent-overwrite class as the reserved working names —
        # withColumn would clobber the caller's column
        raise ValueError(
            f"gap_col {gap_col!r} already exists on an input; pick a fresh name"
        )

    # floor division in pure integer ops (never a double division — an
    # epoch value above 2^53 µs would round): subtract the positive
    # remainder, then the truncating `div` is exact for any sign
    def _floor_div(name: str) -> str:
        return f"(({name} - pmod({name}, {w_us})) div {w_us})"

    l = (
        left.withColumn(_L_US, _epoch_us(left, left_ts))
        .where(F.col(_L_US).isNotNull())
        .withColumn(
            _BIN,
            F.explode(
                F.expr(
                    f"array({_floor_div(_L_US)}, {_floor_div(_L_US)} + 1L)"
                )
            ),
        )
    )
    r = (
        right.withColumn(_R_US, _epoch_us(right, right_ts))
        .where(F.col(_R_US).isNotNull())
        .withColumn(_BIN, F.expr(_floor_div(_R_US)))
    )
    out = (
        l.join(r, [*key_cols, _BIN])
        .where(
            (F.col(_R_US) >= F.col(_L_US))
            & (F.col(_R_US) <= F.col(_L_US) + F.lit(w_us))
        )
    )
    if gap_col is not None:
        out = out.withColumn(gap_col, (F.col(_R_US) - F.col(_L_US)).cast("long"))
    return out.drop(_L_US, _R_US, _BIN)
