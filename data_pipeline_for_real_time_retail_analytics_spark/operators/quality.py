"""Data-quality assertions and integrity checks (SURVEY.md §2.5-2.6).

Implements the *declared* semantics of the reference's validation
operators — rowcount / freshness / custom-SQL assertions
(reference: src/orchestration/operators.py:222-333, stubbed there),
dbt-style unique / not_null / relationships tests
(reference: config/pipelines/sample_pipeline.yaml:60-98, never runnable
there), and the extraction sanity checks
(reference: src/ingestion/extractors.py:218-287).

Spark-first choices: FK integrity is a left-anti join (broadcast when the
parent is a dim); duplicate detection is count-minus-distinct or a
groupBy-having, both single-shuffle; whole-row duplicate detection hashes
the row struct instead of comparing full rows.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class AssertionResult:
    name: str
    passed: bool
    observed: Any
    expected: Any


# ---------------------------------------------------------------------------
# integrity joins (J1 / K9)
# ---------------------------------------------------------------------------


def fk_orphans(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Rows of ``child`` whose key has no match in ``parent`` — the dbt
    ``relationships`` test (reference: sample_pipeline.yaml:73-75) as a
    left-anti join. Integrity holds iff the result is empty.

    ``broadcast_parent=True`` is right when the parent is a dimension
    (customer vs orders); for fact-fact FK checks pass False and let AQE
    pick sort-merge."""
    parent_keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    if broadcast_parent:
        parent_keys = F.broadcast(parent_keys)
    return child.join(parent_keys, on=child_key, how="left_anti")


# ---------------------------------------------------------------------------
# duplicate / null diagnostics (K3-K8)
# ---------------------------------------------------------------------------


def duplicate_key_counts(df: DataFrame, *key_cols: str) -> DataFrame:
    """Keys occurring more than once, with their counts — the dbt
    ``unique`` test surface (reference: sample_pipeline.yaml:60-72).
    groupBy-having: one shuffle on the key."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )


def whole_row_duplicates(df: DataFrame) -> DataFrame:
    """K5: whole-row duplicate count (reference:
    src/ingestion/extractors.py:241-244, ``df.duplicated().sum()``).
    count − distinct(struct(*)) in one aggregate; at 100 TB switch the
    distinct to ``approx_count_distinct(xxhash64(struct(*)))``."""
    return df.agg(
        (
            F.count(F.lit(1))
            - F.count_distinct(F.struct(*[F.col(c) for c in df.columns]))
        ).alias("duplicate_rows")
    )


def grouped_quantiles(
    df: DataFrame,
    value_col: str,
    keys: list[str],
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    extra_aggs: dict[str, Any] | None = None,
) -> DataFrame:
    """Exact linearly-interpolated quantiles of ``value_col`` per group —
    the distribution-profiling extension of the reference's
    describe()-style numeric profile (src/ingestion/extractors.py:
    252-262, mean/std/min/max only). One column per prob, named ``q25``
    style; ``extra_aggs`` appends further aggregate expressions.

    ``F.percentile`` is the exact sort-based aggregate (matches DuckDB's
    ``quantile_cont`` bit-for-bit — both NIST linear interpolation): one
    shuffle on the group keys with per-group state proportional to the
    group's distinct values. All probs are computed by ONE array-typed
    percentile aggregate, so the per-group value buffer is built and
    sorted once, not once per prob (measured 2.5× at sf0.1), then split
    into scalar columns. At 100 TB with huge groups, swap in
    ``approx_percentile`` (t-digest, bounded state, partial-agg) — same
    call shape; this operator stays exact because profile assertions
    compare against exact oracle numbers.
    """
    aggs = [
        F.percentile(
            F.col(value_col), F.array(*[F.lit(p) for p in probs])
        ).alias("__qs")
    ]
    for name, expr in (extra_aggs or {}).items():
        aggs.append(expr.alias(name))
    out = df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
    return out.select(
        *keys,
        *[
            F.get("__qs", i).alias(f"q{int(p * 100)}")
            for i, p in enumerate(probs)
        ],
        *[name for name in (extra_aggs or {})],
    )


def approx_profile(
    df: DataFrame,
    numeric_cols: list[str],
    rsd: float = 0.05,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    accuracy: int = 10_000,
) -> DataFrame:
    """Sketch-based profile — the 100 TB twin of the exact profiles:
    HyperLogLog++ distinct counts (``approx_count_distinct``, relative
    error ``rsd``) and t-digest quantiles (``approx_percentile``) per
    column, all in ONE partial-aggregated pass with BOUNDED per-column
    state (KB of sketch, independent of row count), where the exact
    versions hold every distinct value in memory. No oracle entry by
    design: sketch estimates are engine-specific; accuracy is pinned by
    tolerance tests against the exact operators instead
    (test_curation.py)."""
    aggs: list[Column] = []
    for c in numeric_cols:
        aggs.append(F.approx_count_distinct(c, rsd).alias(f"{c}_approx_distinct"))
        aggs.append(
            F.percentile_approx(
                F.col(c), F.array(*[F.lit(p) for p in probs]), F.lit(accuracy)
            ).alias(f"{c}_approx_qs")
        )
    return df.agg(*aggs)


def sketched_distinct_by_group(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Mergeable-sketch pattern: one HLL *sketch* (not estimate) per
    group via ``hll_sketch_agg``, plus a grand-total row that UNIONS the
    group sketches (``hll_union_agg``) instead of rescanning the data —
    how a 100 TB pipeline keeps per-day/per-shard sketches and rolls
    them up to any coarser grain for free. Returns
    ``(group, approx_distinct, is_total)``."""
    sketches = df.groupBy(group_col).agg(
        F.hll_sketch_agg(F.col(value_col)).alias("__sk")
    )
    per_group = sketches.select(
        F.col(group_col),
        F.hll_sketch_estimate("__sk").alias("approx_distinct"),
        F.lit(0).alias("is_total"),
    )
    total = sketches.agg(F.hll_union_agg("__sk").alias("__sk")).select(
        F.lit(None).cast(df.schema[group_col].dataType).alias(group_col),
        F.hll_sketch_estimate("__sk").alias("approx_distinct"),
        F.lit(1).alias("is_total"),
    )
    return per_group.unionByName(total)


def all_null_row_count(df: DataFrame) -> DataFrame:
    """K6: rows where every column is NULL
    (reference: src/ingestion/extractors.py:236-239)."""
    cond = F.lit(True)
    for c in df.columns:
        cond = cond & F.col(c).isNull()
    return df.agg(F.count(F.when(cond, 1)).alias("all_null_rows"))


def infinite_value_counts(df: DataFrame) -> DataFrame:
    """K7: ±inf count per floating-point column
    (reference: src/ingestion/extractors.py:261-265)."""
    exprs = []
    for f_ in df.schema.fields:
        if isinstance(f_.dataType, (T.FloatType, T.DoubleType)):
            c = F.col(f_.name)
            exprs.append(
                F.count(
                    F.when(
                        (c == float("inf")) | (c == float("-inf")), 1
                    )
                ).alias(f"inf__{f_.name}")
            )
    if not exprs:
        exprs = [F.lit(0).alias("inf__none")]
    return df.agg(*exprs)


def null_saturation(df: DataFrame, threshold: float = 0.95) -> list[str]:
    """K8: columns whose null ratio exceeds ``threshold``
    (reference: src/ingestion/extractors.py:272-277). Single pass."""
    n = F.count(F.lit(1))
    row = df.agg(
        *[
            F.try_divide(F.count(F.when(F.col(c).isNull(), 1)), n).alias(c)
            for c in df.columns
        ]
    ).first()
    return [c for c in df.columns if (row[c] or 0.0) > threshold]


# ---------------------------------------------------------------------------
# assertions (A8-A10) — implement the DECLARED semantics, not the stubs
# (reference stubs: src/orchestration/operators.py:303-333)
# ---------------------------------------------------------------------------


def rowcount_assertion(df: DataFrame, min_rows: int, name: str = "rowcount") -> AssertionResult:
    observed = df.count()
    return AssertionResult(name, observed >= min_rows, observed, f">= {min_rows}")


def freshness_assertion(
    df: DataFrame,
    ts_col: str,
    max_age_hours: float,
    as_of: datetime | str | None = None,
    name: str = "freshness",
) -> AssertionResult:
    """max(ts) must be within ``max_age_hours`` of ``as_of`` (default now).
    (reference: sample_pipeline.yaml:106,119 — declared, stubbed.)"""
    anchor = F.lit(as_of).cast("timestamp") if as_of else F.current_timestamp()
    # Normalize both sides to TIMESTAMP before the epoch-seconds cast:
    # TIMESTAMP_NTZ (the type parquet nanos read back as) rejects a direct
    # cast to DOUBLE, but NTZ->TIMESTAMP->DOUBLE is legal and keeps the
    # same wall-clock instant under the session's UTC timezone.
    ts_norm = F.col(ts_col).cast("timestamp")
    row = df.agg(
        F.max(ts_norm).alias("max_ts"),
        (
            (anchor.cast("double") - F.max(ts_norm).cast("double")) / 3600.0
        ).alias("age_hours"),
    ).first()
    age = row["age_hours"]
    passed = age is not None and age <= max_age_hours
    return AssertionResult(name, passed, age, f"<= {max_age_hours}h")


def custom_sql_assertion(
    spark: SparkSession,
    sql: str,
    expected: Any = 0,
    name: str = "custom_sql",
) -> AssertionResult:
    """A10: run a scalar SQL check and compare the first cell
    (reference: src/orchestration/operators.py:325-333; example checks in
    sample_pipeline.yaml:107-127)."""
    row = spark.sql(sql).first()
    observed = row[0] if row is not None else None
    return AssertionResult(name, observed == expected, observed, expected)
