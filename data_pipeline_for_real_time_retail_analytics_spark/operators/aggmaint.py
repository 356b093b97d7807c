"""Incremental aggregate maintenance: roll a standing GROUP BY forward
from a changelog instead of rescanning the fact table.

The daily-mart shape at 100 TB: the fact table is petabytes, the daily
change set is gigabytes, and the summary tables (revenue by segment,
orders by priority, …) must advance to the new snapshot WITHOUT
re-aggregating history. Given yesterday's aggregate and a changelog
carrying both images of every changed row, the new aggregate is
``old ⊕ delta`` where delta is computed from the changelog alone:

* insert  → +1 row, +new values, into the NEW row's group;
* delete  → −1 row, −old values, from the OLD row's group;
* update  → both of the above — which handles group MOVES (an update
  that changes the grouping attribute subtracts from the old group and
  adds to the new one) with no special casing.

Groups whose maintained row count reaches zero are dropped, so the
result is exactly ``aggregate_snapshot(new)`` — an equality this
module's tests and the DuckDB oracle (plans/snapshotq.py) assert
literally. That equality only holds if the summed columns are EXACT
types: cast floating-point measures to DECIMAL before aggregating
(float addition is not associative, so ``old + delta`` and a full
recompute would drift in the last ulp; the same reason
plans/analytics.py casts TPC-H measures to DECIMAL(12,2)).

Scale shape: the changelog explodes into ≤ 2 contribution rows per
changed row (map-side), one partial-aggregated shuffle keyed by the
group columns — cost bounded by the CHANGE volume, never the fact
table; the merge with the old aggregate is a full-outer join on the
group key, bounded by the number of groups. Contrast with
``operators/transform.py`` merge-upsert, which maintains the ROW store;
this maintains the AGGREGATE layer above it.

Changelog contract: ``changelog_with_preimage`` emits
(keys…, op, old_<c>…, new_<c>…) — the CDC pre/post-image convention
(Debezium-style before/after) that ``operators/snapshot_diff.py``
deliberately omits from its compact apply-side changelog.

Reference parity: the reference declares its aggregation/mart layer as
dbt models rebuilt per run (config/pipelines/sample_pipeline.yaml:55-99
— staging/mart declarations, fact_orders materialized incremental with
a merge strategy; the dbt model SQL itself is empty scaffolding);
incremental maintenance is the beyond-reference scale path for the
same outputs.

NULL contract: group-KEY columns may be NULL (a NULL-valued group is
one group, handled by the null-safe merge), and summed MEASURE columns
may be NULL too. SUM-over-NULLs semantics cannot be rolled forward from
(old_sum, delta) alone — a delete removing the last non-null row needs
a per-group non-null count to know the sum reverts to NULL — so the
maintained aggregate carries one ``nn_<out>`` non-null contribution
count per measure: NULL measures contribute 0 to both the sum and the
count, and a group whose count reaches zero emits SQL's SUM-over-NULLs
answer, NULL (never 0). ``rolled == recomputed`` therefore holds for
all-NULL-measure groups as well, which the NULL-measure regression test
pins literally (tests/test_aggmaint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .snapshot_diff import OP_DELETE, OP_INSERT, OP_UPDATE, _row_hash

__all__ = [
    "changelog_with_preimage",
    "aggregate_snapshot",
    "apply_changelog_to_agg",
]


def changelog_with_preimage(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    null_safe_keys: bool = False,
) -> DataFrame:
    """(keys…, op, old_<c>…, new_<c>…) for every inserted, updated, or
    deleted row between the snapshots; unchanged rows are dropped.

    Same detection semantics as ``snapshot_diff`` (null-safe content
    hash over ``value_cols``), but both images are kept: the old-side
    payload is what aggregate maintenance must SUBTRACT, and a
    compact new-image-only changelog cannot express it. Absent sides
    are NULL (old_* on inserts, new_* on deletes).

    ``null_safe_keys`` carries the same contract and trade-off as
    ``snapshot_diff``: keys join with plain equality by default (the
    primary-key non-null contract — and plain equality is what lets a
    bucketed snapshot pair diff without a shuffle); a NULL-keyed row
    under the default surfaces as a delete+insert pair on every diff.
    Opt in for snapshots whose keys can genuinely be NULL.
    """
    if not key_cols:
        raise ValueError("changelog_with_preimage needs at least one key column")
    if not value_cols:
        raise ValueError("changelog_with_preimage needs at least one value column")
    o = old.withColumn("_o_present", F.lit(True)).alias("o")
    n = new.withColumn("_n_present", F.lit(True)).alias("n")
    cond = None
    for k in key_cols:
        lhs, rhs = F.col(f"o.{k}"), F.col(f"n.{k}")
        clause = lhs.eqNullSafe(rhs) if null_safe_keys else (lhs == rhs)
        cond = clause if cond is None else (cond & clause)
    joined = o.join(n, cond, "full_outer")
    op = (
        F.when(F.col("o._o_present").isNull(), F.lit(OP_INSERT))
        .when(F.col("n._n_present").isNull(), F.lit(OP_DELETE))
        .when(
            _row_hash(value_cols, "o") != _row_hash(value_cols, "n"),
            F.lit(OP_UPDATE),
        )
    )
    out = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in key_cols
    ]
    out.append(F.col("_op").alias("op"))
    for c in value_cols:
        out.append(F.col(f"o.{c}").alias(f"old_{c}"))
    for c in value_cols:
        out.append(F.col(f"n.{c}").alias(f"new_{c}"))
    return (
        joined.withColumn("_op", op)
        .where(F.col("_op").isNotNull())
        .select(*out)
    )


def aggregate_snapshot(
    snap: DataFrame,
    group_keys: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n_rows",
) -> DataFrame:
    """The maintained aggregate's canonical shape: (group_keys…,
    <out>=SUM(src), nn_<out>=COUNT(src)…, count_col=COUNT(*)). The
    ``nn_<out>`` non-null contribution counts are part of the shape on
    purpose: they are the extra state SUM maintenance needs to emit
    NULL (not 0) when a group's last non-null contribution is deleted
    (module-docstring NULL contract). Build the day-0 baseline with
    this, and verify maintenance by comparing against it on the new
    snapshot."""
    aggs: list[F.Column] = []
    for out, src in sum_cols.items():
        aggs.append(F.sum(F.col(src)).alias(out))
        aggs.append(F.count(F.col(src)).alias(f"nn_{out}"))
    aggs.append(F.count(F.lit(1)).alias(count_col))
    return snap.groupBy(*group_keys).agg(*aggs)


def apply_changelog_to_agg(
    old_agg: DataFrame,
    changelog: DataFrame,
    group_keys: list[str],
    sum_cols: dict[str, str],
    count_col: str = "n_rows",
) -> DataFrame:
    """Roll ``old_agg`` (shape of ``aggregate_snapshot``, including its
    ``nn_<out>`` non-null counts) forward by a
    ``changelog_with_preimage`` result. Group-key and summed columns are
    read from the changelog's old_/new_ images, so both must have been
    listed in the changelog's ``value_cols``. Groups whose row count
    reaches zero are dropped.

    Measure columns may be NULL (module-docstring contract): a NULL
    measure contributes 0 to the sum and 0 to its ``nn_<out>`` count,
    and a group whose maintained non-null count is zero emits NULL for
    that sum — exactly what ``aggregate_snapshot`` recomputes.

    Schema-break note (r9): the ``nn_<out>`` columns joined the
    maintained shape when the NULL-measure contract landed. A baseline
    persisted by the earlier shape cannot be rolled forward — rebuild
    it once with ``aggregate_snapshot`` on the current snapshot. The
    guard below turns the otherwise-cryptic unresolvable-column error
    into that instruction.
    """
    missing = [
        f"nn_{out}" for out in sum_cols if f"nn_{out}" not in old_agg.columns
    ]
    if missing:
        raise ValueError(
            "old_agg is missing non-null count column(s) "
            f"{missing}: it was built by a pre-nn_<out> "
            "aggregate_snapshot (the NULL-measure maintenance state "
            "added in r9). Rebuild the day-0 baseline with "
            "aggregate_snapshot() on the current snapshot, then roll "
            "changelogs forward from there."
        )
    def _img(prefix: str, sign: int) -> F.Column:
        return F.struct(
            *[F.col(f"{prefix}_{k}").alias(k) for k in group_keys],
            *[
                F.col(f"{prefix}_{src}").alias(out)
                for out, src in sum_cols.items()
            ],
            F.lit(sign).alias("_sign"),
        )

    # one contribution array per changelog row, exploded — a SINGLE scan
    # of the changelog (a where/union formulation reads it twice: the
    # changelog is usually a materialized CDC table, but when it is
    # derived inline the duplicated full-outer subtree doubles the cost)
    contribs = (
        F.when(F.col("op") == OP_INSERT, F.array(_img("new", 1)))
        .when(F.col("op") == OP_DELETE, F.array(_img("old", -1)))
        .otherwise(F.array(_img("old", -1), _img("new", 1)))
    )
    delta = (
        changelog.select(F.explode(contribs).alias("_c"))
        .select("_c.*")
        .groupBy(*group_keys)
        .agg(
            *[
                agg
                for out in sum_cols
                for agg in (
                    F.sum(
                        F.col("_sign") * F.coalesce(F.col(out), F.lit(0))
                    ).alias(f"_d_{out}"),
                    F.sum(
                        F.col("_sign")
                        * F.when(F.col(out).isNotNull(), 1).otherwise(0)
                    ).alias(f"_d_nn_{out}"),
                )
            ],
            F.sum(F.col("_sign")).alias("_d_n"),
        )
    )
    o = old_agg.alias("o")
    d = delta.alias("d")
    # the merge MUST be null-safe: grouping columns are attributes, not
    # keys, and a NULL-valued group is one group to groupBy (both in
    # the old aggregate and in the delta) — plain equality would split
    # it into two never-matching rows and break rolled == recomputed.
    # Unlike snapshot_diff's key join there is no bucketed-layout
    # argument against eqNullSafe here: both sides are group-grain
    # aggregates, orders of magnitude smaller than the snapshots.
    cond = None
    for k in group_keys:
        clause = F.col(f"o.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = clause if cond is None else (cond & clause)
    merged = o.join(d, cond, "full_outer")
    out_cols = [
        F.coalesce(F.col(f"d.{k}"), F.col(f"o.{k}")).alias(k)
        for k in group_keys
    ]
    for out in sum_cols:
        nn = F.coalesce(F.col(f"o.nn_{out}"), F.lit(0)) + F.coalesce(
            F.col(f"_d_nn_{out}"), F.lit(0)
        )
        out_cols.append(
            F.when(
                nn > 0,
                F.coalesce(F.col(f"o.{out}"), F.lit(0))
                + F.coalesce(F.col(f"_d_{out}"), F.lit(0)),
            ).alias(out)  # nn == 0 → NULL, SQL's SUM-over-NULLs answer
        )
        out_cols.append(nn.cast("long").alias(f"nn_{out}"))
    new_count = (
        F.coalesce(F.col(f"o.{count_col}"), F.lit(0))
        + F.coalesce(F.col("_d_n"), F.lit(0))
    )
    return (
        merged.select(*out_cols, new_count.alias(count_col))
        .where(F.col(count_col) > 0)
    )
