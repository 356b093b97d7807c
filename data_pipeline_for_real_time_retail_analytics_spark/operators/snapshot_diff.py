"""Snapshot diff — batch CDC between two table versions.

The reference detects changes by probing live sources (timestamp / log /
polling detectors, src/ingestion/change_detection.py); this operator is
the batch-side complement a warehouse needs when no change stream
exists: given yesterday's snapshot and today's, synthesize the
insert/update/delete changelog. The output rows feed the existing
downstream machinery unchanged — ``cdc_apply_changes`` /
``scd2_history`` consume (key, op, payload) exactly as a live CDC feed
would (operators/transform.py).

Design for 100 TB:

* One FULL OUTER join on the primary key decides membership
  (insert = right-only, delete = left-only); a single null-safe
  xxhash64 over the compared columns decides update-vs-unchanged —
  no per-column comparison fan-out in the join condition, so the
  join stays a pure key equi-join and the change test is a cheap
  projection on the joined row.
* Unchanged rows — the overwhelming majority of a daily diff — are
  filtered OUT before anything downstream shuffles again.
* Both sides shuffle once on the key. When the snapshots are stored
  bucketed on the key (sources/sink.py::load_bucketed), the join is
  shuffle-free: Spark reads both sides pre-partitioned and zips
  buckets (pinned in tests/test_snapshot_diff.py).
* xxhash64 is the engine-side 64-bit hash (JVM, codegen-friendly).
  A hash collision would mask an update (~2^-64 per row-pair);
  ``compare_cols=None`` derives the compared set as all non-key
  columns so schema drift can't silently exclude a column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: op codes, aligned with the log-CDC probe's I/U/D lexicon
#: (operators/cdc.py::log_cdc_probe maps the same three ops)
OP_INSERT = "insert"
OP_UPDATE = "update"
OP_DELETE = "delete"


def _row_hash(
    cols: list[str],
    side: str | None,
    renderers: dict[str, F.Column] | None = None,
) -> F.Column:
    """Null-safe 64-bit content hash of ``cols`` (on ``side`` when the
    columns live behind a join alias; ``side=None`` for bare columns).

    Each value is cast to string and null-tagged (NULL and 'NULL' must
    hash differently), then the column NAME is interleaved so that
    (a=1, b=NULL) and (a=NULL, b=1) cannot collide by concatenation.
    ``renderers`` overrides the string rendering per column name —
    ``maintenance.table_checksum`` uses it for timezone-stable
    timestamp rendering. The ONE definition of this discipline: the
    diff's update detection and the table checksum both call it.
    """
    renderers = renderers or {}
    parts: list[F.Column] = []
    for c in cols:
        v = F.col(f"{side}.{c}") if side is not None else F.col(c)
        rendered = renderers.get(c, v.cast("string"))
        parts.append(F.lit(c))
        parts.append(
            F.when(v.isNull(), F.lit("\x00null")).otherwise(
                F.concat(F.lit("\x01"), rendered)
            )
        )
    return F.xxhash64(*parts)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    null_safe_keys: bool = False,
) -> DataFrame:
    """(key_cols..., op, then NEW-side payload columns — old payload for
    deletes) for every row that was inserted, updated, or deleted
    between ``old`` and ``new``. Unchanged rows are dropped.

    ``compare_cols=None`` compares every non-key column present in BOTH
    snapshots (schema evolution: a column only one side has cannot be
    compared; additions surface through the rows they change).

    ``null_safe_keys``: keys join with plain equality by default — the
    primary-key contract (non-null) — because Catalyst rewrites
    null-safe equality keys into coalesce-wrapped expressions that no
    longer match a bucketed table's output partitioning, forcing the
    full-corpus re-shuffle this operator exists to avoid (measured: the
    shuffle-free plan pin fails under eqNullSafe). Opt in only for
    snapshots whose keys can genuinely be NULL; such rows otherwise
    surface as delete+insert pairs on every diff.
    """
    if not key_cols:
        raise ValueError("snapshot_diff needs at least one key column")
    if compare_cols is None:
        compare_cols = [
            c for c in new.columns if c not in key_cols and c in old.columns
        ]
    missing = [c for c in compare_cols if c not in old.columns or c not in new.columns]
    if missing:
        raise ValueError(f"compare columns absent from a snapshot: {missing}")

    # presence flags must not rely on a nullable key column: tag each
    # side with a literal before the join
    o = old.withColumn("_o_present", F.lit(True)).alias("o")
    n = new.withColumn("_n_present", F.lit(True)).alias("n")
    cond = None
    for k in key_cols:
        lhs, rhs = F.col(f"o.{k}"), F.col(f"n.{k}")
        clause = lhs.eqNullSafe(rhs) if null_safe_keys else (lhs == rhs)
        cond = clause if cond is None else (cond & clause)

    joined = o.join(n, cond, "full_outer")
    op = F.when(F.col("o._o_present").isNull(), F.lit(OP_INSERT)).when(
        F.col("n._n_present").isNull(), F.lit(OP_DELETE)
    )
    if compare_cols:
        op = op.when(
            _row_hash(compare_cols, "o") != _row_hash(compare_cols, "n"),
            F.lit(OP_UPDATE),
        )
    # no compare columns (key-only snapshots): a matched key is by
    # definition unchanged — membership-only diff, inserts/deletes only
    op = op.otherwise(F.lit(None))
    payload_side = F.when(F.col("n._n_present").isNull(), F.lit("o")).otherwise(
        F.lit("n")
    )
    out_cols: list[F.Column] = []
    for k in key_cols:
        out_cols.append(
            F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k)
        )
    out_cols.append(F.col("_op").alias("op"))
    for c in compare_cols:
        out_cols.append(
            F.when(payload_side == "o", F.col(f"o.{c}"))
            .otherwise(F.col(f"n.{c}"))
            .alias(c)
        )
    return (
        joined.withColumn("_op", op)
        .where(F.col("_op").isNotNull())
        .select(*out_cols)
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """(op, n_rows) rollup of a snapshot_diff result — the one-line
    health check a daily diff job logs before applying the changelog."""
    return diff.groupBy("op").agg(F.count(F.lit(1)).alias("n_rows"))
