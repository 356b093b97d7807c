"""Count-min sketch — mergeable frequency estimation over arbitrary
value domains (Cormode & Muthukrishnan 2005, "An improved data stream
summary: the count-min sketch and its applications").

This completes the repo's sketch tier: KMV answers "how many distinct
values" (operators/kmv.py), HLL answers it re-aggregably at any grain
(quality.sketched_distinct_by_group), and the CMS answers "how often
does THIS value occur" from ``depth × width`` integer cells — fixed
state no matter how many distinct values the stream holds.

Why it matters at 100 TB: exact per-token counts over a web-scale
corpus shuffle the whole vocabulary; a CMS is a few KB per (source,
day, shard) that still answers point-frequency queries with a
one-sided error bound (estimate ≥ truth; overcount ≤ εN with
probability 1−δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉). And because the
sketch is LINEAR — cell(A ∪ B) = cell(A) + cell(B), exactly — per-
group sketches roll up to any coarser grain by cell-wise integer
addition without re-touching the data. ``merge_cms_cells`` is that
roll-up, and the staged ``cms_merged_heavy_tokens`` driver pair pins
merged == direct bit-for-bit (integer arithmetic makes the pin exact,
not approximate).

Determinism: the d row-hashes are md5-derived (the established
shuffled-shards/KMV idiom — first 8 hex chars of ``md5(value ':' row)``
as a BIGINT, mod width), so a DuckDB oracle reproduces every cell and
every estimate exactly.

Spark-first shape: hashing is map-side; the cell build partial-
aggregates its ONE shuffle down to ≤ depth·width rows per group; the
estimate is a broadcast join of candidates against the bounded cell
frame followed by a MIN over the depth rows. No driver data, no UDFs,
no iteration.

Reference parity: the reference has no sketch surface (its
transformation layer is dbt-declared scaffolding,
config/pipelines/sample_pipeline.yaml:55-99); this extends the
mandated beyond-reference curation suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cms_col_hash",
    "cms_cells",
    "merge_cms_cells",
    "cms_estimate",
]

#: defaults sized for the test corpora: width 512 against a few-thousand
#: token vocabulary keeps collisions (and therefore visible overcounts)
#: present but small; depth 3 ≈ δ = e^-3 ≈ 5%.
DEPTH = 3
WIDTH = 512


def cms_col_hash(value: Column, row: int, width: int = WIDTH) -> Column:
    """Column index of ``value`` in hash row ``row``: first 8 md5 hex
    chars of ``value || ':' || row`` as a BIGINT, mod width. DuckDB
    mirror (plans/cmsq.py ``_COL_HASH_SQL``):
    ``CAST(concat('0x', substr(md5(v || ':' || CAST(r AS VARCHAR)), 1,
    8)) AS BIGINT) % width``."""
    h = F.conv(
        F.substring(F.md5(F.concat(value, F.lit(f":{row}"))), 1, 8), 16, 10
    ).cast("long")
    return h % width


def cms_cells(
    counts: DataFrame,
    value_col: str,
    count_col: str,
    group_cols: list[str] | None = None,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Build per-group sketch cells (*group_cols, r, col, cell) from a
    per-value count frame.

    One pass over ``counts``: each value fans out to its ``depth``
    (row, col) targets through a single generator (no per-row scan
    union), and the cell sums partial-aggregate before the one shuffle,
    whose output is ≤ depth·width rows per group — the sketch's fixed
    state."""
    group_cols = group_cols or []
    targets = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    cms_col_hash(F.col(value_col), r, width).alias("col"),
                )
                for r in range(depth)
            ]
        )
    ).alias("__tgt")
    fanned = counts.select(*group_cols, F.col(count_col).alias("__c"), targets)
    return (
        fanned.select(*group_cols, "__tgt.r", "__tgt.col", "__c")
        .groupBy(*group_cols, "r", "col")
        .agg(F.sum("__c").cast("long").alias("cell"))
    )


def merge_cms_cells(cells: DataFrame, group_cols: list[str]) -> DataFrame:
    """Roll per-group sketches up to the global sketch by cell-wise
    integer addition — exact by linearity: every (r, col) target of a
    value is group-independent, so summing per-group cells reproduces
    the sketch of the union stream bit-for-bit."""
    return (
        cells.groupBy("r", "col")
        .agg(F.sum("cell").cast("long").alias("cell"))
    )


def cms_estimate(
    cells: DataFrame,
    candidates: DataFrame,
    value_col: str,
    depth: int = DEPTH,
    width: int = WIDTH,
) -> DataFrame:
    """Point-frequency estimates for ``candidates``: (*candidate cols,
    est_count) with est = MIN over the depth cells the value hashes to.

    The cell frame is sketch-bounded (≤ depth·width rows) and
    broadcast; candidates fan out depth ways map-side and aggregate
    straight back to one row per candidate. A candidate whose cell is
    absent genuinely has estimate 0 (nothing ever hashed there) —
    coalesced explicitly so the guarantee est ≥ truth holds for
    out-of-corpus probes too."""
    targets = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    cms_col_hash(F.col(value_col), r, width).alias("col"),
                )
                for r in range(depth)
            ]
        )
    ).alias("__tgt")
    other_cols = [c for c in candidates.columns]
    fanned = candidates.select(*other_cols, targets).select(
        *other_cols, "__tgt.r", "__tgt.col"
    )
    joined = fanned.join(F.broadcast(cells), ["r", "col"], "left")
    return (
        joined.groupBy(*other_cols)
        .agg(
            F.min(F.coalesce(F.col("cell"), F.lit(0)))
            .cast("long")
            .alias("est_count")
        )
    )
