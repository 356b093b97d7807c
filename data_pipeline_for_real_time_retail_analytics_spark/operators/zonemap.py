"""Zone maps — file-level min/max statistics and the data-skipping scan
that uses them (SURVEY.md §2 beyond-reference scale lever; the
reference's storage layer is an empty stub, src/storage/__init__.py).

The third layout lever next to range-clustering (sources/sink.py
``load_clustered``) and runtime Bloom pruning (operators/maintenance).
A Bloom filter skips by KEY MEMBERSHIP; a zone map skips by RANGE: for
each data file record min/max of the clustered columns, and a query
with a range predicate reads only the files whose [min, max] interval
overlaps it. This is exactly what Delta Lake / Iceberg keep in their
metadata layers and what parquet footers provide per row-group —
materializing it as a first-class table makes the skipping decision
inspectable, cheap (metadata-sized, no footer round-trips on a 100k
file table), and composable with any predicate the planner can bound.

Scale shape: the zone-map table has ONE ROW PER FILE — at 100 TB with
1 GB files that is ~100k rows, a driver/metadata-sized frame by
construction. Pruning therefore runs as a metadata operation (the same
class as Delta's log replay): evaluate the interval overlap on the
zone-map rows and hand the surviving file list to the reader. The
``collect()`` inside ``prune_files`` is the deliberate, bounded
exception to the no-driver-collect rule (like the CDC probe,
operators/detection.py:82) — it collects file NAMES, never data, and
its size is the file count of the table.

Correctness contract: pruning + residual filter ≡ full-scan filter for
any conjunctive range predicate — a file whose zone interval misses
the predicate interval can hold no matching row, because min/max
bound every non-NULL value in the file and NULL never satisfies a
range predicate. The DuckDB oracle checks the equivalence; the
actually-skipped-files effect is pinned in tests/test_zonemapq.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["build_file_zonemaps", "prune_files", "zonemap_scan"]

#: zone-map schema prefix for a column c: zmin_c / zmax_c


def _bound(v) -> Column:
    """Accept plain literals or ready-made Columns (e.g. to_timestamp)
    as predicate bounds."""
    return v if isinstance(v, Column) else F.lit(v)


def build_file_zonemaps(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """One row per parquet file under ``path``: (file, n_rows,
    zmin_<c>, zmax_<c> for each of ``cols``). min/max ignore NULLs
    (SQL aggregate semantics) — an all-NULL file gets NULL bounds and
    is prunable by every range predicate, which is sound because NULL
    never satisfies one."""
    df = spark.read.parquet(path)
    return (
        df.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[F.min(c).alias(f"zmin_{c}") for c in cols],
            *[F.max(c).alias(f"zmax_{c}") for c in cols],
        )
    )


def prune_files(
    zonemaps: DataFrame, predicates: dict[str, tuple]
) -> tuple[list[str], int]:
    """(surviving file list, total file count) for a conjunction of
    inclusive range predicates {col: (lo, hi)}. A file survives iff
    every predicate's interval overlaps its zone: zmax_c >= lo AND
    zmin_c <= hi. Metadata-sized collect (see module docstring)."""
    cond = F.lit(True)
    for c, (lo, hi) in predicates.items():
        cond = cond & (F.col(f"zmax_{c}") >= _bound(lo)) & (
            F.col(f"zmin_{c}") <= _bound(hi)
        )
    rows = zonemaps.select("file", cond.alias("keep")).collect()
    return [r.file for r in rows if r.keep], len(rows)


def zonemap_scan(
    spark: SparkSession,
    zonemaps: DataFrame,
    predicates: dict[str, tuple],
) -> tuple[DataFrame, int, int]:
    """Data-skipping scan: read ONLY the files whose zones overlap
    every predicate, then apply the residual row-level filter. Returns
    (result, n_files_read, n_files_total); an empty surviving list
    yields an empty DataFrame of the right schema via the pruned-out
    read of all files limited to zero rows."""
    files, total = prune_files(zonemaps, predicates)
    if files:
        df = spark.read.parquet(*files)
    else:
        # schema-preserving empty relation: plan one file's schema
        any_file = zonemaps.select("file").limit(1).collect()
        df = spark.read.parquet(any_file[0].file).limit(0) if any_file else None
        if df is None:
            raise ValueError("zonemap_scan: empty zone-map table")
    cond = F.lit(True)
    for c, (lo, hi) in predicates.items():
        cond = cond & F.col(c).between(_bound(lo), _bound(hi))
    return df.where(cond), len(files), total
