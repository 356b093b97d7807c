"""Table-maintenance operators: small-file compaction (OPTIMIZE) and
runtime Bloom-filter join pruning (SURVEY.md §2 beyond-reference scale
levers; the reference's storage layer is an empty stub —
src/storage/__init__.py — so both are net-new surface).

At 100 TB the two dominant maintenance costs are (a) the small-file
problem — streaming/incremental writers leave thousands of KB-sized
parquet files whose per-file open/footer overhead dwarfs the scan — and
(b) shuffle-join probes that scan the full big table to match a
selective key set. ``compact_parquet`` is the OPTIMIZE pass for (a):
rewrite a directory into ``target_files`` range-clustered, sorted files
so parquet footer min/max stats prune reads. ``runtime_bloom_filters``
is the lever for (b): Spark's InjectRuntimeFilter builds a Bloom filter
from the selective (creation) side and applies it as a semi-join
pre-filter on the big (application) side scan, cutting shuffle input to
near the match volume. The conf thresholds exist because on production
table sizes the defaults (10 GB application-side scan) trigger on their
own; the context manager lowers them so the behavior is testable at
local SF, and restores every touched key on exit so nothing leaks into
other queries' plans.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

#: conf keys the bloom context manager touches (restored on exit)
_BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # allow a generously-sized creation side at local SF
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # production default is 10GB — the filter only pays for itself on a
    # big probe scan; 0 here makes the injection observable at test SF
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # the filter targets SHUFFLE joins (a broadcast probe already skips
    # the scan-side shuffle); at test SF everything broadcasts, so pin
    # the shuffle-join shape the 100 TB plan would have
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


@contextmanager
def runtime_bloom_filters(spark: SparkSession) -> Iterator[None]:
    """Scope within which Catalyst injects runtime Bloom filters into
    selective shuffle joins (``might_contain(...)`` on the probe scan).
    Every conf is restored on exit — executions must happen INSIDE the
    scope (a lazy DataFrame executed after exit plans normally; the
    result is identical either way, only the plan differs)."""
    conf = spark.conf
    prev = {k: conf.get(k, None) for k in _BLOOM_CONFS}
    try:
        for k, v in _BLOOM_CONFS.items():
            conf.set(k, v)
        yield
    finally:
        for k, v in prev.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    cluster_cols: list[str],
    target_files: int = 4,
    mode: str = "overwrite",
) -> DataFrame:
    """OPTIMIZE pass: rewrite ``src_path`` into ``target_files``
    range-clustered files at ``dest_path`` and return the compacted
    relation. ``repartitionByRange`` gives each output file a DISJOINT
    range of ``cluster_cols`` (one sampling pass + one range shuffle),
    ``sortWithinPartitions`` orders rows inside it, so parquet records
    tight per-file/per-row-group min/max stats and post-compaction
    scans filtered on the cluster columns skip every non-matching file.
    Row content is invariant — compaction is pure layout (the
    DuckDB-checked contract of q_compacted_corpus)."""
    from ..sources.sink import WarehouseSink

    # Delegate the layout write to the ONE range-cluster implementation
    # (sources/sink.py::load_clustered) — compaction is that same
    # contract applied to an existing directory, and keeping a second
    # copy of the repartitionByRange+sortWithinPartitions sequence here
    # would let a future fix to one silently miss the other.
    df = spark.read.parquet(src_path)
    result = WarehouseSink(spark).load_clustered(
        df, dest_path, cluster_cols, n_files=target_files, mode=mode
    )
    if not result.success:
        raise RuntimeError(f"compaction write failed: {result.error}")
    return spark.read.parquet(dest_path)


def table_checksum(
    df: DataFrame,
    cols: list[str] | None = None,
) -> DataFrame:
    """(n_rows, checksum) — an order- and layout-independent content
    fingerprint of a relation: BIT_XOR over a null-safe xxhash64 of
    every row's ``cols`` (default: all columns, sorted by name so two
    column orders of the same data agree).

    The verification half of every maintenance rewrite: after
    ``compact_parquet``, a bucketed re-layout, an engine migration, or
    a replica copy, equal (n_rows, checksum) proves the MULTISET of
    rows survived — without a global sort or a shuffle beyond one
    single-row aggregate. XOR alone would miss duplicated-even-times
    rows; pairing it with the exact row count closes the common
    failure (a dropped + a doubled row changes the count).

    Hashing is DELEGATED to ``snapshot_diff._row_hash`` (one
    definition of the null-tagged, name-interleaved discipline), with
    one override: TIMESTAMP columns render as ``unix_micros`` instead
    of a string cast, because the string form depends on the session
    timezone and the whole point here is comparing checksums computed
    by DIFFERENT sessions (writer vs replica verifier) — a UTC writer
    and a local-time verifier must agree on a correct copy.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from .snapshot_diff import _row_hash

    cols = sorted(df.columns) if cols is None else list(cols)
    fields = {f.name: f.dataType for f in df.schema.fields}
    renderers = {
        c: F.unix_micros(F.col(c)).cast("string")
        for c in cols
        if isinstance(fields.get(c), T.TimestampType)
    }
    h = _row_hash(cols, side=None, renderers=renderers)
    return df.select(h.alias("_h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(_h)").alias("checksum"),
    )
