"""Sequence packing for LLM pretraining batches: assign every document
a (seq_id, offset_in_seq) position in a stream of fixed-capacity
training sequences, by deterministic contiguous order.

Semantics — **contiguous start-offset packing**: documents are laid end
to end in ascending id order; a document belongs to the sequence its
FIRST token lands in (``seq_id = floor(cum_tokens_before / seq_len)``).
A document that straddles a boundary overflows its sequence (the
trainer's concat-then-chunk view re-splits token-exactly); what the
operator guarantees is a total, deterministic, gap-free layout that any
number of writers can compute independently.

Scale shape — the distributed prefix-sum, NOT a global window:
a naive ``SUM(n) OVER (ORDER BY id)`` collapses the whole corpus into
ONE partition (Spark executes an un-partitioned window single-threaded
on a single task — the classic 100 TB killer). Instead:

1. map-side: per-doc token count, bucket key ``floor(id / bucket_span)``
   (id order is preserved across buckets because ids are numeric);
2. per-bucket totals: one hash-aggregated groupBy — #buckets rows;
3. exclusive prefix over the bucket totals: a window over #buckets rows
   (corpus_size / bucket_span — millions of buckets at 100 TB, a
   single-task window over a table that fits in memory by construction;
   recurse the same trick if it ever didn't);
4. per-doc exclusive cumsum WITHIN each bucket: a window partitioned by
   bucket — parallel across buckets — plus the broadcast bucket offset.

Total cost: one scan, one vocabulary-of-buckets shuffle, one bounded
window, one broadcast join. Every step is data-parallel.

Beyond-reference LLM-pipeline suite (build brief / SURVEY.md §6); the
reference engine has no training-data exporter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences", "shuffle_shards"]


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    seq_len: int = 512,
    bucket_span: int = 64,
) -> DataFrame:
    """Return ``(id, n_tokens, seq_id, offset_in_seq)`` — one row per
    input row, positions assigned by contiguous start-offset packing of
    ``len_col`` tokens into ``seq_len``-capacity sequences in ascending
    ``id_col`` order (ids must be numeric and unique; gaps are fine).

    ``bucket_span`` trades bucket-table size against per-bucket window
    width; any value yields identical output (test-pinned).
    """
    if seq_len <= 0 or bucket_span <= 0:
        raise ValueError("seq_len and bucket_span must be positive")

    # integral `div`, not floor(double /): token offsets at 100 TB pass
    # 2^53 and double division would round the sequence id.
    items = df.select(
        F.col(id_col).alias("id"),
        F.col(len_col).cast("long").alias("n_tokens"),
        F.expr(f"CAST({id_col} AS BIGINT) div {bucket_span}").alias("bkt"),
    )

    # per-bucket totals → exclusive prefix over ascending bucket id.
    # The un-partitioned window here runs over #buckets rows, not docs.
    bucket_tot = items.groupBy("bkt").agg(F.sum("n_tokens").alias("bn"))
    w_bkt = (
        Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    )
    bucket_off = bucket_tot.select(
        "bkt", F.coalesce(F.sum("bn").over(w_bkt), F.lit(0)).alias("bucket_before")
    )

    # within-bucket exclusive cumsum — partitioned window, parallel.
    w_in = (
        Window.partitionBy("bkt")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # no broadcast hint: the offset table is one row per bucket — small
    # enough that AQE broadcasts it at any sane bucket_span, but a
    # 100 TB run tuning span DOWN for window parallelism must be free to
    # fall back to a hash join on bkt (near-uniform key) without a
    # driver-side OOM from a forced broadcast.
    placed = (
        items.join(bucket_off, "bkt")
        .withColumn(
            "cum_before",
            F.col("bucket_before")
            + F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)),
        )
    )
    return placed.select(
        F.col("id").alias(id_col),
        "n_tokens",
        F.expr(f"cum_before div {seq_len}").alias("seq_id"),
        (F.col("cum_before") % F.lit(seq_len)).alias("offset_in_seq"),
    )


def shuffle_shards(
    df: DataFrame, id_col: str, n_shards: int = 16, seed: int = 0
) -> DataFrame:
    """Deterministic global shuffle for training-data export: every row
    gets a ``(shard, pos)`` address — shard by id-hash, position by
    hash order within the shard — so writers emit shards independently
    and a reader consuming shard 0..n in pos order sees one fixed
    pseudo-random permutation of the corpus, reproducible across runs,
    partitionings, and engines (md5 arithmetic, DuckDB-oracle-exact).

    The alternative — ``orderBy(rand(seed))`` — is partitioning-
    dependent AND needs a global sort; this is one hash per row, one
    shuffle on shard, and a per-shard window (parallel across shards —
    at 100 TB pick n_shards ≥ cluster parallelism so no window task
    owns more than ~corpus/n_shards rows).

    Hash ties (two ids sharing an md5 prefix) break by id, keeping the
    permutation total and stable.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    key = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("shard").orderBy("sort_key", id_col)
    return (
        df.select(F.col(id_col), key.alias("sort_key"))
        .withColumn("shard", F.pmod(F.col("sort_key"), F.lit(n_shards)))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos")
    )
