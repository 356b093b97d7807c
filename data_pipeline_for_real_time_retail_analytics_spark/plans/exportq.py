"""Training-export integrity queries (registry-ready for round 7).

A 100 TB export writes shards from thousands of independent tasks;
the consumer needs a MANIFEST to prove nothing was dropped, doubled,
or reordered before training starts. This module derives one from the
deterministic shard shuffle (operators/packing.py:shuffle_shards):
per shard, the document count, the dense-position high-water mark
(``max_pos == n_docs`` ⇔ positions are gapless), and an
order-independent content checksum — BIT_XOR over a per-document
md5-derived 64-bit hash, so two manifests match iff the shard holds
exactly the same document set, regardless of write order or engine.

Same md5-arithmetic convention as the shuffled_shards oracle, so the
whole manifest is DuckDB-exact. NOT registered in ``__spark_entry__``
this round (r6 front window exactly full); tests/test_exportq.py runs
the driver-identical parity. Flip in r7 per the NOTES.md handoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.packing import shuffle_shards
from .corpusbase import _docs

#: must match plans/training.py's shuffled_shards parameterization so
#: the manifest describes the SAME export the registry query produces
N_SHARDS = 16


def _doc_checksum(id_col: str) -> F.Column:
    """64-bit per-document hash for the XOR checksum: 15 md5 hex digits
    (< 2^60, fits BIGINT exactly in both engines), domain-separated
    from the shard sort key by the ':ck' suffix."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit("ck"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(shard, n_docs, max_pos, checksum) for the corpus export
    shuffle — the integrity record a reader verifies before training."""
    shards = shuffle_shards(
        _docs(spark, sf_dir).select("doc_id"), "doc_id", n_shards=N_SHARDS
    )
    return (
        shards.withColumn("ck", _doc_checksum("doc_id"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("pos").alias("max_pos"),
            F.expr("bit_xor(ck)").alias("checksum"),
        )
        .orderBy("shard")
    )


ORACLES: dict[str, str] = {
    "shard_manifest": rf"""
        WITH keyed AS (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(
                       CAST(doc_id AS VARCHAR) || ':0'), 1, 8)) AS BIGINT)
                       AS sort_key,
                   CAST(concat('0x', substr(md5(
                       CAST(doc_id AS VARCHAR) || ':ck'), 1, 15)) AS BIGINT)
                       AS ck
            FROM documents
        ),
        sh AS (
            SELECT doc_id, ck, sort_key, sort_key % {N_SHARDS} AS shard
            FROM keyed
        ),
        pos AS (
            SELECT shard, ck,
                   CAST(row_number() OVER (
                       PARTITION BY shard ORDER BY sort_key, doc_id
                   ) AS BIGINT) AS pos
            FROM sh
        )
        SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
               MAX(pos) AS max_pos, BIT_XOR(ck) AS checksum
        FROM pos GROUP BY shard ORDER BY shard
    """,
}

QUERIES = {
    "shard_manifest": q_shard_manifest,
}
