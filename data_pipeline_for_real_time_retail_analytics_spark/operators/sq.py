"""Scalar (int8) quantization — the second compression tier of the
similarity family, alongside product quantization (pq.py).

SQ8 stores each embedding dimension as one signed byte against a
per-dimension symmetric scale: 4× smaller than float32 with near-exact
retrieval (every FAISS-style deployment's default before PQ's 16-64×
lossy tier). Scoring dequantizes per term at query time — no codebook,
no training, and unlike PQ the approximation error is per-dimension
rounding, not cluster assignment.

Spark-first shapes:

* Scales: one aggregate scan — per-dimension max |x| via posexplode +
  partial-aggregated max (shuffle bounded by the dimension count).
  The scales frame is dim-sized and broadcasts everywhere.
* Encoding: pure map-side arithmetic per vector (zip the vector with
  the broadcast scale array); one shuffled row per (vector, dim) only
  if the caller asks for the exploded layout.
* Top-k: codes join codes — every per-dimension product term
  ``ca·cb·(scale_d²/127²)`` is a double both engines compute
  bit-identically (integer product × identical double weight),
  quantized to 1e-6-unit BIGINTs BEFORE the sum (the micro-unit
  discipline), so scores, ranks, and ties are exact integers.

Rounding is ``floor(x/scale·127 + 0.5)`` — the plain-IEEE anchor
(NOTES round-7: engines' ROUND(double) disagree exactly at .5
boundaries; floor+0.5 cannot).

Reference parity: the reference has no vector surface (its
transformation layer is dbt-declared scaffolding,
config/pipelines/sample_pipeline.yaml:55-99); this extends the mandated
similarity-search suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sq8_scales", "sq8_codes", "sq8_topk"]

#: quantized-score unit: 1e-6 of the dequantized dot product
SCORE_QUANT = 1_000_000.0


def sq8_scales(
    corpus: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """(pos, scale): per-dimension symmetric scale = max |x| over the
    corpus (1-based pos). A zero scale (all-zero dimension) encodes as
    code 0 via the guarded division in ``_code``."""
    return (
        corpus.select(F.posexplode(vec_col).alias("pos0", "x"))
        .groupBy((F.col("pos0") + 1).cast("long").alias("pos"))
        .agg(F.max(F.abs(F.col("x").cast("double"))).alias("scale"))
    )


def _code(x: Column, scale: Column) -> Column:
    """floor(x/scale·127 + 0.5) clamped to [-127, 127]; 0 where the
    dimension is constant zero."""
    raw = F.floor(
        x.cast("double") / scale * F.lit(127.0) + F.lit(0.5)
    ).cast("int")
    clamped = F.greatest(F.least(raw, F.lit(127)), F.lit(-127))
    return F.when(scale == 0.0, F.lit(0)).otherwise(clamped)


def sq8_codes(
    corpus: DataFrame,
    scales: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exploded int8 layout: (id, pos, code) — one signed-byte-range
    INT per dimension. The scales frame broadcasts; encoding itself is
    map-side."""
    ex = corpus.select(
        F.col(id_col), F.posexplode(vec_col).alias("pos0", "x")
    ).select(id_col, (F.col("pos0") + 1).cast("long").alias("pos"), "x")
    return ex.join(F.broadcast(scales), "pos").select(
        id_col, "pos", _code(F.col("x"), F.col("scale")).alias("code")
    )


def sq8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    scales: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate dot-product top-``k`` per query over SQ8 codes:
    (query_id, match_id, dot_q6, rank) with the dequantized dot in
    exact 1e-6-unit BIGINTs. Ties break to the lower match id.

    The per-dimension weight ``scale_d²/127²`` rides the broadcast
    scales frame; scoring joins the two code layouts on ``pos`` —
    at corpus scale the probe side reads CODES only (the 4× I/O win),
    and the (query, vector) partial sums map-side-combine before the
    one shuffle."""
    w_d = (F.col("scale") * F.col("scale") / F.lit(127.0 * 127.0)).alias(
        "w"
    )
    qc = (
        sq8_codes(queries, scales, id_col, vec_col)
        .join(F.broadcast(scales.select("pos", w_d)), "pos")
        .select(
            F.col(id_col).alias("query_id"),
            "pos",
            F.col("code").alias("qcode"),
            "w",
        )
    )
    cc = sq8_codes(corpus, scales, id_col, vec_col)
    term = (
        F.col("qcode").cast("long") * F.col("code").cast("long")
    ).cast("double") * F.col("w")
    scored = (
        cc.join(F.broadcast(qc), "pos")
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.floor(term * F.lit(SCORE_QUANT) + F.lit(0.5))
            .cast("long")
            .alias("t"),
        )
        .groupBy("query_id", id_col)
        .agg(F.sum("t").alias("dot_q6"))
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.desc("dot_q6"), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(rw).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("match_id"), "dot_q6", "rank")
    )
