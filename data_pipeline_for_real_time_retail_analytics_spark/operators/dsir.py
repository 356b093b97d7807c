"""DSIR-style importance weighting — select pretraining documents that
look like a TARGET domain (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling").

The technique: featurize every document into hashed token buckets,
estimate bucket distributions for the raw corpus (p) and the target
domain (q), score each document with its bag-of-buckets log-likelihood
ratio  Σ_b n_d[b]·ln(q̂[b]/p̂[b])  — documents whose feature mix looks
more like the target than like the corpus score high — and keep the
top slice (the paper resamples with Gumbel noise; the deterministic
top-K rank is the oracle-checkable variant, and the noise is one extra
column when a deployment wants it).

Spark-first shapes (100 TB):

* Featurization is one explode + md5-hash per token — map-side; the
  per-(doc, bucket) counts partial-aggregate before their one shuffle.
* Both distributions derive FROM the (doc, bucket) count table (no
  second corpus scan); with ``n_buckets`` buckets the weight table is
  tiny and broadcasts.
* Scoring is an equi-join on the bucket id + a partial-aggregated
  per-doc sum. Every ln-ratio term is quantized to 1e-6-unit BIGINTs
  BEFORE the sum (the micro-unit discipline): identical doubles cross
  engines, integer addition after — scores, ranks, ties exact.
* Top-K is a rank window over doc-grain scores (one row per doc);
  at production scale the cut VALUE comes from a sample quantile and
  becomes a broadcast filter, like the CCNet substitution
  (plans/ccnetq.py).

Smoothing is add-1 on bucket counts against the full bucket space:
``ŵ[b] = ln((q_b + 1)/(Q + B)) − ln((p_b + 1)/(P + B))`` — buckets the
target never saw get a finite negative weight instead of −inf.

Reference parity: the reference has no curation surface (its
transformation layer is dbt-declared scaffolding,
config/pipelines/sample_pipeline.yaml:55-99); this extends the mandated
LLM-data suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .textstats import ws_tokens

__all__ = ["hashed_bucket", "doc_bucket_counts", "dsir_weights", "dsir_top_k"]

#: ln-ratio terms are quantized to 1e-6 units before summation
SCORE_QUANT = 1_000_000.0


def hashed_bucket(tok: Column, n_buckets: int) -> Column:
    """Feature-hash a token to [0, n_buckets): the first 8 md5 hex chars
    as a long, mod n_buckets (the shuffled-shards hash, so the DuckDB
    mirror is the established one)."""
    return (
        F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")
        % n_buckets
    )


def doc_bucket_counts(
    df: DataFrame,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(id, *extra, bucket, n): hashed-unigram counts per document."""
    extra = extra_cols or []
    toks = df.select(
        F.col(id_col),
        *extra,
        F.explode(ws_tokens(F.col(text_col))).alias("__t"),
    )
    return (
        toks.select(
            id_col, *extra, hashed_bucket(F.col("__t"), n_buckets).alias("bucket")
        )
        .groupBy(id_col, *extra, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def dsir_weights(
    counts: DataFrame,
    target_counts: DataFrame,
    n_buckets: int = 256,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, weight_q6): per-document importance weight in exact 1e-6
    units. ``counts`` is the full corpus' (id, bucket, n) table;
    ``target_counts`` the target domain's (any id grain — only its
    bucket marginals are used)."""
    p = counts.groupBy("bucket").agg(F.sum("n").alias("p_n"))
    q = target_counts.groupBy("bucket").agg(F.sum("n").alias("q_n"))
    p_tot = p.agg(F.sum("p_n").alias("p_tot"))
    # an empty target would make q_tot NULL and every weight silently
    # NULL downstream — a caller bug (no domain to match); fail loudly
    # at action time instead (the zorder span-guard precedent)
    q_tot = q.agg(
        F.coalesce(
            F.sum("q_n"),
            F.raise_error(
                F.lit("dsir_weights: target_counts is empty — no target "
                      "domain to estimate q from")
            ).cast("long"),
        ).alias("q_tot")
    )
    # bucket-space weight table: n_buckets rows after the outer join
    # (buckets absent from BOTH sides never appear in any doc either)
    wb = (
        p.join(q, "bucket", "full_outer")
        .join(F.broadcast(p_tot), how="cross")
        .join(F.broadcast(q_tot), how="cross")
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("q_n"), F.lit(0)).cast("double") + 1.0)
                    / (F.col("q_tot").cast("double") + float(n_buckets))
                )
                - F.log(
                    (F.coalesce(F.col("p_n"), F.lit(0)).cast("double") + 1.0)
                    / (F.col("p_tot").cast("double") + float(n_buckets))
                )
            ).alias("w"),
        )
    )
    term = F.col("n").cast("double") * F.col("w")
    return (
        counts.join(F.broadcast(wb), "bucket")
        .select(
            id_col,
            F.floor(term * F.lit(SCORE_QUANT) + F.lit(0.5))
            .cast("long")
            .alias("t"),
        )
        .groupBy(id_col)
        .agg(F.sum("t").alias("weight_q6"))
    )


def dsir_top_k(
    weights: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """The k highest-weight documents: (id, weight_q6, rank); ties to
    the lower id. One rank window over doc-grain rows."""
    w = Window.orderBy(F.desc("weight_q6"), F.col(id_col))
    return (
        weights.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )
