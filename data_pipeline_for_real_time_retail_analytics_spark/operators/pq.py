"""Product quantization (PQ) — compressed-vector codes and asymmetric-
distance (ADC) top-k search over an embedding column.

The missing tier of the similarity family: sign-LSH buckets
(similarity.py) prune CANDIDATES, IVF cells prune CELLS, and PQ
compresses the VECTORS themselves — each embedding becomes m small
codes (one per dimension block), so a 64-dim float vector stores in
m·log2(k) bits (32 bits at the 8×16 default, a 64× compression) and
query scoring reads a per-query lookup table instead of the raw
corpus. This is the Jégou et al. (TPAMI 2011) scheme as used by every
FAISS-style IVF-PQ deployment; at 100 TB the codes table is what fits
in warm storage while raw embeddings stay cold.

Spark-first shapes:

* Codebook: the ``k`` lowest-id vectors sliced into ``m`` dimension
  blocks — deterministic id-ordered seeds, the same reproducibility
  trade as ``similarity.ivf_centroids`` (a deployment k-means-trains
  each sub-codebook on a sample; the plan shape is identical).
* Encoding: corpus × broadcast codebook (m·k rows) → per-(vector,
  block) argmin over sub-centroids → one shuffled row per (vector,
  block), partial-aggregated. Map-side work is m·k·sub_dim multiplies
  per vector; no driver data, no iteration.
* ADC top-k: the query's lookup table (m·k distances) broadcasts; the
  codes table joins it on (block, code) — a lookup, not arithmetic —
  and per-vector sums take one partial-aggregated shuffle. Global
  top-k is ``orderBy().limit(k)``: Spark's TakeOrdered, per-partition
  heaps + driver merge of k·P rows, never a full sort.

Cross-engine exactness: every squared-difference term is quantized to
an integer number of 1e-12 units BEFORE summation (the micro-unit
discipline of operators/bm25.py:103), so distances are BIGINTs —
fold-order-independent by construction, and argmin/rank tie-breaks
(struct-min on (distance, code); row_number on (distance, id)) are
exact. Per-term doubles are bit-identical across engines: FLOAT→DOUBLE
widening, one subtract, one multiply, one floor — all IEEE-pinned.

Reference parity: the reference has no vector surface at all (its
analytics layer is dbt-declared SQL scaffolding,
config/pipelines/sample_pipeline.yaml:55-99); PQ is part of the
mandated beyond-reference similarity-search suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "pq_codebooks",
    "pq_codebooks_trained",
    "pq_assignments",
    "pq_codes",
    "pq_adc_topk",
]

#: squared-diff terms are floor(term·1e12 + 0.5) BIGINTs — ~12 decimal
#: digits of the unit-scale synthetic embeddings survive quantization
QUANT = 1e12


def _qdist(x: Column, c: Column) -> Column:
    """Exact-integer squared L2 distance between two equal-length float
    array slices: each per-dimension term quantized to 1e-12 units, then
    an integer left-fold sum (fold-order-free)."""

    def term(a: Column, b: Column) -> Column:
        d = a.cast("double") - b.cast("double")
        return F.floor(d * d * F.lit(QUANT) + F.lit(0.5)).cast("long")

    return F.aggregate(
        F.zip_with(x, c, term),
        F.lit(0).cast("long"),
        lambda acc, t: acc + t,
    )


def pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic PQ codebook: the ``k`` lowest-id vectors, each cut
    into ``m`` equal dimension blocks. Returns ``(sub, code, scv)`` —
    block index, dense code 0..k-1 (rank of the seed id), sub-vector.

    The embedding dimension must divide by ``m``; a seed row violating
    that raises at action time rather than mis-slicing silently.
    """
    seeds = (
        corpus.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
    )
    # k rows: the single-partition window is a broadcast dim, not a scan
    seeds = seeds.withColumn(
        "code", F.row_number().over(Window.orderBy("cid")) - 1
    )
    guarded = seeds.withColumn(
        "cv",
        F.when(
            F.size("cv") % m != 0,
            F.raise_error(
                F.concat(
                    F.lit(f"pq_codebooks: dim "),
                    F.size("cv").cast("string"),
                    F.lit(f" not divisible by m={m}"),
                )
            ),
        ).otherwise(F.col("cv")),
    )
    sub_dim = F.size("cv") / m
    return guarded.select(
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        "code",
        "cv",
    ).select(
        "sub",
        "code",
        F.slice(
            "cv",
            (F.col("sub") * sub_dim + 1).cast("int"),
            sub_dim.cast("int"),
        ).alias("scv"),
    )


def _subvectors(
    corpus: DataFrame, m: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, sub, sv): every vector cut into its m dimension blocks."""
    sub_dim = F.size(vec_col) / m
    return corpus.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        F.col(vec_col),
    ).select(
        id_col,
        "sub",
        F.slice(
            vec_col,
            (F.col("sub") * sub_dim + 1).cast("int"),
            sub_dim.cast("int"),
        ).alias("sv"),
    )


def pq_codebooks_trained(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iters: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd-refined PQ codebook — the production path, mirroring the
    ``similarity.ivf_centroids_trained`` precedent: the deterministic
    seed codebook (``pq_codebooks``) is k-means-refined per block, ALL
    blocks in one job per iteration (assign every (vector, block) to its
    nearest sub-centroid, then recompute each (block, code) centroid as
    the element-wise mean of its members). Codes that lose every member
    disappear (standard dead-centroid behavior) — callers get ≤ k codes
    per block, and the 4-bit packing contract is unaffected since codes
    keep their original ids.

    Like the IVF twin, this path is for retrieval QUALITY (measured
    recall, tests/test_ann_recall.py); the registered driver queries
    stay on the deterministic codebook, whose assignment is
    DuckDB-oracle-checkable bit for bit. Train on a sample at scale —
    representative sub-centroids need a sample, not the corpus.
    """
    cb = pq_codebooks(corpus, m, k, id_col, vec_col).localCheckpoint()
    subvecs = _subvectors(corpus, m, id_col, vec_col)
    for _ in range(n_iters):
        assigned = pq_assignments(corpus, cb, id_col, vec_col)
        dim_means = (
            subvecs.join(assigned, [id_col, "sub"])
            .select("sub", "code", F.posexplode("sv").alias("pos", "val"))
            .groupBy("sub", "code", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("mval"))
        )
        cb = (
            dim_means.groupBy("sub", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mval"))),
                    lambda s: s["mval"].cast("float"),
                ).alias("scv")
            )
            .localCheckpoint()
        )
    return cb


def pq_assignments(
    corpus: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-(vector, block) nearest sub-centroid: ``(id, sub, code)``.

    One cross join against the broadcast m·k-row codebook, then a
    struct-min argmin (ties to the LOWER code — mirrored in oracles).
    """
    sub_dim = F.size("scv")
    dists = corpus.join(F.broadcast(codebooks), how="cross").select(
        F.col(id_col),
        "sub",
        "code",
        _qdist(
            F.slice(
                F.col(vec_col),
                (F.col("sub") * sub_dim + 1).cast("int"),
                sub_dim.cast("int"),
            ),
            F.col("scv"),
        ).alias("qd"),
    )
    best = dists.groupBy(id_col, "sub").agg(
        F.min(F.struct("qd", "code")).alias("b")
    )
    return best.select(id_col, "sub", F.col("b.code").alias("code"))


def pq_codes(
    corpus: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Packed PQ words: ``(id, pq_word)`` with block ``sub``'s code in
    bit range [4·sub, 4·sub+4) — k ≤ 16 codes fit 4 bits, so the default
    8×16 parameterization packs a whole vector into one INT-sized word.
    The block count comes from the codebook itself; a codebook built
    with k > 16 would make distinct code sequences COLLIDE in the
    packed word, so an out-of-range code raises at action time instead
    of silently corrupting the compressed representation.
    """
    assigned = pq_assignments(corpus, codebooks, id_col, vec_col)
    code = F.when(
        F.col("code") > 15,
        F.raise_error(
            F.concat(
                F.lit("pq_codes: code "),
                F.col("code").cast("string"),
                F.lit(" does not fit 4-bit packing (codebook k > 16); "
                      "use pq_assignments for wide codebooks"),
            )
        ).cast("int"),
    ).otherwise(F.col("code"))
    weight = F.pow(F.lit(2.0), F.col("sub") * 4).cast("long")
    return assigned.groupBy(id_col).agg(
        F.sum(code.cast("long") * weight).alias("pq_word")
    )


def pq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-``k`` per query over PQ-encoded vectors:
    ``(query_id, match_id, adc_dist_q12, rank)`` — the quantized ADC
    distance in 1e-12 units (exact BIGINT) and the dense rank by
    (distance, match_id). Self-matches are excluded; ties break to the
    lower match id, mirroring the cosine_topk contract.

    The per-query lookup table (m·k rows per query) broadcasts; scoring
    the corpus is an equi-join on (sub, code) plus one partial-aggregated
    sum — the corpus side reads CODES only, never raw embeddings: the
    100 TB property that makes PQ worth its recall trade.
    """
    sub_dim = F.size("scv")
    assigned = pq_assignments(corpus, codebooks, id_col, vec_col)
    lut = queries.join(F.broadcast(codebooks), how="cross").select(
        F.col(id_col).alias("query_id"),
        "sub",
        "code",
        _qdist(
            F.slice(
                F.col(vec_col),
                (F.col("sub") * sub_dim + 1).cast("int"),
                sub_dim.cast("int"),
            ),
            F.col("scv"),
        ).alias("qd"),
    )
    scored = (
        assigned.join(F.broadcast(lut), ["sub", "code"])
        .where(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.sum("qd").alias("adc_dist_q12"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist_q12", id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            F.col(id_col).alias("match_id"),
            "adc_dist_q12",
            "rank",
        )
    )
