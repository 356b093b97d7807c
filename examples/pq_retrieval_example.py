#!/usr/bin/env python
"""IVF-PQ retrieval walk: route queries to their nearest inverted-file
cells, shortlist candidates by asymmetric distance over PQ CODES, then
exactly re-rank only the shortlist.

The production ANN composition (FAISS's IVF-PQ + re-ranking) out of
this engine's parts:

1. coarse index — deterministic IVF centroids
   (operators/similarity.py:ivf_centroids) and a max-cosine cell per
   corpus vector (operators/embcluster.py);
2. compression — Lloyd-trained PQ sub-codebooks
   (operators/pq.py:pq_codebooks_trained): the corpus's scoring
   representation is per-block codes, 16-32× smaller than raw floats;
3. query — each query probes its ``n_probe`` closest cells, scores the
   candidates there from codes + a broadcast lookup table (NO raw
   embeddings touched), keeps an ADC shortlist of ``shortlist`` ids,
   and re-ranks only those by exact distance — raw-embedding reads
   per query drop from |corpus| to |shortlist|.

Printed at the end: recall@5 against brute-force exact squared-L2 for
the ADC shortlist head alone and for the re-ranked output — the
accuracy/cost trade made visible. (The synthetic corpus is isotropic
noise — the hardest case for ANN; real embedding corpora cluster and
quantize far better.)

Run:  python examples/pq_retrieval_example.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from data_pipeline_for_real_time_retail_analytics_spark.operators.embcluster import (
    assign_embedding_clusters,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.pq import (
    pq_assignments,
    pq_codebooks_trained,
    _qdist,
)
from data_pipeline_for_real_time_retail_analytics_spark.operators.similarity import (
    cosine,
    ivf_centroids,
)
from data_pipeline_for_real_time_retail_analytics_spark.sources import load_table

N_CELLS = 16
N_PROBE = 4
PQ_M = 16  # 4-dim blocks: finer quantization for the isotropic corpus
PQ_K = 16
TOP_K = 5
SHORTLIST = 20
QUERY_EVERY = 100


def get_spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[8]")
        .appName("pq_retrieval_example")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    embs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = embs.where(F.col("vec_id") % QUERY_EVERY == 0)
    qv = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    ).localCheckpoint()

    # 1. coarse index: cell per corpus vector
    cents = ivf_centroids(embs, n_cells=N_CELLS).localCheckpoint()
    cells = assign_embedding_clusters(embs, cents).select(
        "vec_id", F.col("cluster").alias("cell")
    )

    # 2. compression: trained sub-codebooks, codes per (vector, block)
    cb = pq_codebooks_trained(
        embs, m=PQ_M, k=PQ_K, n_iters=4
    ).localCheckpoint()
    codes = pq_assignments(embs, cb).join(cells, "vec_id")

    # 3a. query routing: top-n_probe cells per query
    w = Window.partitionBy("query_id").orderBy(F.desc("csim"), F.desc("cell"))
    probed = (
        qv.join(F.broadcast(cents), how="cross")
        .select(
            "query_id", F.col("cid").alias("cell"),
            cosine(F.col("qv"), F.col("cv")).alias("csim"),
        )
        .withColumn("crank", F.row_number().over(w))
        .where(F.col("crank") <= N_PROBE)
        .select("query_id", "cell")
    )

    # 3b. per-query ADC lookup table (m·k rows per query — broadcast)
    sub_dim = F.size("scv")
    lut = qv.join(F.broadcast(cb), how="cross").select(
        "query_id", "sub", "code",
        _qdist(
            F.slice(
                "qv",
                (F.col("sub") * sub_dim + 1).cast("int"),
                sub_dim.cast("int"),
            ),
            F.col("scv"),
        ).alias("qd"),
    )

    # 3c. candidates = vectors in probed cells; ADC shortlist from codes
    scored = (
        codes.join(F.broadcast(probed), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(lut), ["query_id", "sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qd").alias("adc"))
    )
    rw = Window.partitionBy("query_id").orderBy("adc", "vec_id")
    shortlist = (
        scored.withColumn("rank", F.row_number().over(rw))
        .where(F.col("rank") <= SHORTLIST)
        .select("query_id", "vec_id", "rank")
        .localCheckpoint()
    )

    # 3d. exact re-rank of the shortlist only (|shortlist| raw reads/query)
    rerank = (
        shortlist.join(embs, "vec_id")
        .join(qv, "query_id")
        .select(
            "query_id", "vec_id",
            _qdist(F.col("qv"), F.col("embedding")).alias("d"),
        )
        .withColumn(
            "rrank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("d", "vec_id")
            ),
        )
        .where(F.col("rrank") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("match_id"))
    )

    # brute-force exact top-k for recall accounting
    exact = (
        qv.join(embs, how="cross")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", "vec_id",
            _qdist(F.col("qv"), F.col("embedding")).alias("d"),
        )
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("d", "vec_id")
            ),
        )
        .where(F.col("r") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("match_id"))
        .localCheckpoint()
    )

    # routing ceiling: exact scoring over the probed cells — what the
    # coarse router allows at this n_probe regardless of quantization
    # (cheap here; at scale this diagnostic runs on a query sample)
    ceiling = (
        codes.select("vec_id", "cell").distinct()
        .join(F.broadcast(probed), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .join(embs, "vec_id")
        .join(qv, "query_id")
        .select(
            "query_id", "vec_id",
            _qdist(F.col("qv"), F.col("embedding")).alias("d"),
        )
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("d", "vec_id")
            ),
        )
        .where(F.col("r") <= TOP_K)
        .select("query_id", F.col("vec_id").alias("match_id"))
    )

    n_q = qv.count()
    adc_head = shortlist.where(F.col("rank") <= TOP_K).select(
        "query_id", F.col("vec_id").alias("match_id")
    )
    adc_hits = adc_head.join(exact, ["query_id", "match_id"]).count()
    rr_hits = rerank.join(exact, ["query_id", "match_id"]).count()
    ceil_hits = ceiling.join(exact, ["query_id", "match_id"]).count()
    print(f"queries: {n_q}")
    print(
        "ivf-pq candidates scored from codes only; "
        f"probes/query: {N_PROBE}, shortlist: {SHORTLIST}"
    )
    print(f"recall@{TOP_K} (adc head, no re-rank): {adc_hits / (n_q * TOP_K):.2f}")
    print(f"recall@{TOP_K}: {rr_hits / (n_q * TOP_K):.2f}")
    print(
        f"routing ceiling (exact scoring in probed cells): "
        f"{ceil_hits / (n_q * TOP_K):.2f}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
